"""robots.txt parsing: raw body text → (disallow_prefixes, crawl_delay_s).

The reference enforces politeness against an API quota clock
(/root/reference/crawlers/github.go:87-111) — the web-crawl graft's analog
is robots.txt (north_rule: "politeness, robots"). This module turns raw
robots bodies into the structured rules host_state/scheduling consume
(operators/politeness.py), as a vectorized pandas UDF (input_hint: no
per-row Python in the hot path — parsing is one Arrow batch at a time,
pure Python only inside the batch).

Parsing rules (the de-facto subset every major crawler agrees on):
- records are User-agent lines followed by directives; successive
  User-agent lines share one record
- the record matching the crawler's agent token wins; otherwise the '*'
  record; longest-agent-match breaks ties
- ``Disallow:`` with an empty value allows everything; only path prefixes
  are honored (no wildcards — a prefix superset is crawl-safe: it can only
  deny more, never fetch something forbidden)
- ``Crawl-delay`` is parsed as float seconds when present
- keys are case-insensitive; ``#`` starts a comment
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

ROBOTS_RULES_SCHEMA = StructType(
    [
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("crawl_delay_s", DoubleType(), True),
    ]
)


def parse_robots_one(body: str | None, agent: str = "*") -> tuple[list[str], float | None]:
    """Pure function: one robots.txt body → (disallow_prefixes, crawl_delay).
    Deterministic; unknown directives ignored; malformed lines skipped."""
    if not body:
        return [], None
    agent_l = agent.lower()
    records: list[tuple[list[str], list[str], float | None]] = []  # (agents, disallows, delay)
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_delay: float | None = None
    in_directives = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_delay, in_directives
        if cur_agents:
            records.append((cur_agents, cur_dis, cur_delay))
        cur_agents, cur_dis, cur_delay, in_directives = [], [], None, False

    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_directives:
                flush()
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_directives = True
            if val:
                cur_dis.append(val)
        elif key == "crawl-delay":
            in_directives = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        else:
            in_directives = True  # unknown directive still ends the UA block
    flush()

    best: tuple[int, list[str], float | None] | None = None  # (match_len, dis, delay)
    for agents, dis, delay in records:
        for a in agents:
            if a == "*":
                match_len = 0
            elif a and a in agent_l:
                match_len = len(a)
            else:
                continue
            if best is None or match_len > best[0]:
                best = (match_len, dis, delay)
    if best is None:
        return [], None
    return list(best[1]), best[2]


def parse_robots_udf(agent: str = "*"):
    """Vectorized: Series[str robots body] -> struct(disallow_prefixes,
    crawl_delay_s)."""

    @F.pandas_udf(ROBOTS_RULES_SCHEMA)
    def parse(bodies: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in bodies:
            rows = [parse_robots_one(b, agent) for b in batch]
            yield pd.DataFrame(
                {
                    "disallow_prefixes": [r[0] for r in rows],
                    "crawl_delay_s": [r[1] for r in rows],
                }
            )

    return parse


def robots_table(robots_bodies, agent: str = "*"):
    """DataFrame(host, body) → DataFrame(host, disallow_prefixes,
    crawl_delay_s) — the shape CrawlEngine/politeness consume."""
    parsed = robots_bodies.withColumn("_rules", parse_robots_udf(agent)(F.col("body")))
    return parsed.select(
        "host",
        F.col("_rules.disallow_prefixes").alias("disallow_prefixes"),
        F.col("_rules.crawl_delay_s").alias("crawl_delay_s"),
    )
