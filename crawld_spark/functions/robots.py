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
  deny more, never fetch something forbidden). The RFC 9309 family at the
  bottom of this module adds the full Allow/Disallow + ``*``/``$``
  semantics for audits that need exact verdicts.
- ``Crawl-delay`` is parsed as float seconds when present
- keys are case-insensitive; ``#`` starts a comment
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
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


# ---------------- RFC 9309 rules: Allow/Disallow + wildcards ----------------
# The prefix-only form above is crawl-safe (it can only over-deny) and is
# what the round loop enforces by default; real-world robots.txt also uses
# ``Allow:``, ``*`` (any run of octets) and ``$`` (end anchor), with the
# most-specific-rule-wins precedence (longest pattern; Allow beats Disallow
# on ties) — RFC 9309 / the Googlebot semantics. This family parses that
# full form and evaluates it JVM-side with NO regex and NO per-row Python:
# each pattern is pre-split (host-grain, inside the same Arrow batch as the
# prefix parse) into its literal inter-wildcard segments, and the per-URL
# verdict is a greedy leftmost segment fold using only
# startswith/locate/length — the classic glob-feasibility algorithm, which
# is exact for '*' patterns. The '$' anchor is folded away at parse time by
# the sentinel trick: matching happens against path || '\x01' (a byte that
# cannot appear in a canonicalized path), and an anchored pattern's last
# segment carries the sentinel, so "ends with" becomes an ordinary segment
# probe and the matcher stays uniform.

ROBOTS_RFC_SCHEMA = StructType(
    [
        StructField(
            "rules",
            ArrayType(
                StructType(
                    [
                        StructField("segs", ArrayType(StringType()), True),
                        StructField("spec", IntegerType(), True),
                        StructField("allow", BooleanType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("crawl_delay_s", DoubleType(), True),
    ]
)

_SENTINEL = "\x01"


def _compile_rule(pattern: str, allow: bool) -> dict:
    """One robots path pattern → the matcher's parse form: literal
    segments between '*' runs (the '$' anchor becomes a sentinel on the
    last segment), plus the RFC precedence key (pattern octet length)."""
    spec = len(pattern)
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    segs = pattern.split("*")
    if anchored:
        segs[-1] = segs[-1] + _SENTINEL
    return {"segs": segs, "spec": spec, "allow": allow}


def parse_robots_rfc(
    body: str | None, agent: str = "*"
) -> tuple[list[dict], float | None]:
    """RFC 9309 parse: one robots.txt body → (rules, crawl_delay) for the
    best-matching agent group, where rules are compiled Allow/Disallow
    patterns (see _compile_rule). Group selection mirrors
    parse_robots_one (longest-agent-match, '*' fallback); empty-value
    Disallow/Allow lines are no-ops per the RFC."""
    if not body:
        return [], None
    agent_l = agent.lower()
    records: list[tuple[list[str], list[dict], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[dict] = []
    cur_delay: float | None = None
    in_directives = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_directives
        if cur_agents:
            records.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay, in_directives = [], [], None, False

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
        elif key in ("disallow", "allow"):
            in_directives = True
            if val:
                cur_rules.append(_compile_rule(val, allow=(key == "allow")))
        elif key == "crawl-delay":
            in_directives = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        else:
            in_directives = True
    flush()

    best: tuple[int, list[dict], float | None] | None = None
    for agents, rules, delay in records:
        for a in agents:
            if a == "*":
                match_len = 0
            elif a and a in agent_l:
                match_len = len(a)
            else:
                continue
            if best is None or match_len > best[0]:
                best = (match_len, rules, delay)
    if best is None:
        return [], None
    return list(best[1]), best[2]


def match_glob_py(path: str, segs: list[str]) -> bool:
    """Pure-Python twin of the JVM fold (tests pin equivalence): greedy
    leftmost matching of literal segments against path + sentinel."""
    hay = path + _SENTINEL
    if not hay.startswith(segs[0]):
        return False
    pos = len(segs[0])
    for s in segs[1:]:
        if not s:
            continue
        i = hay.find(s, pos)
        if i < 0:
            return False
        pos = i + len(s)
    return True


def rfc_verdict(path, rules):
    """JVM verdict over RFC rules: ``denied`` boolean column.

    Per RFC 9309 precedence: among matching rules, the longest pattern
    wins; Allow beats Disallow at equal length; no matching rule means
    allowed. Match = greedy segment fold via aggregate() over the
    pre-split literals — higher-order functions on the rules array, all
    JVM-side, zero Python, zero regex. ``rules`` NULL/empty → allowed.
    """
    p = F.col(path) if isinstance(path, str) else path
    r = F.col(rules) if isinstance(rules, str) else rules
    hay = F.concat(p, F.lit(_SENTINEL))

    def seg_match(rule):
        first = F.element_at(rule["segs"], 1)
        folded = F.aggregate(
            F.slice(rule["segs"], 2, F.greatest(F.size(rule["segs"]) - 1, F.lit(0))),
            F.struct(
                hay.startswith(first).alias("ok"),
                (F.length(first) + F.lit(1)).cast("int").alias("pos"),
            ),
            lambda acc, s: F.struct(
                F.when(
                    ~acc["ok"], F.lit(False)
                )
                .when(F.length(s) == 0, acc["ok"])
                .otherwise(
                    F.call_function("locate", s, hay, acc["pos"]) > 0
                )
                .alias("ok"),
                F.when(F.length(s) == 0, acc["pos"])
                .otherwise(
                    (
                        F.call_function("locate", s, hay, acc["pos"])
                        + F.length(s)
                    ).cast("int")
                )
                .alias("pos"),
            ),
        )
        return folded["ok"]

    matched = F.filter(r, seg_match)
    best = F.array_max(
        F.transform(
            matched,
            lambda rule: F.struct(
                rule["spec"].alias("spec"),
                rule["allow"].cast("int").alias("a"),
            ),
        )
    )
    # ADVICE r5: the '$' anchor rides as a sentinel byte appended to the
    # path; a hostile path CONTAINING that byte could forge an anchored
    # match (e.g. 'Allow: /public$' matching '/public\x01secret' under
    # 'Disallow: /'). Enforce the invariant fail-safe: any path carrying
    # the sentinel is denied outright — over-deny, never under-deny, the
    # module's safety property.
    return F.when(r.isNull(), F.lit(False)).otherwise(
        p.contains(F.lit(_SENTINEL)) | (best.isNotNull() & (best["a"] == 0))
    )


def parse_robots_rfc_udf(agent: str = "*"):
    """Vectorized: Series[str robots body] -> struct(rules,
    crawl_delay_s) in the RFC form."""

    @F.pandas_udf(ROBOTS_RFC_SCHEMA)
    def parse(bodies: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for batch in bodies:
            rows = [parse_robots_rfc(b, agent) for b in batch]
            yield pd.DataFrame(
                {
                    "rules": [
                        [(d["segs"], d["spec"], d["allow"]) for d in r[0]]
                        for r in rows
                    ],
                    "crawl_delay_s": [r[1] for r in rows],
                }
            )

    return parse


def robots_rfc_table(robots_bodies, agent: str = "*"):
    """DataFrame(host, body) → DataFrame(host, rules, crawl_delay_s) in
    the RFC form — parsed once per host (host-cardinality Arrow batch),
    broadcastable into any URL scan for rfc_verdict."""
    parsed = robots_bodies.withColumn(
        "_rules", parse_robots_rfc_udf(agent)(F.col("body"))
    )
    return parsed.select(
        "host",
        F.col("_rules.rules").alias("rules"),
        F.col("_rules.crawl_delay_s").alias("crawl_delay_s"),
    )
