"""Job configuration + validation.

Mirrors the semantics of the reference's config layer
(/root/reference/config/config.go:27-273): JSON/dict in, defaulting rules,
hard validation before any work starts. Notable carried-over defaults
(config/config.go:166-184): throttler wait 1800 s, window 60, leak 1000 ms;
fetch workers >= 1.

Durations are accepted as Go-style strings ("12h", "10m", "1h30m") to match
the reference (crawld.go:65,389; config/config.go:198-204).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, asdict
from typing import Any

_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ms|h|m|s)")
_DUR_MULT = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 0.001}


def parse_duration(s: str | int | float) -> float:
    """Parse a Go-style duration ("12h", "1h30m", "1000ms") to seconds.

    ≙ time.ParseDuration usage in the reference (crawld.go:65).
    """
    if isinstance(s, (int, float)):
        return float(s)
    if not isinstance(s, str) or not s:
        raise ValueError(f"invalid duration: {s!r}")
    pos = 0
    total = 0.0
    for m in _DUR_RE.finditer(s):
        if m.start() != pos:
            raise ValueError(f"invalid duration: {s!r}")
        total += float(m.group(1)) * _DUR_MULT[m.group(2)]
        pos = m.end()
    if pos != len(s):
        raise ValueError(f"invalid duration: {s!r}")
    return total


@dataclass
class CrawlConfig:
    """Engine configuration for one crawl job.

    Field ↔ reference mapping:
      - languages / keep_forks / limit / since_seq ≙ CrawlerConfig
        (config/config.go:85-126)
      - max_workers ≙ max_fetcher_workers (config/config.go:44-51)
      - throttler_* ≙ config/config.go:174-184 defaults (1800 s / 60 / 1000 ms)
      - crawl_interval / fetch_interval ≙ crawling/fetch_time_interval
        (crawld.go:44-62, 247-248)
    Engine-only fields (no crawld counterpart — scale machinery per
    SURVEY.md §4.2): n_seen_shards, bloom_bits, round_duration_s,
    per-host budget, salt buckets.
    """

    warehouse: str = "/tmp/crawld_spark_wh"
    # candidate filters (≙ CrawlerConfig, config/config.go:85-126)
    languages: list[str] = field(default_factory=list)  # empty = all
    # F4 stage-2: after the case-SENSITIVE primary-language match fails, the
    # reference falls back to a case-INSENSITIVE match against the full
    # language map (crawlers/util.go:75-106, EqualFold at :85). On by
    # default — the reference always runs both stages on the crawl side.
    lang_ci_fallback: bool = True
    keep_forks: bool = False
    # total successful-fetch budget for the crawl. Global
    # (crawlers/github.go:121,128-129,205-210) unless limit_per_language,
    # which caps each language separately (≙ use_search_api per-language
    # limit, crawlers/github.go:225,260-262; README.md:146-152). 0 = unlimited.
    limit: int = 0
    limit_per_language: bool = False
    since_seq: int = 0  # resume offset, first round only (crawld.go:116,266)
    # politeness / scheduling
    round_duration_s: float = 60.0  # virtual seconds per round
    default_crawl_delay_s: float = 1.0
    max_urls_per_host_per_round: int = 64
    max_urls_per_round: int = 0  # 0 = unlimited (global budget)
    max_attempts: int = 0  # 0 = retry forever (≙ crawld retry-next-round, crawld.go:92-95)
    # re-fetch previously-fetched URLs after this many rounds; 0 = never
    # (frontier crawl), 1 ≙ the reference's full re-fetch pass every round
    # (crawld.go:109-249 repoWorker scans the whole work list per round)
    recrawl_after_rounds: int = 0
    link_priority_decay: float = 1.0  # child priority = parent - decay
    # measured frontier-priority signals (VERDICT r4 item 2): every k-th
    # round (round_id % k == 0; 0 = off) the round's scheduling order is
    # driven by signals computed from the COMMITTED fetched table —
    # integer PageRank (graph.pagerank) + inbound anchor counts
    # (graph.anchor_text_agg) + freshness change-rate (freshness.
    # change_rate) — composed into one absolute int64 priority that
    # replaces the stored row priority for every URL the signals cover
    # (≙ crawld ranking its work list by measured stars metadata,
    # crawlers/github.go:72-80 cascade → crawld.go:275 order). Absolute,
    # not additive, so a replayed/re-fired round recomputes the identical
    # value (idempotent). URLs without signal coverage (e.g. seeds before
    # any fetch) keep their stored priority.
    signal_priority_every: int = 0
    signal_pr_iters: int = 3  # PageRank iterations per firing
    # integer weights, micro-unit domain (rank_q is 1e6-scaled):
    # priority = w_pr·rank_q + w_anchor·n_inlinks + w_fresh·priority_q
    signal_w_pagerank: int = 1
    signal_w_anchor: int = 1000
    signal_w_freshness: int = 1
    # error throttler (≙ errbag defaults, config/config.go:174-184)
    throttler_wait_s: float = 1800.0
    throttler_window: int = 60
    throttler_leak_s: float = 1.0
    # too_many_calls lane (C7): a host that returned a rate-limit error this
    # round sleeps until "quota reset" — clock pushed past the round end by
    # this much (≙ sleep-until-limits.Core.Reset, crawlers/github.go:98-107)
    rate_limit_wait_s: float = 60.0
    # seen-set sizing (engine-only; SURVEY.md §7.3)
    n_seen_shards: int = 32
    cuckoo_capacity_per_shard: int = 1 << 16
    bloom_bits: int = 1 << 20  # global broadcast bloom (pre-pass)
    # execution
    max_workers: int = 1  # informational; Spark parallelism rules execution
    shuffle_partitions: int = 32
    salt_buckets: int = 8  # hot-host skew salting (SURVEY.md §4.2)
    # politeness scheduler implementation: "native" = pure-Spark window plan
    # (JVM, whole-stage codegen); "pandas" = groupBy(host).applyInPandas heap.
    # Semantically identical (tested); native is the scale path.
    scheduler: str = "native"
    crawl_interval: str = "0s"
    fetch_interval: str = "0s"

    def validate(self) -> "CrawlConfig":
        """≙ Config.verify chain (config/config.go:193-273): defaulting then
        hard failure on nonsense values."""
        if self.max_workers < 1:
            self.max_workers = 1  # ≙ config/config.go:170-172
        if self.throttler_wait_s <= 0:
            self.throttler_wait_s = 1800.0  # ≙ config/config.go:174-184
        if self.throttler_window <= 0:
            self.throttler_window = 60
        if self.throttler_leak_s <= 0:
            self.throttler_leak_s = 1.0
        if self.round_duration_s <= 0:
            raise ValueError("round_duration_s must be > 0")
        if self.default_crawl_delay_s < 0:
            raise ValueError("default_crawl_delay_s must be >= 0")
        if self.n_seen_shards < 1 or self.n_seen_shards & (self.n_seen_shards - 1):
            raise ValueError("n_seen_shards must be a power of two")
        if self.bloom_bits < 64 or self.bloom_bits & (self.bloom_bits - 1):
            raise ValueError("bloom_bits must be a power of two >= 64")
        if self.limit < 0 or self.since_seq < 0:
            raise ValueError("limit/since_seq must be >= 0")
        if self.scheduler not in ("native", "pandas"):
            raise ValueError("scheduler must be 'native' or 'pandas'")
        if self.recrawl_after_rounds < 0:
            raise ValueError("recrawl_after_rounds must be >= 0")
        if self.rate_limit_wait_s < 0:
            raise ValueError("rate_limit_wait_s must be >= 0")
        if self.signal_priority_every < 0:
            raise ValueError("signal_priority_every must be >= 0")
        if self.signal_priority_every > 0 and self.signal_pr_iters < 1:
            raise ValueError("signal_pr_iters must be >= 1 when signals are on")
        # durations must parse (≙ config/config.go:198-204)
        parse_duration(self.crawl_interval)
        parse_duration(self.fetch_interval)
        return self

    @classmethod
    def from_json(cls, path_or_str: str) -> "CrawlConfig":
        try:
            raw: dict[str, Any] = json.loads(path_or_str)
        except json.JSONDecodeError:
            with open(path_or_str) as f:
                raw = json.load(f)
        known = {f_.name for f_ in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**raw).validate()

    def to_dict(self) -> dict[str, Any]:
        return asdict(self)
