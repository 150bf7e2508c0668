"""Per-host politeness scheduler: robots allow/deny, crawl-delay clocks,
error throttling, and a host-sharded max-heap priority queue — all inside
``groupBy(host).applyInPandas`` (north_star design).

Reference semantics carried over:

- crawl-delay clock ≙ the API rate-limit gate: sleep until quota reset, then
  proceed (/root/reference/crawlers/github.go:87-111). Here the "clock" is a
  deterministic virtual timeline: round r spans
  ``[r*T, (r+1)*T)`` virtual seconds (T = round_duration_s); a host with
  crawl delay d and next_allowed time t0 fetches at t0, t0+d, t0+2d, …
  while inside the round window. No wall clock anywhere (SURVEY.md §7.0).
- error throttling ≙ the errbag leaky bucket (crawld.go:404-409; defaults
  1800 s wait / window 60 / leak 1000 ms, config/config.go:174-184): the
  per-host error score leaks at 1/leak_s per virtual second; when it
  exceeds the window the host's next_allowed jumps by wait_s and the score
  deflates (≙ errbag.Deflate, crawld.go:437).
- fetch ordering ≙ ``ORDER BY id`` (crawld.go:275) + stars-descending
  (crawlers/github.go:246): within a host, strictly
  ``(priority DESC, discovery_seq ASC)`` — implemented as a real heap
  (O(n log k) top-k pop, not a full sort).

Skew: a hot host (Zipf head) can hold most of the frontier. The scheduler is
two-phase — phase 1 pre-selects per (host, salt) with salt =
pmod(xxhash64(url), salt_buckets) so no single task sees the whole hot
host's pending set; phase 2 runs the exact politeness logic per host on the
reduced union (≤ salt_buckets × budget rows/host). Deterministic because
phase 1's selection criterion (top-k by the same total order) commutes with
phase 2's.
"""

from __future__ import annotations

import heapq

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawld_spark.config import CrawlConfig

SCHEDULED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("priority", DoubleType(), False),
        StructField("discovery_seq", LongType(), False),
        StructField("decision", StringType(), False),  # fetch | denied
        StructField("sched_vt", DoubleType(), True),  # virtual fetch time
        StructField("seq_in_host", IntegerType(), True),
    ]
)

HOST_STATE_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("next_allowed_vt", DoubleType(), False),
        StructField("crawl_delay_s", DoubleType(), False),
        StructField("error_score", DoubleType(), False),
        StructField("last_error_vt", DoubleType(), False),
    ]
)


def path_of(url: str) -> str:
    """URL path (query included), '/' when absent — the single path
    definition shared by both scheduler implementations and the simulator
    (a 'Disallow: /' must deny identically everywhere)."""
    i = url.find("://")
    j = url.find("/", i + 3) if i >= 0 else -1
    return url[j:] if j >= 0 else "/"


def _schedule_host(pdf: pd.DataFrame, round_id: int, cfg: CrawlConfig) -> pd.DataFrame:
    """Exact per-host politeness over one host's pending rows (pdf carries
    the host_state columns joined on)."""
    out_url, out_host, out_pri, out_seq, out_dec, out_vt, out_k = [], [], [], [], [], [], []
    host = pdf["host"].iloc[0]
    t_start = round_id * cfg.round_duration_s
    t_end = t_start + cfg.round_duration_s
    delay = float(pdf["crawl_delay_s"].iloc[0])
    next_allowed = float(pdf["next_allowed_vt"].iloc[0])
    prefixes = pdf["disallow_prefixes"].iloc[0]
    prefixes = list(prefixes) if prefixes is not None else []

    # robots allow/deny (≙ candidate filters running before the fetch,
    # crawlers/github.go:166-182 cheap-filter-first)
    heap: list[tuple[float, int, str]] = []
    for url, pri, seq in zip(pdf["url"], pdf["priority"], pdf["discovery_seq"]):
        if any(path_of(url).startswith(p) for p in prefixes):
            out_url.append(url); out_host.append(host); out_pri.append(float(pri))
            out_seq.append(int(seq)); out_dec.append("denied"); out_vt.append(None)
            out_k.append(None)
            continue
        heapq.heappush(heap, (-float(pri), int(seq), url))

    t = max(next_allowed, t_start)
    k = 0
    while heap and t < t_end and k < cfg.max_urls_per_host_per_round:
        neg_pri, seq, url = heapq.heappop(heap)
        out_url.append(url); out_host.append(host); out_pri.append(-neg_pri)
        out_seq.append(seq); out_dec.append("fetch"); out_vt.append(t); out_k.append(k)
        t += max(delay, 1e-9)
        k += 1

    return pd.DataFrame(
        {
            "url": out_url,
            "host": pd.Series(out_host, dtype="str"),
            "priority": pd.Series(out_pri, dtype="float64"),
            "discovery_seq": pd.Series(out_seq, dtype="int64"),
            "decision": pd.Series(out_dec, dtype="str"),
            "sched_vt": pd.Series(out_vt, dtype="float64"),
            "seq_in_host": pd.Series(out_k, dtype="Int32"),
        }
    )


def _preselect_host_salt(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Phase 1: per (host, salt) keep robots-denied rows + top-`budget`
    fetchable rows by (priority desc, seq asc). Pure pre-filter — phase 2
    re-evaluates the exact logic."""
    prefixes = pdf["disallow_prefixes"].iloc[0]
    prefixes = list(prefixes) if prefixes is not None else []

    denied_mask = pdf["url"].map(lambda u: any(path_of(u).startswith(p) for p in prefixes))
    denied = pdf[denied_mask]
    fetchable = pdf[~denied_mask]
    if len(fetchable) > budget:
        fetchable = fetchable.sort_values(
            ["priority", "discovery_seq"], ascending=[False, True], kind="mergesort"
        ).head(budget)
    return pd.concat([denied, fetchable], ignore_index=True)


_IN_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("priority", DoubleType()),
        StructField("discovery_seq", LongType()),
        StructField("next_allowed_vt", DoubleType()),
        StructField("crawl_delay_s", DoubleType()),
        StructField("error_score", DoubleType()),
        StructField("last_error_vt", DoubleType()),
        StructField("disallow_prefixes", ArrayType(StringType())),
    ]
)


def _enrich_pending(
    pending: DataFrame, host_state: DataFrame, robots: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    enriched = (
        pending.join(F.broadcast(robots), on="host", how="left")
        .join(
            F.broadcast(
                host_state.select("host", "next_allowed_vt", "error_score", "last_error_vt")
            ),
            on="host",
            how="left",
        )
        .withColumn("next_allowed_vt", F.coalesce("next_allowed_vt", F.lit(0.0)))
        .withColumn(
            "crawl_delay_s", F.coalesce("crawl_delay_s", F.lit(cfg.default_crawl_delay_s))
        )
        .withColumn("error_score", F.coalesce("error_score", F.lit(0.0)))
        .withColumn("last_error_vt", F.coalesce("last_error_vt", F.lit(0.0)))
    )

    cols = [f.name for f in _IN_SCHEMA.fields]
    return enriched.select(*cols)


def schedule_round(
    pending: DataFrame,  # url, host, priority, discovery_seq
    host_state: DataFrame,  # HOST_STATE_SCHEMA
    robots: DataFrame,  # host, disallow_prefixes, crawl_delay_s
    round_id: int,
    cfg: CrawlConfig,
) -> DataFrame:
    """→ SCHEDULED_SCHEMA rows: the round's fetch list (with virtual fetch
    times) + robots-denied rows. Unscheduled pending rows simply stay
    pending in the frontier (no row emitted).

    Pure-Spark plan (default): the per-host priority queue + crawl-delay
    clock are a window function — ``k = row_number() over (partition by host
    order by priority desc, discovery_seq asc) - 1`` gives the pop order, and
    the k-th fetch of a host lands at virtual time
    ``max(next_allowed, t_start) + k·delay``, schedulable iff it falls inside
    the round window and under the per-host budget. Robots allow/deny is
    ``exists(disallow_prefixes, p -> startswith(path, p))`` — a JVM
    higher-order function. Everything stays in whole-stage codegen; per-URL
    Python (the heap in ``schedule_round_pandas``) is only needed if the
    policy ever becomes non-rankable (e.g. adaptive per-response delays).
    The two implementations are semantically identical — asserted by
    tests/test_functions.py — and ``cfg.scheduler`` selects one.

    Skew: the hot host's window partition is pre-trimmed by a first window
    over (host, salt buckets of xxhash64(url)) keeping only the per-bucket
    top-budget — no single task ever sorts the whole hot host's pending set
    (SURVEY.md §4.2).
    """
    if cfg.scheduler == "pandas":
        return schedule_round_pandas(pending, host_state, robots, round_id, cfg)

    t_start = round_id * cfg.round_duration_s
    t_end = t_start + cfg.round_duration_s
    budget = cfg.max_urls_per_host_per_round

    enriched = _enrich_pending(pending, host_state, robots, cfg)
    # url path (query string included), '/' when absent — same as the
    # pandas scheduler's path_of
    after = F.when(
        F.instr(F.col("url"), "://") > 0,
        F.expr("substring(url, instr(url, '://') + 3)"),
    ).otherwise(F.col("url"))
    enriched = enriched.withColumn("_after", after).withColumn(
        "_path",
        F.when(
            F.instr(F.col("_after"), "/") > 0,
            F.expr("substring(_after, instr(_after, '/'))"),
        ).otherwise(F.lit("/")),
    )
    is_denied = F.when(F.col("disallow_prefixes").isNull(), F.lit(False)).otherwise(
        F.exists("disallow_prefixes", lambda p: F.col("_path").startswith(p))
    )
    enriched = enriched.withColumn("_denied", is_denied)

    # Single-pass plan: denied rows ride along (they are always emitted),
    # and the per-host pop index k counts only non-denied rows via a
    # conditional running count — no union of two branches, so the upstream
    # chain (rank assignment, joins) is scanned exactly once.
    order = [F.desc("priority"), F.asc("discovery_seq")]
    not_denied = F.when(F.col("_denied"), F.lit(0)).otherwise(F.lit(1))
    # skew pre-trim: top-budget non-denied per (host, salt) is a superset of
    # the per-host top-budget (selection by the same total order commutes)
    trimmed = (
        enriched.withColumn(
            "_salt", F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets)).cast("int")
        )
        .withColumn(
            "_rk1",
            F.sum(not_denied).over(
                Window.partitionBy("host", "_salt").orderBy(*order)
            ),
        )
        .where(F.col("_denied") | (F.col("_rk1") <= budget))
    )
    k = (
        F.sum(not_denied).over(Window.partitionBy("host").orderBy(*order)) - F.lit(1)
    ).cast("int")
    t0h = F.greatest(F.col("next_allowed_vt"), F.lit(float(t_start)))
    vt = t0h + k.cast("double") * F.greatest(F.col("crawl_delay_s"), F.lit(1e-9))
    scheduled = (
        trimmed.withColumn("seq_in_host", k)
        .withColumn("sched_vt", vt)
        .withColumn(
            "decision",
            F.when(F.col("_denied"), F.lit("denied"))
            .when(
                (F.col("sched_vt") < F.lit(float(t_end)))
                & (F.col("seq_in_host") < budget),
                F.lit("fetch"),
            )
            .otherwise(F.lit(None).cast("string")),
        )
        .where(F.col("decision").isNotNull())
    )
    return scheduled.select(
        "url", "host", "priority", "discovery_seq", "decision",
        F.when(F.col("decision") == "fetch", F.col("sched_vt"))
        .otherwise(F.lit(None).cast("double")).alias("sched_vt"),
        F.when(F.col("decision") == "fetch", F.col("seq_in_host"))
        .otherwise(F.lit(None).cast("int")).alias("seq_in_host"),
    )


def schedule_round_pandas(
    pending: DataFrame,
    host_state: DataFrame,
    robots: DataFrame,
    round_id: int,
    cfg: CrawlConfig,
) -> DataFrame:
    """The groupBy(host).applyInPandas scheduler (north_star's prescribed
    shape): salted pre-select, then the exact per-host heap. Semantically
    identical to the window plan in ``schedule_round``; kept as the general
    path for policies a rank can't express, and as the cross-check oracle."""
    budget = cfg.max_urls_per_host_per_round
    enriched = _enrich_pending(pending, host_state, robots, cfg)
    salted = enriched.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets)).cast("int")
    )
    phase1 = salted.groupBy("host", "salt").applyInPandas(
        lambda pdf: _preselect_host_salt(pdf.drop(columns=["salt"]), budget),
        StructType(_IN_SCHEMA.fields),
    )

    rd, c = round_id, cfg
    return phase1.groupBy("host").applyInPandas(
        lambda pdf: _schedule_host(pdf, rd, c), SCHEDULED_SCHEMA
    )


def advance_host_state(
    host_state: DataFrame,
    robots: DataFrame,  # host, crawl_delay_s (authoritative delays)
    scheduled: DataFrame,  # SCHEDULED_SCHEMA (this round's output)
    fetch_errors: DataFrame,  # host, n_errors (this round's failed fetches)
    round_id: int,
    cfg: CrawlConfig,
) -> DataFrame:
    """Pure-DataFrame host_state advance: clock moves past the last
    scheduled fetch; leaky-bucket error score updates; over-threshold hosts
    are pushed out by throttler_wait_s (≙ errbag semantics,
    /root/reference/crawld.go:404-409)."""
    t_start = round_id * cfg.round_duration_s
    t_end = t_start + cfg.round_duration_s

    per_host = (
        scheduled.where(F.col("decision") == "fetch")
        .groupBy("host")
        .agg(F.count("*").alias("n_sched"), F.max("sched_vt").alias("last_vt"))
    )
    if "n_rate_limited" not in fetch_errors.columns:
        fetch_errors = fetch_errors.withColumn("n_rate_limited", F.lit(0))
    hs = (
        host_state.withColumnRenamed("crawl_delay_s", "state_delay_s")
        .join(per_host, on="host", how="outer")
        .join(fetch_errors, on="host", how="left")
        .join(robots.select("host", F.col("crawl_delay_s").alias("robots_delay_s")),
              on="host", how="left")
        .fillna({"n_sched": 0, "n_errors": 0, "n_rate_limited": 0})
        .withColumn(
            "crawl_delay_s",
            F.coalesce("state_delay_s", "robots_delay_s", F.lit(cfg.default_crawl_delay_s)),
        )
        .withColumn("next_allowed_vt", F.coalesce(F.col("next_allowed_vt"), F.lit(0.0)))
        .withColumn("error_score", F.coalesce(F.col("error_score"), F.lit(0.0)))
        .withColumn("last_error_vt", F.coalesce(F.col("last_error_vt"), F.lit(0.0)))
    )
    # clock: after n fetches ending at last_vt, next allowed = last_vt + delay
    hs = hs.withColumn(
        "next_allowed_vt",
        F.when(F.col("n_sched") > 0, F.col("last_vt") + F.col("crawl_delay_s")).otherwise(
            F.greatest(F.col("next_allowed_vt"), F.lit(float(t_start)))
        ),
    )
    # too_many_calls lane (C7): sleep until "quota reset" — the clock is
    # pushed past the round end by rate_limit_wait_s (≙ the call() wrapper
    # sleeping until limits.Core.Reset, crawlers/github.go:98-107)
    hs = hs.withColumn(
        "next_allowed_vt",
        F.when(
            F.col("n_rate_limited") > 0,
            F.greatest(F.col("next_allowed_vt"), F.lit(float(t_end)))
            + F.lit(cfg.rate_limit_wait_s),
        ).otherwise(F.col("next_allowed_vt")),
    )
    # leaky bucket: leak since last error event, then add this round's errors
    leaked = F.greatest(
        F.lit(0.0),
        F.col("error_score")
        - (F.lit(float(t_end)) - F.col("last_error_vt")) / F.lit(cfg.throttler_leak_s),
    )
    hs = hs.withColumn("error_score", leaked + F.col("n_errors").cast("double"))
    hs = hs.withColumn(
        "last_error_vt",
        F.when(F.col("n_errors") > 0, F.lit(float(t_end))).otherwise(F.col("last_error_vt")),
    )
    # throttle trip: ≙ errbag full → pause wait_time (crawld.go:70-74)
    tripped = F.col("error_score") >= F.lit(float(cfg.throttler_window))
    hs = hs.withColumn(
        "next_allowed_vt",
        F.when(tripped, F.col("next_allowed_vt") + F.lit(cfg.throttler_wait_s)).otherwise(
            F.col("next_allowed_vt")
        ),
    ).withColumn("error_score", F.when(tripped, F.lit(0.0)).otherwise(F.col("error_score")))

    return hs.select(
        "host", "next_allowed_vt", "crawl_delay_s", "error_score", "last_error_vt"
    )
