"""Freshness-driven recrawl scheduling.

The reference recrawls on a fixed cadence (cfg.recrawl_after_rounds ≙
crawld's update pass, crawld.go:92-104); real crawlers estimate each
URL's *change rate* from its own fetch history and spend the politeness
budget where content actually moves (the Poisson-freshness model behind
incremental crawl ordering). This module adds that estimator as a pure
relational op over the engine's fetch history.

Determinism: the rate is int64-quantized at the per-URL level
(``lambda_q = floor(1e6 · changes / intervals)``), so priorities are
integer-exact and cross-engine replayable (the repo-wide trick).

Scale (10^10 URLs × bounded revisits): the only window partitions by
URL and orders by round — a URL's history is at most the round count,
so window state is bounded; the aggregate shuffles (url-hash, longs)
once. Digests travel, never page bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000


def change_rate(
    history: DataFrame,  # one row per (url, round) observation
    now_round: int,
    id_col: str = "url",
    round_col: str = "round_id",
    digest_col: str = "digest",
) -> DataFrame:
    """Per-URL change-rate estimate and recrawl priority from fetch
    history. Returns ``(id_col, n_obs, n_changes, last_round, lambda_q,
    staleness, priority_q)``:

    - ``n_changes``: observations whose digest differs from the previous
      observation of the same URL (round order);
    - ``lambda_q = floor(SCALE · n_changes / max(n_obs - 1, 1))`` — the
      observed change probability per revisit interval, in micro-units;
    - ``staleness = now_round - last_round``;
    - ``priority_q = lambda_q · staleness`` — expected accumulated change
      mass, the recrawl ordering key (a fresh page that changes every
      visit outranks a stale one that never changed).

    One-observation URLs get ``lambda_q = 0``: no evidence of change
    beats assumed change for budget allocation — newly discovered pages
    compete through the discovery lane (rank.py fetch order), not the
    recrawl lane, mirroring the engine's clone-vs-update split (F8).
    """
    w = Window.partitionBy(id_col).orderBy("_r")
    h = history.select(
        F.col(id_col), F.col(round_col).cast("long").alias("_r"), F.col(digest_col).alias("_d")
    ).withColumn("_prev", F.lag("_d").over(w))
    per = h.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(
            (F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_d"))).cast(
                "long"
            )
        ).alias("n_changes"),
        F.max("_r").alias("last_round"),
    )
    lam = F.expr(f"({SCALE} * n_changes) div greatest(n_obs - 1, 1)")
    stale = F.lit(int(now_round)) - F.col("last_round")
    return per.select(
        id_col,
        "n_obs",
        "n_changes",
        "last_round",
        lam.cast("long").alias("lambda_q"),
        stale.cast("long").alias("staleness"),
        (lam * stale).cast("long").alias("priority_q"),
    )
