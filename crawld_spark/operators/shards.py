"""Host → fetcher-shard assignment via rendezvous (HRW) hashing.

crawld fans its work list out to a bounded in-process worker pool
(/root/reference/crawld.go:129-243, ``max_fetcher_workers``
/root/reference/config/config.go); on a multi-executor cluster the same
role is played by a stable host → fetcher-shard map. Stability matters
twice over:

- **politeness locality** — every URL of a host must land on the shard
  that owns that host's crawl-delay clock, or per-host politeness state
  would need a cross-executor consensus;
- **elastic resize** — when the fleet grows from S to S+1 shards, a
  modulo map (``hash(host) % S``) reshuffles ~all hosts; rendezvous
  hashing moves only the hosts whose new-shard weight wins, i.e. an
  expected 1/(S+1) of them, so warm robots caches, DNS state and
  politeness clocks survive a scale-up.

Method (Thaler & Ravishankar's highest-random-weight): shard(h) =
argmax over s in [0, S) of md5(h || '#' || s). MD5 is the one hash
Spark and DuckDB share bit-for-bit (module contract in queries.py), so
the assignment replays identically in the oracle.

Scale shape: the argmax is a pure per-row projection — an S-element
array of (md5, shard) structs folded with ``array_max`` — no shuffle,
no UDF, whole-stage codegen. Cost is S md5s per *host* (not per URL:
callers collapse the URL table to host grain first, 3-4 orders smaller).
The array form is right for S up to a few hundred shards; for thousands
of shards prefer two-level assignment (rendezvous over shard *groups*,
then within the group) rather than exploding the weight array through a
groupBy — the explode form turns a projection into a shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def rendezvous_shard(host: Column, n_shards: int) -> Column:
    """Highest-random-weight shard id (long, in ``[0, n_shards)``) for a
    host column: ``argmax_s md5(host || '#' || s)``. Deterministic,
    shuffle-free, identical in DuckDB as the row_number-over-md5 twin."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    weights = F.array(
        *[
            F.struct(
                F.md5(F.concat(host, F.lit(f"#{s}"))).alias("w"),
                F.lit(s).cast("long").alias("shard"),
            )
            for s in range(n_shards)
        ]
    )
    return F.array_max(weights).getField("shard")


def assign_shards(
    hosts: DataFrame,
    n_shards: int,
    host_col: str = "host",
    out: str = "shard",
) -> DataFrame:
    """Add the rendezvous shard id for ``host_col`` as column ``out``."""
    return hosts.withColumn(out, rendezvous_shard(F.col(host_col), n_shards))


def shard_resize_stats(
    hosts: DataFrame,
    n_from: int,
    n_to: int,
    host_col: str = "host",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-shard load at ``n_from`` shards plus resize churn toward
    ``n_to`` shards: ``(shard, n_hosts, n_pages, n_moved)`` where
    ``n_moved`` counts hosts of this shard whose assignment changes when
    the fleet resizes. Both assignments are projections of the same row,
    so the whole statistic is ONE host-grain aggregation — no join.

    ``weight_col`` (optional, e.g. page counts) feeds ``n_pages``;
    without it ``n_pages == n_hosts``.
    """
    h = hosts.select(
        F.col(host_col).alias("host"),
        (
            F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
        ).alias("_w"),
        rendezvous_shard(F.col(host_col), n_from).alias("shard"),
        rendezvous_shard(F.col(host_col), n_to).alias("_shard_to"),
    )
    return (
        h.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("_w").cast("long").alias("n_pages"),
            F.sum(
                F.when(F.col("shard") != F.col("_shard_to"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_moved"),
        )
    )
