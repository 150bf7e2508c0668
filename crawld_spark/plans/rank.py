"""Scalable deterministic global ranking (discovery_seq assignment).

The reference gets dense global ids for free from PostgreSQL sequences
(/root/reference/db/create_schema.sql:55-60). Spark has no sequence; a naive
``row_number() OVER (ORDER BY ...)`` collapses to a single task — a
non-starter at 10^8 admitted URLs/round. This helper is the classic
two-phase zip-with-index, DataFrame-native:

  1. range-repartition + sort-within-partitions by the total order
  2. count rows per partition (tiny job on the cached sorted frame)
  3. broadcast the per-partition offsets; ``mapInPandas`` stamps
     ``start + offset[pid] + local_running_index``

The result is identical to the single-task window for any input (offsets are
exact counts, within-partition order is the same total order), but each
partition ranks independently. Ties must be impossible in ``order_cols``
(we always end with the unique canonical url — SURVEY.md §7.7.2).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def global_rank(
    df: DataFrame,
    order_cols: list,  # list of Column expressions (e.g. [F.desc("priority"), F.asc("url")])
    out: str = "seq",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a dense global rank column following the given total order."""
    if num_partitions is None:
        num_partitions = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        num_partitions = int(num_partitions)
    n_parts = max(1, min(num_partitions, 64))

    d = (
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    counts = {r["_pid"]: r["cnt"] for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(df.schema.fields + [StructField(out, LongType(), False)])

    def stamp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = None
        for b in batches:
            if len(b) == 0:
                continue
            pid = int(b["_pid"].iloc[0])
            if local is None:
                local = offsets[pid]
            b = b.drop(columns=["_pid"])
            b[out] = range(local, local + len(b))
            local += len(b)
            yield b

    ranked = d.mapInPandas(stamp, out_schema)
    return ranked
