"""Z-order (Morton) clustering keys for multi-dimensional table layout.

The data-layout tool behind Delta/Iceberg ``OPTIMIZE ... ZORDER BY``: a
table range-partitioned and sorted by the bit-interleaved key of two
columns gives BOTH columns locality, so parquet zone maps (min/max per row
group) prune point and range scans on either dimension — the layout the
100 TB frontier wants when lookups come keyed by host (politeness,
robots) AND by url (seen probes, upserts). One interleaved sort replaces
choosing a single winner.

Everything is closed-form int64 bit arithmetic — exchange-free expressions
(the DuckDB twin states the identical shifts), no UDF, no state. The
clustering itself is ``repartitionByRange`` over the key: one range
exchange at write time buys zone-map pruning on every read after.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MAX_BITS = 31  # 2 dims × 31 bits = 62 bits < int64


def zorder_key(a: Column, b: Column, bits: int = 21) -> Column:
    """Bit-interleave the low ``bits`` bits of two NON-NEGATIVE int
    columns: dim ``a`` occupies even bit positions, ``b`` odd. 2·bits must
    stay under 63 (int64). Inputs from an unbounded domain should be
    hash-folded first (``pmod(xxhash64(col), 1 << bits)``)."""
    if not (1 <= bits <= MAX_BITS):
        raise ValueError(f"bits must be 1..{MAX_BITS}")
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_key_hashed(a: Column, b: Column, bits: int = 21) -> Column:
    """zorder_key over hash-folded arbitrary columns (strings, wide ints):
    each dimension becomes ``pmod(xxhash64(col), 2^bits)`` first — the
    form the frontier uses for (host, url)."""
    fold = F.lit(1 << bits).cast("long")
    return zorder_key(
        F.pmod(F.xxhash64(a), fold), F.pmod(F.xxhash64(b), fold), bits
    )


def cluster_by_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_partitions: int,
    bits: int = 21,
) -> DataFrame:
    """Range-partition + sort the frame by the interleaved key of two
    (hash-folded) columns — the write-side half of ZORDER OPTIMIZE. Each
    output partition then covers a narrow range of BOTH dimensions'
    hash spaces, so per-file min/max stats prune reads keyed by either."""
    keyed = df.withColumn(
        "_zk", zorder_key_hashed(F.col(col_a), F.col(col_b), bits)
    )
    return keyed.repartitionByRange(n_partitions, "_zk").sortWithinPartitions(
        "_zk"
    )
