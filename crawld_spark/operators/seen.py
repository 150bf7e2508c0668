"""URL-seen set: broadcast bloom pre-pass → partitioned cuckoo shards →
exact anti-join residue.

This is the engine's replacement for the reference's natural-key point
lookups + DB unique constraints (`getRepoID` & friends,
/root/reference/crawlers/github.go:374-470; unique constraints
db/create_schema.sql:290-347): *a URL is admitted to the frontier at most
once, ever* — and the check must be exact (the DB gave crawld exactness for
free; approximate filters alone cannot).

Three-tier design (north_star), each tier exact-safe:

  1. **bloom pre-pass** (broadcast per executor): candidates whose hash is
     NOT in the bloom are *definitely new* → skip the probe shuffle
     entirely. At 10^10 URLs the broadcast bloom covers the hot head of the
     seen set (sized by ``bloom_bits``); a false positive only means falling
     through to tier 2.
  2. **cuckoo shards** (``seen_shards`` table, one 4-slot-bucket cuckoo
     filter blob per shard, shard = pmod(xxhash64(url), n_shards)):
     cogrouped ``applyInPandas`` probe. Cuckoo-negative = definitely new
     (no false negatives — insert overflow is spilled into the blob).
  3. **exact residue**: cuckoo-positives (almost all true duplicates) are
     left-anti-joined against the frontier — the canonical Spark
     insert-if-absent idiom (SURVEY.md §2.3 J3). False positives survive
     and are admitted correctly.

Inserts are idempotent under task retry: candidates are sorted before
insertion and the cuckoo kick path is deterministic, so a replayed round
produces byte-identical blobs (SURVEY.md §7.7.1).

All hashing is Spark's JVM-side ``xxhash64`` (stable, codegen'd); Python
never hashes URLs in this path.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawld_spark.functions.hashing import splitmix64

BUCKET_SLOTS = 4
_MAX_KICKS = 500
_MAGIC = 0xC0C0

SEEN_SHARDS_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType(), False),
        StructField("cuckoo", BinaryType(), True),
        StructField("bloom", BinaryType(), True),
        StructField("n_items", LongType(), False),
        StructField("round_id", IntegerType(), False),
    ]
)


def _splitmix_scalar(x: int) -> int:
    return int(splitmix64(np.array([x], dtype=np.uint64))[0])


class CuckooFilter:
    """Partial-key cuckoo filter: 16-bit fingerprints, 4 slots/bucket,
    deterministic kick path, exact spill list on overflow (no false
    negatives, ever)."""

    def __init__(self, capacity: int):
        nb = 1
        while nb * BUCKET_SLOTS < capacity:
            nb <<= 1
        self.nbuckets = nb
        self.table = np.zeros((nb, BUCKET_SLOTS), dtype=np.uint16)
        self.overflow: set[int] = set()
        self.n_items = 0

    # -- hash decomposition --
    def _fp_idx(self, h: np.ndarray):
        h = h.astype(np.uint64)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        mask = np.uint64(self.nbuckets - 1)
        i1 = (h & mask).astype(np.int64)
        i2 = (i1.astype(np.uint64) ^ (splitmix64(fp.astype(np.uint64)) & mask)).astype(np.int64)
        return fp, i1, i2

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_idx(h)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.overflow:
            ov = np.fromiter(
                (int(x) in self.overflow for x in h.astype(np.uint64)), dtype=bool, count=len(h)
            )
            hit |= ov
        return hit

    def insert(self, h: int) -> None:
        """Insert one pre-checked-absent hash. Deterministic kicks."""
        fp_a, i1_a, i2_a = self._fp_idx(np.array([h], dtype=np.uint64))
        fp, i1, i2 = int(fp_a[0]), int(i1_a[0]), int(i2_a[0])
        self.n_items += 1
        for i in (i1, i2):
            row = self.table[i]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = fp
                return
        # deterministic eviction walk
        i = i1 if (fp & 1) == 0 else i2
        cur = fp
        for kick in range(_MAX_KICKS):
            slot = (cur + kick) % BUCKET_SLOTS
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = int((np.uint64(i) ^ (splitmix64(np.array([cur], dtype=np.uint64))[0]
                                     & np.uint64(self.nbuckets - 1))))
            row = self.table[i]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = cur
                return
        self.overflow.add(int(np.uint64(h)))  # exact spill — never lose membership

    def to_bytes(self) -> bytes:
        ov = np.fromiter(self.overflow, dtype=np.uint64, count=len(self.overflow))
        ov.sort()  # deterministic serialization
        header = struct.pack("<HHIqq", _MAGIC, 0, self.nbuckets, self.n_items, len(ov))
        return header + self.table.tobytes() + ov.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        magic, _, nb, n_items, n_ov = struct.unpack_from("<HHIqq", blob, 0)
        assert magic == _MAGIC, "bad cuckoo blob"
        off = struct.calcsize("<HHIqq")
        obj = cls.__new__(cls)
        obj.nbuckets = nb
        tbl_bytes = nb * BUCKET_SLOTS * 2
        obj.table = (
            np.frombuffer(blob, dtype=np.uint16, count=nb * BUCKET_SLOTS, offset=off)
            .reshape(nb, BUCKET_SLOTS)
            .copy()
        )
        ov = np.frombuffer(blob, dtype=np.uint64, count=n_ov, offset=off + tbl_bytes)
        obj.overflow = set(int(x) for x in ov)
        obj.n_items = n_items
        return obj


class Bloom:
    """Plain m-bit bloom, k=4 via double hashing on splitmix64 streams."""

    K = 4

    def __init__(self, m_bits: int, words: np.ndarray | None = None):
        assert m_bits >= 64 and (m_bits & (m_bits - 1)) == 0
        self.m = m_bits
        self.words = words if words is not None else np.zeros(m_bits // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64)
        h1 = splitmix64(h)
        h2 = splitmix64(h ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        mask = np.uint64(self.m - 1)
        return np.stack([(h1 + np.uint64(j) * h2) & mask for j in range(self.K)], axis=1)

    def add_many(self, h: np.ndarray) -> None:
        if len(h) == 0:
            return
        pos = self._positions(h).reshape(-1)
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains_many(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        bits = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)

    def to_bytes(self) -> bytes:
        return struct.pack("<q", self.m) + self.words.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "Bloom":
        (m,) = struct.unpack_from("<q", blob, 0)
        words = np.frombuffer(blob, dtype=np.uint64, offset=8).copy()
        return cls(m, words)

    def union_bytes(self, blob: bytes) -> None:
        other = Bloom.from_bytes(blob)
        assert other.m == self.m
        self.words |= other.words


def empty_shards(spark: SparkSession, n_shards: int, capacity: int, bloom_bits: int) -> DataFrame:
    rows = []
    for s in range(n_shards):
        rows.append(
            (s, CuckooFilter(capacity).to_bytes(), Bloom(bloom_bits).to_bytes(), 0, 0)
        )
    return spark.createDataFrame(rows, SEEN_SHARDS_SCHEMA)


def with_url_hash(df: DataFrame, n_shards: int, url_col: str = "url") -> DataFrame:
    """JVM-side hash + shard columns; whole-stage-codegen'd, no Python."""
    return df.withColumn("h", F.xxhash64(F.col(url_col))).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int")
    )


def global_bloom_bytes(shards_df: DataFrame, bloom_bits: int) -> bytes:
    """Driver-side OR of the (column-pruned) per-shard blooms → the broadcast
    pre-pass filter. Reads only the bloom column (Parquet column pruning:
    cuckoo blobs are never fetched to the driver)."""
    g = Bloom(bloom_bits)
    for row in shards_df.select("bloom").collect():
        if row["bloom"]:
            g.union_bytes(bytes(row["bloom"]))
    return g.to_bytes()


def bloom_maybe_seen_col(spark: SparkSession, bloom_bytes: bytes):
    """Returns a pandas-UDF column fn: h:int64 -> bool (bloom membership).
    The blob rides to executors via an sc.broadcast (read once per worker)."""
    bc = spark.sparkContext.broadcast(bloom_bytes)

    @F.pandas_udf(BooleanType())
    def maybe_seen(h: pd.Series) -> pd.Series:
        bloom = Bloom.from_bytes(bc.value)
        return pd.Series(bloom.contains_many(h.to_numpy(dtype=np.int64).view(np.uint64)))

    return maybe_seen


_PROBE_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("h", LongType(), False),
        StructField("shard", IntegerType(), False),
        StructField("cuckoo_seen", BooleanType(), False),
    ]
)


def cuckoo_probe(candidates: DataFrame, shards: DataFrame) -> DataFrame:
    """Cogrouped probe: (url,h,shard) × seen_shards → +cuckoo_seen."""

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=["url", "h", "shard", "cuckoo_seen"])
        if right.empty:
            seen = np.zeros(len(left), dtype=bool)
        else:
            cf = CuckooFilter.from_bytes(bytes(right["cuckoo"].iloc[0]))
            seen = cf.contains_many(left["h"].to_numpy(dtype=np.int64).view(np.uint64))
        return pd.DataFrame(
            {"url": left["url"], "h": left["h"], "shard": left["shard"], "cuckoo_seen": seen}
        )

    return (
        candidates.select("url", "h", "shard")
        .groupBy("shard")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(probe, _PROBE_SCHEMA)
    )


def cuckoo_insert(admitted: DataFrame, shards: DataFrame, round_id: int) -> DataFrame:
    """Cogrouped insert of admitted hashes → new seen_shards rows (all
    shards, including untouched ones). Deterministic + idempotent: input
    sorted by (h, url); replay rewrites identical bytes."""

    def ins(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        assert not right.empty, "seen_shards must be bootstrapped for every shard"
        row = right.iloc[0]
        cf = CuckooFilter.from_bytes(bytes(row["cuckoo"]))
        bloom = Bloom.from_bytes(bytes(row["bloom"]))
        n_new = 0
        if not left.empty:
            ordered = left.sort_values(["h", "url"], kind="mergesort")
            hs = ordered["h"].to_numpy(dtype=np.int64).view(np.uint64)
            fresh = ~cf.contains_many(hs)
            for h in hs[fresh]:
                cf.insert(int(h))
                n_new += 1
            bloom.add_many(hs)
        return pd.DataFrame(
            {
                "shard_id": [int(row["shard_id"])],
                "cuckoo": [cf.to_bytes()],
                "bloom": [bloom.to_bytes()],
                "n_items": [int(row["n_items"]) + n_new],
                "round_id": [round_id],
            }
        )

    return (
        admitted.select("url", "h", "shard")
        .groupBy("shard")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(ins, SEEN_SHARDS_SCHEMA)
    )


def admit_new_urls(
    spark: SparkSession,
    candidates: DataFrame,  # columns: url (canonical), priority
    shards: DataFrame,
    frontier_urls: DataFrame,  # column: url (the exact seen set of record)
    n_shards: int,
    bloom_bits: int,
    round_id: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Full three-tier admission. Returns (admitted(url, priority, h, shard),
    new_shards). ``candidates`` must already be unique on url (caller
    pre-aggregates max(priority))."""
    cand = with_url_hash(candidates, n_shards)

    bloom_bytes = global_bloom_bytes(shards, bloom_bits)
    maybe_seen = bloom_maybe_seen_col(spark, bloom_bytes)
    cand = cand.withColumn("bloom_seen", maybe_seen(F.col("h"))).cache()

    definite_new = cand.where(~F.col("bloom_seen"))  # tier 1 fast path
    suspects = cand.where(F.col("bloom_seen"))

    probed = cuckoo_probe(suspects, shards)  # tier 2
    cuckoo_new = probed.where(~F.col("cuckoo_seen")).select("url", "h", "shard")
    residue = probed.where(F.col("cuckoo_seen")).select("url", "h", "shard")

    # tier 3: exact — survivors of the anti-join are cuckoo false positives
    fp_survivors = residue.join(frontier_urls.select("url"), on="url", how="left_anti")

    admitted_keys = (
        definite_new.select("url", "h", "shard")
        .unionByName(cuckoo_new)
        .unionByName(fp_survivors)
    )
    admitted = admitted_keys.join(
        candidates.select("url", "priority"), on="url", how="inner"
    )

    new_shards = cuckoo_insert(admitted, shards, round_id=round_id)
    return admitted, new_shards
