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
    DoubleType,
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

    def insert_many(self, hs: np.ndarray) -> None:
        """Vectorized batch insert (pre-checked-absent hashes, caller-sorted
        for determinism). Two numpy placement passes (bucket i1 then i2,
        free slots assigned in input order via grouped ranks); only items
        whose both buckets are full fall back to the per-item kick walk —
        rare below ~95% load. Deterministic: placement is a pure function of
        (input order, table state)."""
        if len(hs) == 0:
            return
        hs = hs.astype(np.uint64)
        fp, i1, i2 = self._fp_idx(hs)
        occ = (self.table != 0).sum(axis=1).astype(np.int64)
        remaining = np.arange(len(hs))
        for idx_arr in (i1, i2):
            if len(remaining) == 0:
                break
            b = idx_arr[remaining]
            order = np.argsort(b, kind="stable")
            sb = b[order]
            first = np.r_[True, sb[1:] != sb[:-1]] if len(sb) else np.zeros(0, bool)
            grp_start = np.flatnonzero(first)
            run_len = np.diff(np.r_[grp_start, len(sb)])
            ranks = np.arange(len(sb)) - np.repeat(grp_start, run_len)
            slots = occ[sb] + ranks
            place = slots < BUCKET_SLOTS
            rows, cols = sb[place], slots[place]
            self.table[rows, cols] = fp[remaining][order][place]
            np.add.at(occ, rows, 1)
            remaining = remaining[order][~place]
        self.n_items += len(hs) - len(remaining)
        for j in remaining:  # full buckets → exact kick walk (rare)
            self.insert(int(hs[j]))

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
        # bitmap + packbits instead of np.bitwise_or.at (unbuffered ufunc.at
        # is ~10× slower); m bytes of scratch, little-endian bit order
        # matches the (pos & 63) shift convention
        bitmap = np.zeros(self.m, dtype=np.uint8)
        bitmap[pos] = 1
        self.words |= np.packbits(bitmap, bitorder="little").view(np.uint64)

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


def _seg_bits(bloom_bits: int, n_shards: int) -> int:
    """Per-shard bloom segment size: the global ``bloom_bits`` budget is
    partitioned across shards (shard routing is deterministic on h, so each
    shard's segment only ever sees its own hashes — same FP math as one big
    bloom, 1/n_shards the storage per blob)."""
    return max(64, bloom_bits // n_shards)


def empty_shards(spark: SparkSession, n_shards: int, capacity: int, bloom_bits: int) -> DataFrame:
    seg = _seg_bits(bloom_bits, n_shards)
    rows = []
    for s in range(n_shards):
        rows.append((s, CuckooFilter(capacity).to_bytes(), Bloom(seg).to_bytes(), 0, 0))
    return spark.createDataFrame(rows, SEEN_SHARDS_SCHEMA)


def with_url_hash(df: DataFrame, n_shards: int, url_col: str = "url") -> DataFrame:
    """JVM-side hash + shard columns; whole-stage-codegen'd, no Python."""
    return df.withColumn("h", F.xxhash64(F.col(url_col))).withColumn(
        "shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int")
    )


class PartitionedBloom:
    """The broadcast tier-1 pre-pass: every shard's bloom segment,
    concatenated into one (n_shards × seg_words) matrix. Probe routes by the
    same pmod(h, n_shards) the shard shuffle uses, so one lookup touches one
    segment — identical FP math to a single global bloom of
    n_shards × seg_bits bits, but assembled from per-shard blobs with no OR
    pass and rebuilt incrementally per round."""

    def __init__(self, n_shards: int, seg_bits: int, matrix: np.ndarray | None = None):
        self.n_shards = n_shards
        self.seg_bits = seg_bits
        self.matrix = (
            matrix
            if matrix is not None
            else np.zeros((n_shards, seg_bits // 64), dtype=np.uint64)
        )

    @classmethod
    def from_shard_blobs(cls, blobs: list[tuple[int, bytes]], n_shards: int) -> "PartitionedBloom":
        first = Bloom.from_bytes(blobs[0][1])
        pb = cls(n_shards, first.m)
        for shard_id, blob in blobs:
            pb.matrix[shard_id] = Bloom.from_bytes(blob).words
        return pb

    def to_bytes(self) -> bytes:
        return struct.pack("<qq", self.n_shards, self.seg_bits) + self.matrix.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "PartitionedBloom":
        n_shards, seg_bits = struct.unpack_from("<qq", blob, 0)
        matrix = (
            np.frombuffer(blob, dtype=np.uint64, offset=16)
            .reshape(n_shards, seg_bits // 64)
            .copy()
        )
        return cls(n_shards, seg_bits, matrix)

    def contains_many(self, h: np.ndarray, shard: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        seg = Bloom(self.seg_bits)  # reuse its position math per row block
        pos = seg._positions(h.astype(np.uint64))  # (n, K) bit positions
        words = self.matrix[shard.astype(np.int64)[:, None],
                            (pos >> np.uint64(6)).astype(np.int64)]
        bits = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)


def global_bloom_bytes(shards_df: DataFrame, n_shards: int) -> bytes:
    """Driver-side assembly of the broadcast pre-pass filter. Reads only the
    (column-pruned) bloom segments — cuckoo blobs never reach the driver."""
    blobs = [
        (int(r["shard_id"]), bytes(r["bloom"]))
        for r in shards_df.select("shard_id", "bloom").collect()
    ]
    return PartitionedBloom.from_shard_blobs(blobs, n_shards).to_bytes()


# single-pass admission output: url verdict rows + updated shard blob rows
# share one schema (applyInPandas emits exactly one schema), discriminated
# by `kind`
_ADMIT_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # new | suspect | blob
        StructField("url", StringType(), True),
        StructField("h", LongType(), True),
        StructField("shard", IntegerType(), False),
        StructField("priority", DoubleType(), True),
        StructField("cuckoo", BinaryType(), True),
        StructField("bloom", BinaryType(), True),
        StructField("n_items", LongType(), True),
    ]
)


def probe_insert_cogroup(candidates: DataFrame, shards: DataFrame) -> DataFrame:
    """ONE cogrouped pass per round: probe every candidate against its
    shard's cuckoo filter, insert the new ones, and emit the updated blob —
    a single shuffle of (candidates ∪ shards) where the naive
    probe-then-insert design shuffles both twice and joins priorities back.

    Exactness invariants (why this is safe — see admit_new_urls):
      - cuckoo has no false negatives → 'new' rows are definitely unseen;
      - 'suspect' rows (cuckoo-positive) may be false positives → rescued
        downstream by the exact anti-join against the frontier;
      - bloom segments absorb ALL candidate hashes (new + suspect), so a
        rescued false positive is bloom-covered and routes through the
        suspect lane forever after (frontier ⊆ bloom at every round
        boundary).

    Determinism/idempotency (SURVEY.md §7.7.1): inserts sorted by (h, url);
    a replayed task rewrites byte-identical blobs.
    """

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        assert not right.empty, "seen_shards must be bootstrapped for every shard"
        row = right.iloc[0]
        shard_id = int(row["shard_id"])
        cf = CuckooFilter.from_bytes(bytes(row["cuckoo"]))
        bloom = Bloom.from_bytes(bytes(row["bloom"]))
        n_new = 0
        parts = []
        if not left.empty:
            # deterministic total order (h, url). Fast path: numpy argsort on
            # h alone — object-dtype string sorts cost ~10× more and the url
            # tiebreak only matters on xxhash64 collisions, so fall back to
            # the full sort only when adjacent duplicate hashes exist.
            h_raw = left["h"].to_numpy(dtype=np.int64)
            order = np.argsort(h_raw, kind="stable")
            h_sorted = h_raw[order]
            if len(h_sorted) > 1 and (h_sorted[1:] == h_sorted[:-1]).any():
                ordered = left.sort_values(["h", "url"], kind="mergesort")
            else:
                ordered = left.iloc[order]
            hs = ordered["h"].to_numpy(dtype=np.int64).view(np.uint64)
            # tier-1 shortcut: bloom-negative rows are definitely new — only
            # bloom-positive suspects pay the cuckoo probe. The shard's own
            # bloom segment answers this in-pass; an upstream broadcast
            # pre-pass (bloom_seen column) is honored when present.
            if "bloom_seen" in ordered.columns:
                maybe = ordered["bloom_seen"].to_numpy(dtype=bool)
            else:
                maybe = bloom.contains_many(hs)
            seen = np.zeros(len(ordered), dtype=bool)
            if maybe.any():
                seen[maybe] = cf.contains_many(hs[maybe])
            cf.insert_many(hs[~seen])
            n_new = int((~seen).sum())
            bloom.add_many(hs)  # all candidates: keeps frontier ⊆ bloom
            # columnar output — no per-element Python lists (5M+ rows/round
            # flow through here; object churn would dominate the round)
            verdicts = ordered[["url", "h", "priority"]].reset_index(drop=True)
            verdicts["h"] = verdicts["h"].astype("Int64")  # nullable — blob row has no h
            verdicts.insert(0, "kind", np.where(seen, "suspect", "new"))
            verdicts["shard"] = np.int32(shard_id)
            verdicts["cuckoo"] = None
            verdicts["bloom"] = None
            verdicts["n_items"] = pd.array([None] * len(verdicts), dtype="Int64")
            parts.append(verdicts)
        parts.append(
            pd.DataFrame(
                {
                    "kind": ["blob"],
                    "url": [None],
                    "h": pd.array([None], dtype="Int64"),
                    "priority": [np.nan],
                    "shard": [np.int32(shard_id)],
                    "cuckoo": [cf.to_bytes()],
                    "bloom": [bloom.to_bytes()],
                    "n_items": pd.array([int(row["n_items"]) + n_new], dtype="Int64"),
                }
            )
        )
        out = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        return out[["kind", "url", "h", "shard", "priority", "cuckoo", "bloom", "n_items"]]

    return (
        candidates.select(
            "url", "h", "shard", "priority",
            *(["bloom_seen"] if "bloom_seen" in candidates.columns else []),
        )
        .groupBy("shard")
        .cogroup(shards.groupBy("shard_id"))
        .applyInPandas(fn, _ADMIT_SCHEMA)
    )


def admit_new_urls(
    spark: SparkSession,
    candidates: DataFrame,  # columns: url (canonical), priority
    shards: DataFrame,
    frontier_urls: DataFrame,  # column: url (the exact seen set of record)
    n_shards: int,
    bloom_bits: int,
    round_id: int = 0,
    broadcast_bloom: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Full three-tier admission in one shuffle. Returns
    (admitted(url, h, shard, priority), new_shards). ``candidates`` must
    already be unique on url (caller pre-aggregates max(priority)).

    Tiers: (1) bloom pre-pass marks bloom-negative candidates
    definitely-new, skipping their cuckoo probes; (2) the cogrouped cuckoo
    probe+insert splits new/suspect and rewrites shard blobs; (3) suspects
    anti-join the frontier — survivors are cuckoo false positives, admitted
    (and bloom-covered, so they route as suspects forever after).

    Tier-1 placement: by default the probe uses the shard's own bloom
    segment *inside* the cogroup task — exact admission must shuffle every
    candidate to its shard anyway (every new URL inserts there), so a
    pre-shuffle bloom cannot reduce the shuffle, and in-blob probing avoids
    a second full Arrow round trip through Python. ``broadcast_bloom=True``
    instead assembles the PartitionedBloom driver-side and broadcasts it so
    the bloom_seen column is stamped executor-side before the shuffle
    (north_star's pre-pass shape) — useful when the verdict is wanted
    without admission (recrawl checks, metrics) or to pre-drop work from
    *approximate* consumers.

    At 10^10-URL scale the frontier side of the tier-3 anti-join is bucketed
    by the same pmod(xxhash64(url), n_shards) in Iceberg, making it a
    storage-partitioned join (no frontier shuffle); suspects are a tiny
    fraction (cuckoo FP ≈ 2·slots/2^16 ≈ 0.012%) so AQE broadcasts them.
    """
    cand = with_url_hash(candidates, n_shards)

    if broadcast_bloom:
        bc = spark.sparkContext.broadcast(global_bloom_bytes(shards, n_shards))

        @F.pandas_udf(BooleanType())
        def maybe_seen(h: pd.Series, shard: pd.Series) -> pd.Series:
            pb = PartitionedBloom.from_bytes(bc.value)
            return pd.Series(
                pb.contains_many(
                    h.to_numpy(dtype=np.int64).view(np.uint64),
                    shard.to_numpy(dtype=np.int64),
                )
            )

        cand = cand.withColumn("bloom_seen", maybe_seen(F.col("h"), F.col("shard")))

    out = probe_insert_cogroup(cand, shards).cache()
    new = out.where(F.col("kind") == "new")
    suspects = out.where(F.col("kind") == "suspect")
    # tier 3: exact — survivors of the anti-join are cuckoo false positives
    fp_survivors = suspects.join(frontier_urls.select("url"), on="url", how="left_anti")

    # cached: consumed by several downstream actions per round (count,
    # frontier write) — without a cache the chain would recompute each time
    admitted = (
        new.unionByName(fp_survivors)
        .select("url", "h", "shard", "priority")
        .cache()
    )
    new_shards = out.where(F.col("kind") == "blob").select(
        F.col("shard").alias("shard_id"),
        "cuckoo",
        "bloom",
        F.col("n_items").cast("long").alias("n_items"),
        F.lit(round_id).alias("round_id"),
    )
    return admitted, new_shards
