"""Seen-set tests: cuckoo/bloom primitives (pure numpy) + the three-tier
admission on Spark. Golden contract: seen-set contents equal a Python set
(SURVEY.md §7.3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawld_spark.operators.seen import (
    Bloom,
    CuckooFilter,
    admit_new_urls,
    empty_shards,
    with_url_hash,
)


class TestCuckoo:
    def test_insert_contains_no_false_negatives(self):
        cf = CuckooFilter(1 << 12)
        rng = np.random.Generator(np.random.PCG64(7))
        hs = rng.integers(0, 2**63, size=3000, dtype=np.int64).view(np.uint64)
        for h in hs:
            cf.insert(int(h))
        assert cf.contains_many(hs).all()

    def test_absent_mostly_negative(self):
        cf = CuckooFilter(1 << 12)
        rng = np.random.Generator(np.random.PCG64(8))
        present = rng.integers(0, 2**62, size=2000, dtype=np.int64).view(np.uint64)
        absent = (rng.integers(0, 2**62, size=2000, dtype=np.int64) + 2**62).view(np.uint64)
        for h in present:
            cf.insert(int(h))
        fp_rate = cf.contains_many(absent).mean()
        assert fp_rate < 0.01, fp_rate

    def test_overflow_spill_exact(self):
        cf = CuckooFilter(8)  # tiny: force overflow
        hs = np.arange(1, 400, dtype=np.uint64) * np.uint64(2654435761)
        for h in hs:
            cf.insert(int(h))
        assert cf.contains_many(hs).all()  # spill keeps exactness

    def test_serialization_roundtrip_deterministic(self):
        cf = CuckooFilter(1 << 10)
        for h in range(1, 500):
            cf.insert(h * 1_000_003)
        b1 = cf.to_bytes()
        cf2 = CuckooFilter.from_bytes(b1)
        assert cf2.to_bytes() == b1
        assert cf2.contains_many(
            (np.arange(1, 500, dtype=np.uint64) * np.uint64(1_000_003))
        ).all()

    def test_idempotent_rebuild(self):
        """Same sorted inserts → byte-identical blob (task-retry safety,
        SURVEY.md §7.7.1)."""
        hs = sorted((h * 2654435761) % (2**64) for h in range(1, 1000))
        blobs = []
        for _ in range(2):
            cf = CuckooFilter(1 << 10)
            for h in hs:
                cf.insert(h)
            blobs.append(cf.to_bytes())
        assert blobs[0] == blobs[1]


class TestBloom:
    def test_membership(self):
        b = Bloom(1 << 16)
        hs = np.arange(1, 2000, dtype=np.uint64) * np.uint64(0x9E3779B9)
        b.add_many(hs)
        assert b.contains_many(hs).all()
        absent = hs + np.uint64(1)
        assert b.contains_many(absent).mean() < 0.05

    def test_union(self):
        b1, b2 = Bloom(1 << 10), Bloom(1 << 10)
        b1.add_many(np.array([11, 22], dtype=np.uint64))
        b2.add_many(np.array([33], dtype=np.uint64))
        b1.union_bytes(b2.to_bytes())
        assert b1.contains_many(np.array([11, 22, 33], dtype=np.uint64)).all()


@pytest.mark.usefixtures("spark")
class TestAdmission:
    def test_three_tier_exactness(self, spark):
        n_shards, bloom_bits = 4, 1 << 14
        shards = empty_shards(spark, n_shards, 1 << 10, bloom_bits)
        urls1 = [f"http://h{i%5}.com/p/{i}" for i in range(300)]
        cand1 = spark.createDataFrame([(u, 1.0) for u in urls1], "url string, priority double")
        empty_frontier = spark.createDataFrame([], "url string")

        adm1, dirty1, caches1 = admit_new_urls(
            spark, cand1, shards, empty_frontier, n_shards, round_id=0
        )
        adm1 = adm1.cache()
        assert sorted(r.url for r in adm1.select("url").collect()) == sorted(urls1)
        # merge dirty blobs over the base (what Catalog.upsert does per round)
        shards1 = dirty1.unionByName(
            shards.join(dirty1.select("shard_id"), on="shard_id", how="left_anti")
        ).cache()
        assert shards1.count() == n_shards
        assert shards1.agg(F.sum("n_items")).collect()[0][0] == 300

        # second wave: 150 dups + 100 new → exactly the new ones admitted
        urls2 = urls1[:150] + [f"http://h9.com/q/{i}" for i in range(100)]
        cand2 = spark.createDataFrame([(u, 2.0) for u in urls2], "url string, priority double")
        frontier_urls = spark.createDataFrame([(u,) for u in urls1], "url string")
        adm2, dirty2, caches2 = admit_new_urls(
            spark, cand2, shards1, frontier_urls, n_shards, round_id=1
        )
        got = sorted(r.url for r in adm2.select("url").collect())
        assert got == sorted(f"http://h9.com/q/{i}" for i in range(100))
        shards2 = dirty2.unionByName(
            shards1.join(dirty2.select("shard_id"), on="shard_id", how="left_anti")
        )
        assert shards2.agg(F.sum("n_items")).collect()[0][0] == 400
        # wave 2 had new urls on one host only → not every shard is dirty
        assert dirty2.count() <= n_shards
        for df in (adm1, adm2, *caches1, *caches2):
            df.unpersist()

    def test_hash_routing_jvm_side(self, spark):
        df = spark.createDataFrame([("http://a/",), ("http://b/",)], "url string")
        out = with_url_hash(df, 8).collect()
        assert all(0 <= r.shard < 8 for r in out)
        # stable across evaluations
        out2 = with_url_hash(df, 8).collect()
        assert {r.url: r.h for r in out} == {r.url: r.h for r in out2}


class TestInsertMany:
    def test_membership_equivalent_to_per_item(self):
        rng = np.random.Generator(np.random.PCG64(11))
        hs = np.unique(rng.integers(1, 2**63, size=5000, dtype=np.int64).view(np.uint64))
        a, b = CuckooFilter(1 << 13), CuckooFilter(1 << 13)
        a.insert_many(hs)
        for h in hs:
            b.insert(int(h))
        assert a.contains_many(hs).all()
        assert a.n_items == b.n_items == len(hs)
        absent = hs + np.uint64(2**63)
        assert a.contains_many(absent).mean() < 0.01

    def test_deterministic(self):
        hs = np.sort((np.arange(1, 3000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
        blobs = []
        for _ in range(2):
            cf = CuckooFilter(1 << 11)
            cf.insert_many(hs)
            blobs.append(cf.to_bytes())
        assert blobs[0] == blobs[1]

    def test_overflow_fallback_exact(self):
        cf = CuckooFilter(8)
        hs = np.arange(1, 500, dtype=np.uint64) * np.uint64(2654435761)
        cf.insert_many(hs)
        assert cf.contains_many(hs).all()
        assert cf.n_items == len(hs)


@pytest.mark.usefixtures("spark")
class TestBloomPrepassModes:
    def test_broadcast_and_inblob_agree(self, spark):
        n_shards, bloom_bits = 4, 1 << 14
        urls1 = [f"http://h{i%3}.com/p/{i}" for i in range(200)]
        urls2 = urls1[:120] + [f"http://h7.com/q/{i}" for i in range(80)]
        frontier1 = spark.createDataFrame([(u,) for u in urls1], "url string")
        ef = spark.createDataFrame([], "url string")

        results = []
        for bb in (False, True):
            shards = empty_shards(spark, n_shards, 1 << 10, bloom_bits)
            c1 = spark.createDataFrame([(u, 1.0) for u in urls1], "url string, priority double")
            a1, d1, k1 = admit_new_urls(spark, c1, shards, ef, n_shards, 0,
                                        broadcast_bloom=bb)
            a1.count()
            s1 = d1.unionByName(
                shards.join(d1.select("shard_id"), on="shard_id", how="left_anti")
            ).cache()
            c2 = spark.createDataFrame([(u, 2.0) for u in urls2], "url string, priority double")
            a2, d2, k2 = admit_new_urls(spark, c2, s1, frontier1, n_shards, 1,
                                        broadcast_bloom=bb)
            s2 = d2.unionByName(
                s1.join(d2.select("shard_id"), on="shard_id", how="left_anti")
            )
            results.append(
                (sorted(r.url for r in a2.select("url").collect()),
                 s2.agg(F.sum("n_items")).collect()[0][0])
            )
            for df in (a1, a2, s1, *k1, *k2):
                df.unpersist()
        assert results[0] == results[1]
        assert results[0][0] == sorted(f"http://h7.com/q/{i}" for i in range(80))
