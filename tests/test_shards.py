"""Rendezvous (HRW) host→fetcher-shard assignment (operators/shards).

Pins three properties the docstring promises: (1) the JVM argmax equals a
straight Python HRW reimplementation host-for-host, (2) resizing S→S+1
moves only hosts whose winner changes (empirically near 1/(S+1), and every
unmoved host keeps its shard), (3) the assignment is a projection — the
plan contains no shuffle exchange before the caller's own aggregation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crawld_spark.operators.shards import (
    assign_shards,
    rendezvous_shard,
    shard_resize_stats,
)


def _py_hrw(host: str, n_shards: int) -> int:
    best = max(
        range(n_shards),
        key=lambda s: (hashlib.md5(f"{host}#{s}".encode()).hexdigest(), s),
    )
    return best


def _hosts(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example.com")).alias(
            "host"
        )
    )


class TestRendezvous:
    def test_matches_python_reimplementation(self, spark):
        rows = assign_shards(_hosts(spark), n_shards=8).collect()
        assert len(rows) == 200
        for r in rows:
            assert r.shard == _py_hrw(r.host, 8), r.host

    def test_range_and_determinism(self, spark):
        a = {r.host: r.shard for r in assign_shards(_hosts(spark), 5).collect()}
        b = {r.host: r.shard for r in assign_shards(_hosts(spark), 5).collect()}
        assert a == b
        assert set(a.values()) <= set(range(5))
        # every shard gets SOME hosts at 200 hosts / 5 shards
        assert len(set(a.values())) == 5

    def test_resize_moves_only_new_winners(self, spark):
        h = _hosts(spark, 300)
        both = h.select(
            "host",
            rendezvous_shard(F.col("host"), 8).alias("s8"),
            rendezvous_shard(F.col("host"), 9).alias("s9"),
        ).collect()
        moved = [r for r in both if r.s8 != r.s9]
        # HRW: a host moves iff shard 8's weight beats its old winner —
        # every mover lands on the NEW shard, never reshuffles among old
        for r in moved:
            assert r.s9 == 8, (r.host, r.s8, r.s9)
        # expected 1/9 of 300 ≈ 33; allow a generous band
        assert 10 <= len(moved) <= 70, len(moved)

    def test_resize_stats_consistency(self, spark):
        h = _hosts(spark, 300).withColumn("w", F.lit(3).cast("long"))
        stats = shard_resize_stats(h, 8, 9, weight_col="w").collect()
        assert sum(r.n_hosts for r in stats) == 300
        assert sum(r.n_pages for r in stats) == 900
        direct = h.select(
            rendezvous_shard(F.col("host"), 8).alias("s8"),
            rendezvous_shard(F.col("host"), 9).alias("s9"),
        ).collect()
        assert sum(r.n_moved for r in stats) == sum(
            1 for r in direct if r.s8 != r.s9
        )

    def test_assignment_plan_is_shuffle_free(self, spark):
        plan = assign_shards(_hosts(spark), 8)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan

    def test_bad_n_shards(self, spark):
        import pytest

        with pytest.raises(ValueError):
            rendezvous_shard(F.lit("h"), 0)
