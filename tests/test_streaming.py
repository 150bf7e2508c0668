"""Structured-Streaming surface tests: micro-batch rounds must land in
exactly the state the batch driver produces (same commit log, same tables),
and the live rate-source query must commit rounds and stop cleanly."""

import time

import pytest
from pyspark.sql import functions as F

from crawld_spark.config import CrawlConfig
from crawld_spark.plans.rounds import CrawlEngine
from crawld_spark.sources.synth_web import (
    generate_pages,
    generate_robots,
    generate_seeds,
)
from crawld_spark.streaming import StreamingCrawl


def _cfg(wh: str) -> CrawlConfig:
    return CrawlConfig(
        warehouse=wh,
        round_duration_s=20.0,
        max_urls_per_host_per_round=16,
        n_seen_shards=4,
        bloom_bits=1 << 14,
        shuffle_partitions=8,
        salt_buckets=4,
        fetch_interval="100ms",
    )


def _inputs(spark):
    pages = generate_pages(spark, 200, 8, 42, fanout=3, partitions=4).cache()
    robots = generate_robots(spark, 8, 42)
    seeds = generate_seeds(spark, 200, 8, n_seeds=5, seed=42)
    return pages, robots, seeds


def _state(engine: CrawlEngine):
    frontier = sorted(
        (r.url, r.status, r.discovery_seq, r.round_added)
        for r in engine.cat.read("frontier").collect()
    )
    fetched = sorted(
        (r.url, r.round_id) for r in engine.cat.read("fetched").collect()
    )
    return frontier, fetched, engine.cat.last_committed_round()


@pytest.mark.usefixtures("spark")
class TestStreamingRounds:
    def test_drain_equals_batch(self, spark, tmp_path):
        pages, robots, seeds = _inputs(spark)

        batch = CrawlEngine(spark, _cfg(str(tmp_path / "batch")), pages, robots)
        batch.run(seeds, max_rounds=6)

        stream = StreamingCrawl(spark, _cfg(str(tmp_path / "stream")), pages, robots)
        stream.start(seeds, max_rounds=6, available_now=True)

        assert _state(batch) == _state(stream.engine)
        assert len(stream.round_stats) >= 1

    def test_live_rate_source_commits_rounds(self, spark, tmp_path):
        pages, robots, seeds = _inputs(spark)
        sc = StreamingCrawl(spark, _cfg(str(tmp_path / "live")), pages, robots)
        query = sc.start(seeds, available_now=False)
        try:
            deadline = time.time() + 120
            while time.time() < deadline and sc.engine.cat.last_committed_round() < 2:
                time.sleep(1.0)
        finally:
            query.stop()
        assert sc.engine.cat.last_committed_round() >= 2
        # committed rounds have fetched rows
        assert sc.engine.cat.read("fetched").count() > 0

    def test_streaming_recrawl_fast_forwards(self, spark, tmp_path):
        """With recrawl_after_rounds > 0, a drained frontier must NOT stall
        the streaming crawl: ticks fast-forward the virtual clock to the
        next due round like the batch driver does (ADVICE r1)."""
        pages = generate_pages(spark, 40, 4, seed=9, fanout=0, partitions=2).cache()
        seeds = generate_seeds(spark, 40, 4, n_seeds=4, seed=9)
        cfg = CrawlConfig(
            warehouse=str(tmp_path / "rc"),
            round_duration_s=1e9,
            default_crawl_delay_s=0.0,
            max_urls_per_host_per_round=100,
            n_seen_shards=4,
            bloom_bits=1 << 14,
            shuffle_partitions=8,
            salt_buckets=2,
            recrawl_after_rounds=2,
        )
        sc = StreamingCrawl(spark, cfg, pages, generate_robots(spark, 4, 9, 0.0))
        sc.start(seeds, max_rounds=3, available_now=True)
        # fanout=0: rounds continue ONLY via recrawl — round 1 clones, the
        # next ticks fast-forward to rounds 3 and 5 (k=2) and update
        rounds = sorted(st["round_id"] for st in sc.round_stats)
        assert rounds == [1, 3, 5]
        kinds = {(r.round_id, r.fetch_kind)
                 for r in sc.engine.cat.read("fetched").collect()}
        assert (1, "clone") in kinds and (3, "update") in kinds

    def test_streaming_resume_is_noop_safe(self, spark, tmp_path):
        """A second drain over a finished warehouse must not add rounds
        (idempotent ticks — exactly-once round commits)."""
        pages, robots, seeds = _inputs(spark)
        cfg = _cfg(str(tmp_path / "resume"))
        s1 = StreamingCrawl(spark, cfg, pages, robots)
        s1.start(seeds, max_rounds=50, available_now=True)
        last = s1.engine.cat.last_committed_round()
        pending = (
            s1.engine.cat.read("frontier").where(F.col("status") == "pending").count()
        )
        assert pending == 0  # drained

        s2 = StreamingCrawl(spark, cfg, pages, robots)
        s2.start(None, max_rounds=10, available_now=True)
        assert s2.engine.cat.last_committed_round() == last
        assert len(s2.round_stats) == 0
