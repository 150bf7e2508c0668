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


class TestWarcStream:
    """Streaming WARC ingest (sources/warc.read_warc_stream): an
    availableNow drain over a static directory must land exactly the
    batch reader's rows; a second drain from the same checkpoint is a
    no-op (exactly-once file tracking)."""

    def _write_warcs(self, tmp_path):
        import gzip

        import pandas as pd

        from crawld_spark.sources.warc import warc_bytes_of

        recs = [
            (f"http://h{i % 3}.com/p{i}",
             pd.Timestamp("2024-01-01T00:00:00Z") + pd.Timedelta(seconds=i),
             f"<html>doc {i}</html>".encode())
            for i in range(10)
        ]
        (tmp_path / "in").mkdir()
        (tmp_path / "in" / "a.warc").write_bytes(warc_bytes_of(recs[:6]))
        (tmp_path / "in" / "b.warc.gz").write_bytes(
            gzip.compress(warc_bytes_of(recs[6:]))
        )
        return recs

    def _drain(self, spark, tmp_path, name):
        from crawld_spark.sources.warc import read_warc_stream

        q = (
            read_warc_stream(spark, str(tmp_path / "in"))
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        return spark.sql(f"SELECT * FROM {name}").collect()

    def test_stream_equals_batch(self, spark, tmp_path):
        from crawld_spark.sources.warc import read_warc

        recs = self._write_warcs(tmp_path)
        got = self._drain(spark, tmp_path, "warc_drain1")
        want = read_warc(spark, str(tmp_path / "in")).collect()
        key = lambda r: (r.url, r.warc_ts, bytes(r.html))
        assert sorted(map(key, got)) == sorted(map(key, want))
        assert len(got) == len(recs)

    def test_second_drain_is_noop(self, spark, tmp_path):
        """Exactly-once file tracking: re-draining the same directory from
        the same checkpoint appends nothing (parquet sink — the memory
        sink can't recover from a checkpoint)."""
        from crawld_spark.sources.warc import read_warc_stream

        self._write_warcs(tmp_path)

        def drain():
            q = (
                read_warc_stream(spark, str(tmp_path / "in"))
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(120)
            finally:
                q.stop()
            return spark.read.parquet(str(tmp_path / "out")).count()

        assert drain() == 10
        assert drain() == 10  # second pass: no new files, no new rows


class TestNearDupStream:
    """Incremental MinHash-LSH near-dup (streaming/neardup_stream.py):
    any id-ordered micro-batch split must yield the batch neardup_mark
    verdicts exactly; replays are idempotent; the persisted index marks
    cross-batch duplicates."""

    def _docs(self, spark):
        # 30 docs; ids 100.. duplicate ids 0..9's text (cross-slice dups),
        # ids 200.. are unique
        base = [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(10)]
        dups = [(100 + i, t) for i, t in base]
        uniq = [(200 + i, f"zeta{i} eta{i} theta{i} iota{i}") for i in range(10)]
        return spark.createDataFrame(
            base + dups + uniq, "doc_id long, text string"
        )

    def _stream_split(self, spark, tmp_path, docs, splits):
        """Write id-ordered slices as parquet files with increasing mtimes
        so the file source consumes them oldest-first, one per batch."""
        import os
        import time as _time

        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "docs_in"
        d.mkdir()
        rows = sorted(docs.collect(), key=lambda r: r.doc_id)
        lo = 0
        t0 = _time.time() - 1000
        for i, n in enumerate(splits):
            part = rows[lo : lo + n]
            tbl = pa.table(
                {
                    "doc_id": pa.array([r.doc_id for r in part], pa.int64()),
                    "text": pa.array([r.text for r in part], pa.string()),
                }
            )
            f = str(d / f"slice{i}.parquet")
            pq.write_table(tbl, f)
            os.utime(f, (t0 + i, t0 + i))
            lo += n
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )

    def test_stream_equals_batch_any_split(self, spark, tmp_path):
        from crawld_spark.operators.dedup import neardup_mark
        from crawld_spark.streaming.neardup_stream import StreamingNearDup

        docs = self._docs(spark)
        want = {
            r.doc_id: r.is_dup for r in neardup_mark(docs).collect()
        }
        stream = self._stream_split(spark, tmp_path, docs, [7, 11, 12])
        snd = StreamingNearDup(spark, str(tmp_path / "wh"))
        snd.start(stream, str(tmp_path / "ckpt"), available_now=True)
        got = {r.doc_id: r.is_dup for r in snd.decisions().collect()}
        assert got == want
        # the duplicated texts (ids 100..109) must be flagged, originals not
        assert all(got[100 + i] for i in range(10))
        assert not any(got[i] for i in range(10))
        assert not any(got[200 + i] for i in range(10))

    def test_replay_is_idempotent(self, spark, tmp_path):
        from crawld_spark.streaming.neardup_stream import StreamingNearDup

        docs = self._docs(spark)
        b0 = docs.where("doc_id < 10")
        b1 = docs.where("doc_id >= 100 and doc_id < 110")
        snd = StreamingNearDup(spark, str(tmp_path / "wh"))
        snd._on_batch(b0, 0)
        snd._on_batch(b1, 1)
        first = sorted(
            (r.doc_id, r.is_dup, r.batch_id) for r in snd.decisions().collect()
        )
        # full replay of both batches (checkpoint lost): no change
        snd._on_batch(b0, 0)
        snd._on_batch(b1, 1)
        again = sorted(
            (r.doc_id, r.is_dup, r.batch_id) for r in snd.decisions().collect()
        )
        assert first == again

    def test_crash_between_appends_replays_correctly(self, spark, tmp_path):
        """Simulate the bands-written-but-no-decisions crash state for a
        batch: the replay must not count the batch's own bands as prior."""
        from pyspark.sql import functions as F

        from crawld_spark.streaming.neardup_stream import (
            StreamingNearDup,
            T_BUCKETS,
        )

        docs = self._docs(spark)
        b0 = docs.where("doc_id < 10")
        snd = StreamingNearDup(spark, str(tmp_path / "wh"))
        # crash state: bands of batch 0 landed, decisions did not
        bands = (
            snd._bands(b0).select("band_id", "band_key").distinct()
            .withColumn("src_batch", F.lit(0).cast("long"))
        )
        snd.cat.append(T_BUCKETS, bands)
        snd._on_batch(b0, 0)  # replay
        got = {r.doc_id: r.is_dup for r in snd.decisions().collect()}
        # none of batch 0's docs may be flagged against their own bands
        assert got == {i: False for i in range(10)}

    def test_mid_batch_kill_then_redrain(self, spark, tmp_path):
        """VERDICT r4 item 7: kill the QUERY between the bucket-index
        append and the decisions commit of a mid-stream batch, then
        re-drain from the same checkpoint — no duplicate and no lost
        verdicts, and the final table equals one-shot batch semantics."""
        from pyspark.sql import functions as F

        from crawld_spark.operators.dedup import neardup_mark
        from crawld_spark.streaming.neardup_stream import (
            StreamingNearDup,
            T_BUCKETS,
        )

        docs = self._docs(spark)
        want = {r.doc_id: r.is_dup for r in neardup_mark(docs).collect()}

        class KillAfterBands(StreamingNearDup):
            kill_bid = 1
            killed = False

            def _on_batch(self, batch_df, batch_id):
                bid = int(batch_id)
                if bid == self.kill_bid and not KillAfterBands.killed:
                    KillAfterBands.killed = True
                    # replicate the crash state the module docstring names:
                    # bands durable, decisions not, then die mid-batch
                    bands = (
                        self._bands(batch_df)
                        .select("band_id", "band_key").distinct()
                        .withColumn("src_batch", F.lit(bid).cast("long"))
                    )
                    self.cat.append(T_BUCKETS, bands)
                    raise RuntimeError("injected mid-batch kill")
                return super()._on_batch(batch_df, batch_id)

        stream = self._stream_split(spark, tmp_path, docs, [7, 11, 12])
        wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
        snd = KillAfterBands(spark, wh)
        try:
            snd.start(stream, ckpt, available_now=True)
            raise AssertionError("query should have died on batch 1")
        except Exception as e:  # StreamingQueryException wrapping the kill
            assert "injected mid-batch kill" in str(e)

        # re-drain from the SAME checkpoint with a fresh (healthy) instance
        stream2 = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "docs_in"))
        )
        snd2 = StreamingNearDup(spark, wh)
        snd2.start(stream2, ckpt, available_now=True)

        rows = snd2.decisions().collect()
        got = {r.doc_id: r.is_dup for r in rows}
        assert len(rows) == len(got) == len(want)  # no dup, no loss
        assert got == want
