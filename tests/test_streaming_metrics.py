"""Event-time streaming tests: the watermarked windowed aggregate must equal
the batch plan on the same data, a too-late row must be DROPPED by the
watermark (while the batch plan counts it), and the applyInPandasWithState
politeness clock must exactly reproduce the batch
schedule_round → advance_host_state chain across micro-batches."""

import os
import time

import pytest
from pyspark.sql import functions as F

from crawld_spark.config import CrawlConfig
from crawld_spark.streaming.metrics_stream import (
    politeness_decisions_stateful,
    windowed_event_metrics,
)

EVT_SCHEMA = "ts timestamp, event_type string, value double"


def _write_events(spark, path: str, rows, mtime: float | None = None):
    df = spark.createDataFrame(
        [(r[0], r[1], float(r[2])) for r in rows],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.coalesce(1).write.mode("overwrite").parquet(path)
    if mtime is not None:
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (mtime, mtime))


def _drain(query):
    query.awaitTermination(120)


@pytest.mark.usefixtures("spark")
class TestWindowedMetrics:
    def test_stream_equals_batch(self, spark, tmp_path):
        src = str(tmp_path / "evsrc")
        rows = [
            ("2026-01-01 10:00:01", "fetch", 1.0),
            ("2026-01-01 10:07:30", "fetch", 2.0),
            ("2026-01-01 10:20:00", "parse", 3.0),
            ("2026-01-01 10:31:00", "fetch", 4.0),
        ]
        _write_events(spark, src, rows)
        stream = spark.readStream.schema(EVT_SCHEMA).parquet(src)
        q = (
            windowed_event_metrics(stream)
            .writeStream.format("memory")
            .queryName("wm_complete")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        got = {
            (str(r.window_start), r.event_type, r.n_events, round(r.sum_value, 6))
            for r in spark.sql("SELECT * FROM wm_complete").collect()
        }
        want = {
            (str(r.window_start), r.event_type, r.n_events, round(r.sum_value, 6))
            for r in windowed_event_metrics(spark.read.parquet(src)).collect()
        }
        assert got == want and len(got) == 3

    def test_watermark_drops_late_row(self, spark, tmp_path):
        """file1 advances the watermark to 10:10; file2 carries a 09:50 row
        whose window (09:45–10:00) closed below that watermark → dropped in
        streaming, present in batch.

        Requires statefulOperator.allowMultiple=false: under the Spark 3.4+
        default (true), late-record filtering moves to the upstream stateful
        operator's eviction to support chained stateful ops, and a single
        source-fed aggregation no longer drops late input at all (verified
        empirically: numRowsDroppedByWatermark stays 0 and the late window
        emits). See the metrics_stream module docstring."""
        spark.conf.set("spark.sql.streaming.statefulOperator.allowMultiple", "false")
        src = str(tmp_path / "evlate")
        os.makedirs(src, exist_ok=True)
        now = time.time()
        _write_events(
            spark, f"{src}/f1",
            [("2026-01-01 10:00:01", "fetch", 1.0),
             ("2026-01-01 10:20:00", "fetch", 1.0)],
            mtime=now - 60,
        )
        _write_events(
            spark, f"{src}/f2",
            [("2026-01-01 11:00:00", "fetch", 1.0),
             ("2026-01-01 09:50:00", "late", 99.0)],
            mtime=now,
        )
        stream = (
            spark.readStream.schema(EVT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            windowed_event_metrics(stream, watermark_delay="10 minutes")
            .writeStream.format("memory")
            .queryName("wm_late")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            _drain(q)
        finally:
            spark.conf.unset("spark.sql.streaming.statefulOperator.allowMultiple")
        emitted = spark.sql("SELECT * FROM wm_late").collect()
        types = {r.event_type for r in emitted}
        starts = {str(r.window_start) for r in emitted}
        # the late row's window never emits...
        assert "late" not in types
        assert "2026-01-01 09:45:00" not in starts
        # ...while closed in-time windows do (end < final watermark 10:50)
        assert "2026-01-01 10:00:00" in starts
        assert "2026-01-01 10:15:00" in starts
        # and the batch plan on the same files counts the late row
        batch = windowed_event_metrics(spark.read.parquet(f"{src}/*"))
        assert batch.where(F.col("event_type") == "late").count() == 1


@pytest.mark.usefixtures("spark")
class TestStatefulPoliteness:
    def test_matches_batch_round_chain(self, spark, tmp_path):
        """Two micro-batches (= rounds 1, 2) through the GroupState clock
        must emit exactly the decisions of the batch
        schedule_round → advance_host_state → schedule_round chain."""
        from crawld_spark.operators.politeness import (
            HOST_STATE_SCHEMA,
            advance_host_state,
            schedule_round,
        )

        cfg = CrawlConfig(
            round_duration_s=10.0, max_urls_per_host_per_round=3,
            default_crawl_delay_s=1.0, salt_buckets=2, shuffle_partitions=4,
        ).validate()
        robots = spark.createDataFrame(
            [("h1.com", ["/x"], 3.0)],
            "host string, disallow_prefixes array<string>, crawl_delay_s double",
        )
        r1 = [
            ("http://h1.com/a", "h1.com", 5.0, 1),
            ("http://h1.com/b", "h1.com", 4.0, 2),
            ("http://h1.com/x/secret", "h1.com", 9.0, 3),
            ("http://h1.com/c", "h1.com", 3.0, 4),
            ("http://h2.com/p", "h2.com", 2.0, 5),
            ("http://h2.com/q", "h2.com", 1.0, 6),
        ]
        r2 = [
            ("http://h1.com/d", "h1.com", 8.0, 7),
            ("http://h1.com/e", "h1.com", 7.0, 8),
            ("http://h2.com/r", "h2.com", 6.0, 9),
        ]
        pend_schema = "url string, host string, priority double, discovery_seq long"

        # ---- batch chain ----
        p1 = spark.createDataFrame(r1, pend_schema)
        p2 = spark.createDataFrame(r2, pend_schema)
        hs0 = spark.createDataFrame([], HOST_STATE_SCHEMA)
        no_err = spark.createDataFrame([], "host string, n_errors long")
        s1 = schedule_round(p1, hs0, robots, 1, cfg)
        hs1 = advance_host_state(hs0, robots, s1, no_err, 1, cfg)
        s2 = schedule_round(p2, hs1, robots, 2, cfg)

        def key(rows, rid):
            return sorted(
                (rid, r.url, r.decision,
                 None if r.sched_vt is None else round(r.sched_vt, 6),
                 r.seq_in_host)
                for r in rows
            )

        want = key(s1.collect(), 1) + key(s2.collect(), 2)

        # ---- streaming chain: one file per round, one round per batch ----
        src = str(tmp_path / "cand")
        os.makedirs(src, exist_ok=True)
        now = time.time()
        for rid, rows, age in ((1, r1, 60), (2, r2, 0)):
            df = spark.createDataFrame(rows, pend_schema).withColumn(
                "round_id", F.lit(rid)
            )
            df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{rid}")
            for f in os.listdir(f"{src}/f{rid}"):
                os.utime(os.path.join(f"{src}/f{rid}", f), (now - age, now - age))
        stream = (
            spark.readStream.schema(pend_schema + ", round_id int")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            politeness_decisions_stateful(stream, robots, cfg)
            .writeStream.format("memory")
            .queryName("polite_state")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "pckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        got = sorted(
            (r.round_id, r.url, r.decision,
             None if r.sched_vt is None else round(r.sched_vt, 6),
             r.seq_in_host)
            for r in spark.sql("SELECT * FROM polite_state").collect()
        )
        assert got == want


@pytest.mark.usefixtures("spark")
class TestStreamingExactDedup:
    """streaming_exact_dedup: keep-one per digest across micro-batches,
    batch parity on the digest set, and watermark EVICTION (the property
    that makes it runnable on an endless stream: a dup after the horizon
    re-emits, a dup inside it does not)."""

    DOC_SCHEMA = "ts timestamp, digest string, url string"

    def _write_docs(self, spark, path, rows, mtime=None):
        df = spark.createDataFrame(
            list(rows), "ts string, digest string, url string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df.coalesce(1).write.mode("overwrite").parquet(path)
        if mtime is not None:
            for f in os.listdir(path):
                os.utime(os.path.join(path, f), (mtime, mtime))

    def test_dedup_and_batch_parity(self, spark, tmp_path):
        from crawld_spark.streaming.metrics_stream import streaming_exact_dedup

        src = str(tmp_path / "docs1")
        rows = [
            ("2026-01-01 10:00:00", "dA", "u1"),
            ("2026-01-01 10:00:05", "dA", "u2"),
            ("2026-01-01 10:00:07", "dB", "u3"),
            ("2026-01-01 10:00:09", "dB", "u4"),
            ("2026-01-01 10:00:11", "dC", "u5"),
        ]
        self._write_docs(spark, src, rows)
        stream = spark.readStream.schema(self.DOC_SCHEMA).parquet(src)
        q = (
            streaming_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup1")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        got = spark.sql("SELECT digest FROM dedup1").collect()
        assert sorted(r.digest for r in got) == ["dA", "dB", "dC"]
        # batch twin: same digest set, one row each
        batch = streaming_exact_dedup(spark.read.parquet(src))
        assert sorted(r.digest for r in batch.select("digest").collect()) == [
            "dA", "dB", "dC",
        ]

    def test_watermark_bounds_state(self, spark, tmp_path):
        """Forced micro-batches: dup inside the horizon drops; after the
        watermark passes dA's expiry its state is EVICTED (end of the batch
        whose start-watermark exceeds the expiry), so a dA arriving in a
        later batch emits again — the bounded-state property."""
        from crawld_spark.streaming.metrics_stream import streaming_exact_dedup

        src = str(tmp_path / "docs2")
        os.makedirs(src, exist_ok=True)
        now = time.time()
        self._write_docs(
            spark, f"{src}/f1",
            [("2026-01-01 10:00:00", "dA", "u1"),
             ("2026-01-01 10:00:05", "dA", "u2")],
            mtime=now - 180,
        )
        # advances watermark to 11:00 - 10min = 10:50 > dA expiry 10:10
        self._write_docs(
            spark, f"{src}/f2",
            [("2026-01-01 11:00:00", "dB", "u3")],
            mtime=now - 120,
        )
        # eviction of dA happens at the END of this batch (start-wm 10:50)
        self._write_docs(
            spark, f"{src}/f3",
            [("2026-01-01 11:00:05", "dC", "u4")],
            mtime=now - 60,
        )
        self._write_docs(
            spark, f"{src}/f4",
            [("2026-01-01 11:00:10", "dA", "u6")],
            mtime=now,
        )
        stream = (
            spark.readStream.schema(self.DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            streaming_exact_dedup(stream, watermark_delay="10 minutes")
            .writeStream.format("memory")
            .queryName("dedup2")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        urls = sorted(r.url for r in spark.sql("SELECT url FROM dedup2").collect())
        # u2 (in-horizon dup) dropped; u6 (post-eviction dup) re-emits
        assert urls == ["u1", "u3", "u4", "u6"], urls


class TestStreamingSessions:
    """session_rollup under a real StreamingQuery: drain parity with the
    batch plan, and the cross-micro-batch session MERGE that distinguishes
    session windows from tumbling windows."""

    def test_stream_equals_batch(self, spark, tmp_path):
        from crawld_spark.operators.sessions import session_rollup

        src = str(tmp_path / "sessrc")
        rows = [
            ("2026-01-01 10:00:00", "u1", 0.0),
            ("2026-01-01 10:00:05", "u1", 0.0),
            ("2026-01-01 10:10:00", "u1", 0.0),  # > 60 s gap: new session
            ("2026-01-01 10:00:02", "u2", 0.0),
        ]
        _write_events(spark, src, rows)
        stream = spark.readStream.schema(EVT_SCHEMA).parquet(src)
        q = (
            session_rollup(stream, gap_s=60, user_col="event_type")
            .writeStream.format("memory")
            .queryName("sess_complete")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        key = lambda r: (r.event_type, r.start_us, r.end_us, r.n_events, r.duration_us)
        got = sorted(map(key, spark.sql("SELECT * FROM sess_complete").collect()))
        want = sorted(
            map(
                key,
                session_rollup(
                    spark.read.parquet(src), gap_s=60, user_col="event_type"
                ).collect(),
            )
        )
        assert got == want and len(got) == 3

    def test_sessions_merge_across_microbatches(self, spark, tmp_path):
        """Two micro-batches each carry half of ONE session (gap between
        the halves < 60 s): the stateful session window must merge them
        into a single 4-event session, not two."""
        from crawld_spark.operators.sessions import session_rollup

        src = str(tmp_path / "sessmerge")
        os.makedirs(src, exist_ok=True)
        now = time.time()
        _write_events(
            spark, f"{src}/f1",
            [("2026-01-01 10:00:00", "u1", 0.0),
             ("2026-01-01 10:00:30", "u1", 0.0)],
            mtime=now - 60,
        )
        _write_events(
            spark, f"{src}/f2",
            [("2026-01-01 10:01:00", "u1", 0.0),
             ("2026-01-01 10:01:20", "u1", 0.0)],
            mtime=now,
        )
        stream = (
            spark.readStream.schema(EVT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        q = (
            session_rollup(stream, gap_s=60, user_col="event_type")
            .writeStream.format("memory")
            .queryName("sess_merge")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        got = spark.sql("SELECT * FROM sess_merge").collect()
        assert len(got) == 1
        r = got[0]
        assert r.n_events == 4
        assert r.duration_us == 80 * 1_000_000
