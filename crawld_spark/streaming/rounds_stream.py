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
        r = last + 1
        if not eng.has_eligible(r):
            # recrawl mode: fast-forward the virtual clock to the next due
            # round, exactly like the batch driver (rounds.py run()) —
            # otherwise a streaming crawl with recrawl_after_rounds > 0 goes
            # permanently no-op once the frontier drains and silently stalls
            # every future recrawl
            nxt = eng.next_recrawl_round()
            if nxt is None or nxt <= r or not eng.has_eligible(nxt):
                return  # genuinely drained: ticks become no-ops
            r = nxt
        self.round_stats.append(eng.run_round(r))

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
            # REAL Structured-Streaming drain: a file source of single-row
            # tick files, maxFilesPerTrigger=1 → one micro-batch per round,
            # trigger(availableNow=True) → the query terminates once the
            # queued ticks are consumed. Ticks are queued in waves (we don't
            # know the round count up front); a wave that runs zero rounds
            # means the frontier is drained. The streaming checkpoint
            # remembers consumed tick files across waves and restarts, while
            # the engine's commit log remains the durable round truth.
            ticks_dir = f"{self.cfg.warehouse}/_stream_ticks"
            ckpt = f"{self.cfg.warehouse}/_stream_checkpoint"
            next_tick = 0
            done_rounds = 0
            while done_rounds < max_rounds:
                # each batch runs at most one round, so a wave of k ticks
                # advances ≤ k rounds; if the source coalesces files into
                # fewer batches the next wave simply tops the ticks up —
                # progress is measured in ROUNDS RUN, not ticks written
                wave = min(16, max_rounds - done_rounds)
                before = len(self.round_stats)
                (
                    self.spark.range(next_tick, next_tick + wave)
                    .repartition(wave)  # one file per tick → one batch per round
                    .write.mode("append")
                    .parquet(ticks_dir)
                )
                next_tick += wave
                q = (
                    self.spark.readStream.schema("id long")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(ticks_dir)
                    .writeStream.foreachBatch(self._on_tick)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()
                ran = len(self.round_stats) - before
                done_rounds += ran
                if ran == 0:
                    break  # the whole wave no-opped: drained
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
