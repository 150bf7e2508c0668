"""Incremental MinHash-LSH near-dup over a document stream.

The streaming complement of dedup.neardup_mark: micro-batches of documents
arrive (a live crawl's extraction output), each batch is marked against the
PERSISTED LSH bucket index plus its own batch-local band mins, verdicts are
appended to a decisions table, and the batch's bands are appended to the
index — so the index only ever grows by O(batch), never rewrites
(Catalog.append is O(delta), sources/tables.py).

Equivalence contract (pinned by tests/test_streaming.py::TestNearDupStream):
for ANY split of an id-ordered corpus into ordered micro-batches, the
decisions table equals the one-shot batch ``neardup_mark`` — because the
per-band MIN-id rule makes a verdict depend only on lower-id documents,
which are by construction in the same or an earlier batch. (Transitive
group closure — dedup_clusters — is NOT prefix-stable and cannot stream;
this rule is the streaming-safe fragment, the same split the crawl engine
makes between the in-round seen probe and warehouse-wide dedup.)

Exactly-once: the streaming checkpoint deduplicates input micro-batches,
and ``_on_batch`` is replay-idempotent on its own: bucket rows carry the
``batch_id`` that wrote them and the index probe filters
``batch_id < current``, so a replayed batch never sees its own bands;
bands are appended BEFORE decisions, so the only replayable crash states
are (no writes) and (bands written, decisions not) — both recompute the
identical verdicts, and duplicate band rows from a re-append are
harmless (the probe distinct-dedups). A batch whose decisions are already
durable is skipped outright. Mirrors StreamingCrawl's commit-log
discipline.

Scale shape per batch: signature computation is batch-local projections;
the index probe is an equi-join on (band_id, band_key) against a
bucket-keyed table (partition-prunable at 100 TB); only band digests and
ids shuffle. State lives in the table, not executor memory — unbounded
corpus, bounded executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from crawld_spark.operators.dedup import minhash_lsh_buckets, neardup_mark
from crawld_spark.sources.tables import Catalog

T_BUCKETS = "lsh_buckets"
T_DECISIONS = "neardup_decisions"


class StreamingNearDup:
    """foreachBatch driver: attach to a streaming docs frame with
    ``start()``; read verdicts from the ``neardup_decisions`` table."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        n_hashes: int = 4,
        band_size: int = 2,
        shingle_k: int = 2,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.cat = Catalog(spark, warehouse)
        self.n_hashes = n_hashes
        self.band_size = band_size
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def _decided(self, batch_id: int) -> bool:
        if not self.cat.exists(T_DECISIONS):
            return False
        return (
            self.cat.read(T_DECISIONS)
            .where(F.col("batch_id") == int(batch_id))
            .limit(1)
            .count()
            > 0
        )

    def _bands(self, docs: DataFrame) -> DataFrame:
        return minhash_lsh_buckets(
            docs,
            self.n_hashes,
            self.band_size,
            self.shingle_k,
            self.id_col,
            self.text_col,
        )

    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if self._decided(bid):
            return  # fully durable already (bands land before decisions)
        prior = None
        if self.cat.exists(T_BUCKETS):
            # strictly-earlier batches only: a replayed batch that already
            # appended its own bands must not probe against itself
            prior = self.cat.read(T_BUCKETS).where(F.col("src_batch") < bid)
        marks = neardup_mark(
            batch_df,
            self.n_hashes,
            self.band_size,
            self.shingle_k,
            self.id_col,
            self.text_col,
            prior_buckets=prior,
        ).withColumn("batch_id", F.lit(bid).cast("long"))
        bands = (
            self._bands(batch_df)
            .select("band_id", "band_key")
            .distinct()
            .withColumn("src_batch", F.lit(bid).cast("long"))
        )
        self.cat.append(T_BUCKETS, bands)
        self.cat.append(T_DECISIONS, marks)

    def start(self, docs_stream: DataFrame, checkpoint: str, available_now: bool = True):
        """Attach and start; with ``available_now`` the query drains the
        source and stops (bounded, for tests); otherwise runs live until
        ``query.stop()``."""
        w = docs_stream.writeStream.foreachBatch(self._on_batch).option(
            "checkpointLocation", checkpoint
        )
        if available_now:
            q = w.trigger(availableNow=True).start()
            q.awaitTermination()
            return q
        return w.start()

    def decisions(self) -> DataFrame:
        return self.cat.read(T_DECISIONS).select(self.id_col, "is_dup", "batch_id")
