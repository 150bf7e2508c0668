"""Event-time streaming operators: watermarked windowed aggregation and a
custom stateful politeness scheduler.

The round driver (rounds_stream.py) embeds the crawl loop in Structured
Streaming at round granularity; this module covers the two remaining
streaming shapes a crawl/metrics pipeline needs:

- ``windowed_event_metrics`` — tumbling event-time windows with a watermark
  for late data (the fetch-event firehose → per-window per-type counters).
  The reference has no streaming surface at all (crawld aggregates by
  polling SQL counts between passes — /root/reference/crawld.go:109-249);
  this is the Spark-native equivalent of those per-pass counters, continuous
  and late-data-safe. The SAME function body serves batch DataFrames, which
  is what the ``events_windowed_agg`` oracle entry checks against DuckDB's
  ``time_bucket``.

- ``politeness_decisions_stateful`` — the per-host crawl-delay clock as an
  ``applyInPandasWithState`` operator: host → GroupState(next_allowed_vt).
  Semantically the streaming twin of the batch pair
  ``schedule_round → advance_host_state`` (operators/politeness.py): a
  micro-batch carrying round r's pending rows produces the identical fetch
  list and leaves the identical per-host clock behind (asserted by
  tests/test_streaming_metrics.py against the batch chain). Error/throttle
  lanes stay in the batch advance (fetch outcomes are not known at
  scheduling time); the state here is the pure politeness clock.

Scale: both operators shuffle once on their grouping key (window+type /
host). State size is O(#hosts) × 8 bytes — millions of hosts fit one
executor's state store; RocksDB state store handles more. The windowed agg
is JVM-only (no Python); the stateful scheduler moves only one round's
budget-bounded rows through Arrow.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawld_spark.config import CrawlConfig
from crawld_spark.operators.politeness import path_of


def windowed_event_metrics(
    events: DataFrame,  # ts timestamp, event_type string, value double
    window_duration: str = "15 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time windows × key → (n_events, sum_value).

    On a streaming DataFrame the watermark bounds state: a row later than
    ``watermark_delay`` behind the max event time seen is dropped and its
    window's state can be evicted — the standard late-data contract. On a
    batch DataFrame the watermark is a no-op and the result is the plain
    windowed aggregate (the DuckDB ``time_bucket`` oracle twin).

    Spark ≥3.4 caveat (verified on 4.1): under the default
    ``spark.sql.streaming.statefulOperator.allowMultiple=true``, late-input
    filtering moves to the upstream stateful operator's eviction (to support
    chained stateful ops), so a SINGLE aggregation fed directly from a
    source never drops late rows — ``numRowsDroppedByWatermark`` stays 0 and
    a too-late row resurrects its closed window. Pipelines that rely on the
    strict drop must set that conf to ``false``
    (tests/test_streaming_metrics.py asserts both the drop under ``false``
    and batch parity).
    """
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark_delay)
    w = F.window(F.col(ts_col), window_duration)
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


# ---------- stateful politeness scheduler ----------

SCHED_OUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("priority", DoubleType()),
        StructField("discovery_seq", LongType()),
        StructField("round_id", IntegerType()),
        StructField("decision", StringType()),
        StructField("sched_vt", DoubleType()),
        StructField("seq_in_host", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("next_allowed_vt", DoubleType())])


def _schedule_host_stateful(cfg: CrawlConfig):
    """Build the per-host state function. Mirrors the batch greedy clock
    (politeness._schedule_host) + the clock-advance rule
    (politeness.advance_host_state: n_sched>0 → last_vt + delay, else
    max(next_allowed, t_start)), with next_allowed_vt carried in GroupState
    across micro-batches instead of in the host_state table."""

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        (next_allowed,) = state.get if state.exists else (0.0,)
        rows = pd.concat(list(pdfs), ignore_index=True)
        budget = cfg.max_urls_per_host_per_round
        out: list[dict[str, Any]] = []
        # a micro-batch normally carries ONE round; process in round order
        # so a multi-round batch (replay/drain) still advances the clock
        # deterministically
        for rid, grp in rows.groupby("round_id", sort=True):
            t_start = int(rid) * cfg.round_duration_s
            t_end = t_start + cfg.round_duration_s
            delay = float(grp["crawl_delay_s"].iloc[0])
            prefixes = grp["disallow_prefixes"].iloc[0]
            prefixes = list(prefixes) if prefixes is not None else []
            denied = grp["url"].map(
                lambda u: any(path_of(u).startswith(p) for p in prefixes)
            )
            for u, pri, seq in zip(
                grp.loc[denied, "url"], grp.loc[denied, "priority"],
                grp.loc[denied, "discovery_seq"],
            ):
                out.append(dict(url=u, host=host, priority=float(pri),
                                discovery_seq=int(seq), round_id=int(rid),
                                decision="denied", sched_vt=None, seq_in_host=None))
            fetchable = grp[~denied].sort_values(
                ["priority", "discovery_seq"], ascending=[False, True],
                kind="mergesort",
            )
            t = max(next_allowed, t_start)
            k = 0
            n_sched, last_vt = 0, None
            for u, pri, seq in zip(
                fetchable["url"], fetchable["priority"], fetchable["discovery_seq"]
            ):
                if t >= t_end or k >= budget:
                    break  # stays pending — no row emitted, like the batch plan
                out.append(dict(url=u, host=host, priority=float(pri),
                                discovery_seq=int(seq), round_id=int(rid),
                                decision="fetch", sched_vt=t, seq_in_host=k))
                n_sched, last_vt = n_sched + 1, t
                t += max(delay, 1e-9)
                k += 1
            # clock-advance rule ≙ advance_host_state
            next_allowed = (
                last_vt + delay if n_sched > 0 else max(next_allowed, t_start)
            )
        state.update((float(next_allowed),))
        yield pd.DataFrame(out, columns=[f.name for f in SCHED_OUT_SCHEMA.fields])

    return fn


def politeness_decisions_stateful(
    candidates: DataFrame,  # url, host, priority, discovery_seq, round_id
    robots: DataFrame,  # host, disallow_prefixes, crawl_delay_s (static side)
    cfg: CrawlConfig,
) -> DataFrame:
    """Streaming politeness: enrich the candidate stream with the static
    robots table (stream-static broadcast join), then run the per-host
    stateful clock. Works on batch DataFrames too (same plan, transient
    state) — used by the parity test."""
    enriched = (
        candidates.join(F.broadcast(robots), on="host", how="left")
        .withColumn(
            "crawl_delay_s",
            F.coalesce("crawl_delay_s", F.lit(cfg.default_crawl_delay_s)),
        )
        .select(
            "url", "host", "priority", "discovery_seq", "round_id",
            "crawl_delay_s", "disallow_prefixes",
        )
    )
    return enriched.groupBy("host").applyInPandasWithState(
        _schedule_host_stateful(cfg),
        outputStructType=SCHED_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------- streaming exact content dedup ----------

def streaming_exact_dedup(
    docs: DataFrame,
    digest_col: str = "digest",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact content dedup: the first document carrying a given
    digest is emitted, duplicates arriving within the watermark horizon are
    dropped.

    On a stream this is ``dropDuplicatesWithinWatermark`` — state is one
    entry per distinct digest, EVICTED once the event-time watermark passes
    its expiry. A plain streaming ``dropDuplicates`` never evicts, which
    cannot run on an endless crawl firehose; the horizon trade (a duplicate
    that re-surfaces after eviction re-emits) is closed by the corpus-wide
    BATCH passes downstream (``exact_dedup`` / ``paragraph_dedup``) — the
    standard streaming-prefilter + batch-sweep curation split, and exactly
    the crawl engine's own split between the in-round seen probe and the
    warehouse-wide frontier dedup.

    Scale: one shuffle keyed by the 16-byte digest; the payload travels
    once; state is digest + timestamp per UNIQUE doc inside the horizon
    (bounded by ingest rate × horizon, not corpus size). On a batch frame:
    plain ``dropDuplicates`` (same keep-one contract, corpus-wide).
    """
    if docs.isStreaming:
        return docs.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            [digest_col]
        )
    return docs.dropDuplicates([digest_col])
