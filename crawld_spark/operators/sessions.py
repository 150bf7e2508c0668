"""Gap-based sessionization over event streams.

The classic event-log operator a crawl/analytics stack runs over its
activity logs (here: per-user sessions on the events table; in the crawl
loop the same shape groups a HOST's fetch timeline into bursts for
politeness/abuse analysis). Two forms, cross-checked against each other:

- :func:`sessionize` — per-EVENT assignment: a new session starts when the
  gap to the user's previous event exceeds ``gap``; emits the session
  sequence number and within-session position for every event. Window
  partitioned by user — state is one user's events, never corpus-wide.
- :func:`session_rollup` — per-SESSION aggregate via Spark's native
  ``session_window`` (the same primitive Structured Streaming uses for
  watermarked session aggregation, so the streaming form is this exact
  code over readStream). Its merge-events-within-gap semantics equal the
  lag-based boundary rule; the lane oracle states the lag form in SQL and
  the native form must reproduce it — a cross-check of Spark's own
  operator against first principles.

Determinism: timestamps never leave as raw timestamps (module rule —
cross-engine timestamp rendering differs); everything is epoch
MICROSECONDS as int64 (`unix_micros` over an ltz-cast ≡ DuckDB `epoch_us`
on the naive value — the engine pins the session timezone to UTC), and the gap
comparison is an exact integer compare.

Scale: both forms shuffle once on the user key with (ts, small ints)
payloads; per-user state is bounded by that user's event count (and by the
watermark horizon in the streaming form). Skewed power users are the
AQE-skew case on the exchange, not a window explosion — the window is
per-user by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

US = 1_000_000


def sessionize(
    events: DataFrame,
    gap_s: int = 900,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event session assignment:
    ``(event_id, user_id, ts_us, session_seq, event_seq)`` where
    session_seq is the user's 0-based session number and event_seq the
    0-based position within it. A session breaks when the gap to the
    previous event exceeds ``gap_s`` seconds (strictly greater)."""
    e = events.select(
        F.col(id_col),
        F.col(user_col),
        F.unix_micros(F.col(ts_col).cast("timestamp_ltz")).alias("ts_us"),
    )
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    brk = (
        F.col("ts_us") - F.lag("ts_us").over(w) > F.lit(gap_s * US)
    ).cast("int")
    e = e.withColumn("_brk", F.coalesce(brk, F.lit(0)))
    e = e.withColumn(
        "session_seq",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    we = Window.partitionBy(user_col, "session_seq").orderBy("ts_us", id_col)
    return e.select(
        id_col,
        user_col,
        "ts_us",
        "session_seq",
        (F.row_number().over(we) - 1).cast("long").alias("event_seq"),
    )


def session_rollup(
    events: DataFrame,
    gap_s: int = 900,
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-session aggregate via the NATIVE ``session_window`` primitive:
    ``(user_id, start_us, end_us, n_events, duration_us)`` with start/end
    the first/last EVENT times (session_window's reported window end pads
    the last event by the gap — stripped here so the output states facts
    about events, not the gap parameter). On a streaming frame the same
    expression runs under a watermark — this is the streaming-session
    operator, exercised in batch (and under a real StreamingQuery in
    tests/test_streaming_metrics.py — including the session MERGE across
    micro-batches that distinguishes session windows from tumbling ones).
    On a stream the watermark bounds open-session state; on a batch frame
    it is a no-op."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark_delay)
    g = events.groupBy(
        F.col(user_col),
        F.session_window(F.col(ts_col), f"{int(gap_s)} seconds").alias("_w"),
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))).alias("start_us"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))).alias("end_us"),
    )
    return g.select(
        user_col,
        "start_us",
        "end_us",
        "n_events",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
    )
