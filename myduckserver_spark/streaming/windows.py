"""Event-time streaming aggregations (Spark-native extension surface).

The reference has no watermarks/windows — its only stream is ordered
CDC apply (SURVEY.md §2.E). These operators are the additions Spark
gives the engine for free: tumbling/sliding window counts and
session windows with watermark-bounded state. The batch twins
(ev_tumbling_hour, ev_sessionize in plans/analytics.py) are what the
oracle gate checks; these wrappers run the same logic incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP.

    Parquet without timezone annotation reads as TIMESTAMP_NTZ on
    Spark 4, which watermarks/windows reject; with the session pinned
    to UTC (session.py) the cast is numerically a no-op.
    """
    return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window counts; works on batch & stream DFs.

    Watermark bounds state at scale: late rows beyond it are dropped
    instead of growing the state store forever.
    """
    ev = _event_time(events, ts_col)
    src = ev.withWatermark(ts_col, watermark) if ev.isStreaming else ev
    return (
        src.groupBy(F.window(ts_col, window_size).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    ev = _event_time(events, ts_col)
    src = ev.withWatermark(ts_col, watermark) if ev.isStreaming else ev
    return (
        src.groupBy(
            F.window(ts_col, window_size, slide).alias("win"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("win.start").alias("window_start"), key_col, "n"
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Native session_window (streaming twin of ev_sessionize)."""
    ev = _event_time(events, ts_col)
    src = ev.withWatermark(ts_col, watermark) if ev.isStreaming else ev
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def run_stream_to_memory(
    events_stream: DataFrame,
    transform,
    query_name: str = "stream_out",
    output_mode: str = "complete",
):
    """Drive a streaming transform to completion against a bounded
    source (test/smoke harness): memory sink + processAllAvailable.
    `output_mode="append"` for joins/dedup (complete is aggregate-only).
    """
    q = (
        transform(events_stream)
        .writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return events_stream.sparkSession.sql(f"SELECT * FROM {query_name}")
