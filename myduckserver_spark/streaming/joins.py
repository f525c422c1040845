"""Streaming joins + watermark-bounded dedup (Spark-native extension
surface, SURVEY.md §2.E).

The reference's only stream is ordered CDC apply; these are the
operators Structured Streaming adds on top: stream-stream interval
joins (state bounded by the watermark + time-range condition),
stream-static broadcast enrichment, and dropDuplicatesWithinWatermark
(exactly-once event dedup with TTL'd state instead of an unbounded
seen-set).

Every operator here works identically on batch DataFrames — the batch
run IS the correctness oracle for the streaming run (the tests assert
stream == batch over the same bounded input).

Scale notes: the interval join keys state by (join key, event-time
bucket) and the watermark purges buckets past the horizon, so state is
O(traffic within horizon), not O(stream length). The static side of an
enrichment join is broadcast per micro-batch — never a shuffle of the
stream side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myduckserver_spark.streaming.windows import _event_time


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (l, r) with equal `by` keys where r happens in
    [l.ts, l.ts + horizon] — the stream-stream form of the banded
    range join (operators/rangejoin.py is the batch/bucketed twin).

    Both sides carry a watermark and the join condition carries the
    time range, which is exactly what lets Spark bound join state:
    a buffered left row can be dropped once the right watermark passes
    l.ts + horizon. Works on batch frames too (watermark skipped).
    """
    l = _event_time(left, ts_col).select(
        F.col(by).alias("l_key"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = _event_time(right, ts_col).select(
        F.col(by).alias("r_key"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (l["l_key"] == r["r_key"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, "inner").select(
        "l_event_id", "r_event_id", "l_key", "l_ts", "r_ts", "r_value"
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event dedup with TTL'd state:
    dropDuplicatesWithinWatermark keeps one row per key among rows
    whose event times fall within the watermark delay of each other,
    then forgets the key — state is bounded by traffic-per-horizon
    instead of growing with the whole stream (the scale-correct form
    of the applyInPandasWithState dedup in streaming/stateful.py).

    On a batch frame this degrades to dropDuplicates(keys) — the
    oracle the streaming test compares against.
    """
    keys = keys or ["event_id"]
    ev = _event_time(events, ts_col)
    if not ev.isStreaming:
        return ev.dropDuplicates(keys)
    return ev.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def enrich_with_static(
    events: DataFrame, dim: DataFrame, on: str = "event_type"
) -> DataFrame:
    """Stream-static enrichment: the static dimension is broadcast to
    every micro-batch (no state, no stream-side shuffle) — the
    streaming analog of the broadcast dimension joins in the TPC-H
    plans. Works identically on batch frames."""
    return events.join(F.broadcast(dim), on, "left")
