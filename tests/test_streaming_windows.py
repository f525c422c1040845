"""Streaming window aggregations: the streaming result must equal the
batch twin over the same bounded input (exactly-once + determinism)."""

from myduckserver_spark.streaming.windows import (
    run_stream_to_memory,
    session_windows,
    tumbling_counts,
)
from myduckserver_spark.tables import load_table


def _events_stream(spark, sf_dir, tmp_path):
    batch = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    batch.write.parquet(src)
    return batch, spark.readStream.schema(batch.schema).parquet(src)


def test_tumbling_stream_equals_batch(spark, sf_dir, tmp_path):
    batch, stream = _events_stream(spark, sf_dir, tmp_path)
    got = run_stream_to_memory(stream, tumbling_counts, "tumbling_out")
    want = tumbling_counts(batch)
    g = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in got.collect()
    }
    w = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in want.collect()
    }
    assert g == w and len(w) > 10


def test_session_stream_equals_batch(spark, sf_dir, tmp_path):
    batch, stream = _events_stream(spark, sf_dir, tmp_path)
    got = run_stream_to_memory(stream, session_windows, "session_out")
    want = session_windows(batch)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 50

def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode window results must exclude events that arrive
    after the watermark has passed their window — the bounded-state
    contract that keeps a 100 TB stream's state store finite."""
    import datetime as dt
    import os

    from myduckserver_spark.streaming.windows import tumbling_counts

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    schema = "ts timestamp, event_type string, value double"

    def _t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    import time

    # distinct mtimes: the file source orders triggers by modification
    # time, and all three batches are written before the stream starts
    # batch 1: 10:00 event + 13:30 event (watermark advances to 13:30)
    spark.createDataFrame(
        [(_t(10), "a", 1.0), (_t(13, 30), "a", 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 2: on-time event; at its end the [10:00, 11:00) window's
    # state is EVICTED and the row emitted (watermark 13:30 > 11:00).
    # Spark drops late rows only once their window state is gone — a
    # late row arriving in the same batch that finalizes its window
    # still merges (observed 4.1.2 semantics; the guarantee is bounded
    # state, not earliest-possible drop).
    spark.createDataFrame(
        [(_t(14), "a", 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 3: 10:30 event — its window closed in batch 2: dropped
    spark.createDataFrame(
        [(_t(10, 30), "a", 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 4: fresh event so the remaining windows can also close
    spark.createDataFrame(
        [(_t(16), "a", 1.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        tumbling_counts(stream, window_size="1 hour", watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.window_start.hour: r.n
            for r in spark.sql("SELECT * FROM late_out").collect()}
    assert rows.get(10) == 1, "late 10:30 event must have been dropped"
