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