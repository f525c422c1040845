"""Cross-batch stateful streaming: dedup state must survive between
microbatches (the property plain per-batch dedup can't give)."""

import os

from myduckserver_spark.streaming.stateful import streaming_dedup


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    schema = "doc_id long, text string"

    # batch 1: docs 1-3 (3 distinct texts)
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon zeta")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: doc 4 duplicates doc 1's text; doc 5 is new
    spark.createDataFrame(
        [(4, "alpha beta"), (5, "eta theta")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force separate microbatches
        .parquet(src)
    )
    q = (
        streaming_dedup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert 4 not in out, "cross-batch duplicate must be dropped by state"
    assert {1, 2, 3, 5} <= out


def test_running_user_totals_accumulates(spark, tmp_path):
    from myduckserver_spark.streaming.stateful import running_user_totals

    src = str(tmp_path / "ev_src")
    os.makedirs(src)
    schema = "user_id long, value double"
    spark.createDataFrame([(7, 1.25), (7, 2.0), (8, 5.0)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame([(7, 0.75)], schema) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # memory sink in update mode appends each emission; last row per
    # user is the running total
    rows = spark.sql(
        "SELECT * FROM totals_out"
    ).collect()
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.total_cents)
    assert latest[7] == (3, 400)   # 1.25+2.0+0.75 = 4.00
    assert latest[8] == (1, 500)

def test_streaming_dedup_ttl_api_across_microbatches(spark, tmp_path):
    """Same cross-batch contract on the transformWithStateInPandas API
    (state TTL attached to the value state)."""
    import pytest

    pytest.importorskip(
        "google.protobuf", reason="transformWithState needs protobuf"
    )
    from myduckserver_spark.streaming.stateful import streaming_dedup_ttl

    src = str(tmp_path / "docs_tws")
    os.makedirs(src)
    schema = "doc_id long, text string"
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "alpha beta"), (4, "eta theta")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_dedup_ttl(stream, ttl_ms=3600_000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_ttl_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r.doc_id for r in spark.sql("SELECT * FROM dedup_ttl_out").collect()}
    assert 3 not in out
    assert {1, 2, 4} <= out
