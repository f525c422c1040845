"""Stream-stream interval join, watermark-bounded dedup, stream-static
enrichment (streaming/joins.py): the streaming result must equal the
batch twin over the same bounded input."""

from pyspark.sql import functions as F

from myduckserver_spark.streaming.joins import (
    dedup_within_watermark,
    enrich_with_static,
    interval_join_stream,
)
from myduckserver_spark.streaming.windows import run_stream_to_memory
from myduckserver_spark.tables import load_table


def _split_streams(spark, sf_dir, tmp_path):
    """views/purchases as both batch frames and file streams."""
    ev = load_table(spark, sf_dir, "events")
    views_b = ev.filter(F.col("event_type") == "view")
    buys_b = ev.filter(F.col("event_type") == "purchase")
    vsrc, bsrc = str(tmp_path / "views"), str(tmp_path / "buys")
    views_b.write.parquet(vsrc)
    buys_b.write.parquet(bsrc)
    views_s = spark.readStream.schema(views_b.schema).parquet(vsrc)
    buys_s = spark.readStream.schema(buys_b.schema).parquet(bsrc)
    return views_b, buys_b, views_s, buys_s


def test_interval_join_stream_equals_batch(spark, sf_dir, tmp_path):
    views_b, buys_b, views_s, buys_s = _split_streams(spark, sf_dir, tmp_path)
    got = run_stream_to_memory(
        views_s,
        lambda l: interval_join_stream(l, buys_s),
        "ij_out",
        output_mode="append",
    )
    want = interval_join_stream(views_b, buys_b)
    g = sorted((r.l_event_id, r.r_event_id) for r in got.collect())
    w = sorted((r.l_event_id, r.r_event_id) for r in want.collect())
    assert g == w and len(w) > 0


def test_dedup_within_watermark_collapses_duplicates(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(500)
    dup_b = ev.unionAll(ev)  # every event delivered twice
    src = str(tmp_path / "dups")
    dup_b.write.parquet(src)
    dup_s = spark.readStream.schema(dup_b.schema).parquet(src)
    got = run_stream_to_memory(
        dup_s,
        lambda s: dedup_within_watermark(s, ["event_id"]),
        "dedup_out",
        output_mode="append",
    )
    want = dedup_within_watermark(dup_b, ["event_id"])
    assert got.count() == want.count() == 500
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in want.collect()
    )


def test_enrich_with_static_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0), ("purchase", 10.0)],
        "event_type string, weight double",
    )
    src = str(tmp_path / "enrich_src")
    ev.write.parquet(src)
    ev_s = spark.readStream.schema(ev.schema).parquet(src)
    got = run_stream_to_memory(
        ev_s,
        lambda s: enrich_with_static(s, dim).select("event_id", "weight"),
        "enrich_out",
        output_mode="append",
    )
    want = enrich_with_static(ev, dim).select("event_id", "weight")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
