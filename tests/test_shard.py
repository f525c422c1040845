"""Range-sharded output writing: ordering, disjointness, manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from myduckserver_spark.operators.shard import (
    shard_manifest,
    write_range_shards,
)
from myduckserver_spark.tables import load_table


def test_range_shards_disjoint_and_complete(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.count()
    path = str(tmp_path / "shards")

    write_range_shards(docs, path, "doc_id", num_shards=4)
    mani = shard_manifest(spark, path, "doc_id").collect()

    assert sum(r.n_rows for r in mani) == n_in
    assert len(mani) >= 4
    # Ranges must be non-overlapping and ordered across files.
    for prev, cur in zip(mani, mani[1:]):
        assert prev.key_max < cur.key_min
    # Shards are balanced: range partitioning samples the distribution.
    sizes = [r.n_rows for r in mani]
    assert max(sizes) <= 3 * min(sizes) + 10

    # Within-file ordering: re-read grouped by file, check sortedness.
    back = (
        spark.read.parquet(path)
        .select(F.col("_metadata.file_path").alias("f"), "doc_id")
        .groupBy("f")
        .agg(F.collect_list("doc_id").alias("ids"))
        .collect()
    )
    for r in back:
        assert r.ids == sorted(r.ids)


def test_max_records_per_file_bounds_shard_size(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "capped")
    write_range_shards(
        docs, path, "doc_id", num_shards=2, max_records_per_file=20
    )
    mani = shard_manifest(spark, path, "doc_id").collect()
    assert all(r.n_rows <= 20 for r in mani)
    # Files from the same range partition are still globally disjoint
    # on the key because the partition was sorted before splitting.
    for prev, cur in zip(mani, mani[1:]):
        assert prev.key_max < cur.key_min
