"""Range-sharded output writing — the training-data export step.

A pretraining pipeline ends by materializing the cleaned corpus as a
set of shard files with (a) a global ordering (curriculum order, or
just a stable key so reruns byte-match), (b) bounded shard size so
downstream loaders stream them, and (c) a manifest recording each
shard's key range and row count. The reference's analog is COPY TO in
partitioned formats (reference: pgserver/datawriter.go:49-139); at
100 TB the Spark-native answer is repartitionByRange + per-file row
caps, which gives totally ordered, non-overlapping shards with ONE
shuffle (the range exchange) and no driver involvement.

Scale notes:
- `repartitionByRange` samples the key distribution to place shard
  boundaries, so skewed keys still yield balanced shards (unlike
  fixed-width bucketing on the key value).
- `maxRecordsPerFile` bounds file size without another shuffle: a
  too-large range partition splits into several files that remain
  internally sorted and range-disjoint from other partitions.
- The manifest is computed from the written files' footer metadata
  (`_metadata.file_path`) — a cheap scan of just the shard key column,
  pruned via Parquet column projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_shards(
    df: DataFrame,
    path: str,
    order_key: str | list[str],
    num_shards: int = 32,
    max_records_per_file: int | None = None,
) -> None:
    """Write `df` as range-sharded parquet: globally ordered by
    `order_key` across shards, sorted within each shard.

    One range exchange; each output file covers a contiguous,
    non-overlapping key range (files within one range partition share
    its range but stay sorted).
    """
    keys = [order_key] if isinstance(order_key, str) else list(order_key)
    cols = [F.col(k) for k in keys]
    out = df.repartitionByRange(num_shards, *cols).sortWithinPartitions(
        *cols
    )
    w = out.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def shard_manifest(
    spark: SparkSession, path: str, order_key: str
) -> DataFrame:
    """Per-file manifest of a sharded dataset: row count and min/max
    of the shard key, read from the files themselves (source of truth,
    not a side channel that can drift).

    Columns: file (basename), n_rows, key_min, key_max.
    """
    return (
        spark.read.parquet(path)
        .select(
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("file"),
            F.col(order_key).alias("k"),
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("k").alias("key_min"),
            F.max("k").alias("key_max"),
        )
        .orderBy("key_min", "file")
    )
