"""Direct file querying sugar (``SELECT * FROM 'file.parquet'``).

The reference advertises DuckDB's direct-file queries
(reference docs/tutorial/load-parquet-files.md:24-33); Spark's twin is
``spark.read.<fmt>(path)`` / `` SELECT * FROM parquet.`path` ``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FMT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".tsv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".orc": "orc",
}


def query_file(spark: SparkSession, path: str, **options) -> DataFrame:
    """Read a data file by extension; CSV defaults to header+inference
    (ad-hoc exploration path — production loads use sources.csv)."""
    ext = os.path.splitext(path)[1].lower()
    fmt = _EXT_FMT.get(ext)
    if fmt is None:
        raise ValueError(f"cannot infer format from extension: {path}")
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", True).option("inferSchema", True)
        if ext == ".tsv":
            reader = reader.option("sep", "\t")
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, fmt)(path)


def register_file_view(spark: SparkSession, path: str, name: str, **options) -> None:
    query_file(spark, path, **options).createOrReplaceTempView(name)
