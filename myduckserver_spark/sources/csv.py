"""Typed CSV ingest/export with the LOAD DATA / COPY option surface.

Mirrors the option set the reference wires into DuckDB's read_csv for
LOAD DATA (reference backend/loaddata.go:152-202: sep, quote, escape,
nullstr, skip, header, line terminator, per-column types) and the COPY
TO writer options incl. text-mode defaults tab + \\N
(reference pgserver/datawriter.go:49-139, pgserver/copy.go:14-48).

Spark-side: spark.read.csv with an explicit schema — no inference in
the load path, same as the reference (loaddata.go:197-201 passes
explicit column types). Scale: CSV scans parallelize per-file/split;
schema-on-read means no driver-side sniff pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from myduckserver_spark.types import schema_from_mysql


def load_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | list[tuple[str, str]] | dict[str, str],
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    nullstr: str = "",
    header: bool = False,
    skip: int = 0,
    line_sep: str | None = None,
) -> DataFrame:
    """LOAD DATA-equivalent typed CSV read."""
    if not isinstance(schema, StructType):
        schema = schema_from_mysql(schema)
    reader = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("quote", quote)
        .option("escape", escape)
        .option("nullValue", nullstr)
        .option("header", header)
        .option("mode", "PERMISSIVE")
    )
    if line_sep:
        reader = reader.option("lineSep", line_sep)
    if skip:
        # OSS Spark CSV has no skip-N option (header= covers only one
        # line). LOAD DATA's IGNORE n LINES targets a single file, so a
        # global line index is well-defined; zipWithIndex preserves
        # file order (partition index + in-split offset).
        lines = (
            spark.sparkContext.textFile(path)
            .zipWithIndex()
            .filter(lambda t: t[1] >= skip)
            .map(lambda t: t[0])
        )
        return reader.csv(lines)
    return reader.csv(path)


def copy_to(
    df: DataFrame,
    path: str,
    fmt: str = "csv",
    text_mode: bool = False,
    header: bool = False,
    sep: str | None = None,
    quote: str | None = None,
    escape: str | None = None,
    nullstr: str | None = None,
) -> None:
    """COPY ... TO equivalent export (CSV / PARQUET / JSON).

    text_mode applies the pg COPY text defaults: tab separator and
    \\N null marker (reference pgserver/datawriter.go:93-104).
    """
    fmt = fmt.lower()
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return
    if fmt == "json":
        df.write.mode("overwrite").json(path)
        return
    if fmt != "csv":
        raise ValueError(f"unsupported COPY format: {fmt}")
    if text_mode:
        sep = sep if sep is not None else "\t"
        nullstr = nullstr if nullstr is not None else "\\N"
    w = (
        df.write.mode("overwrite")
        .option("sep", sep if sep is not None else ",")
        .option("nullValue", nullstr if nullstr is not None else "")
        .option("emptyValue", "")
        .option("header", header)
    )
    if quote is not None:
        w = w.option("quote", quote)
    if escape is not None:
        w = w.option("escape", escape)
    w.csv(path)
