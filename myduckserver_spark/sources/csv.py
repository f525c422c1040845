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


def spool_chunks(
    chunks,
    spool_dir: str,
    part_bytes: int = 64 << 20,
) -> list[str]:
    """Spool a stream of arbitrary CSV chunks to line-aligned part files.

    The reference streams COPY FROM STDIN client chunks through a named
    FIFO into one read_csv scan (reference pgserver/dataloader.go:156-256,
    backend/loaddata.go:67-100). Spark has no FIFO-shaped scan, so the
    equivalent is: spool chunks to temp part files — cutting ONLY at
    line boundaries, so chunks may split mid-line or mid-CRLF — then run
    one typed CSV scan over all parts. Multiple parts keep the scan
    parallel for multi-GB loads (the FIFO path is inherently serial; this
    is strictly better at scale).

    Returns the list of part paths written.
    """
    import os

    os.makedirs(spool_dir, exist_ok=True)
    parts: list[str] = []
    carry = b""
    cur = None
    cur_bytes = 0

    def open_part():
        nonlocal cur, cur_bytes
        path = os.path.join(spool_dir, f"part-{len(parts):05d}.csv")
        parts.append(path)
        cur = open(path, "wb")
        cur_bytes = 0

    open_part()
    for chunk in chunks:
        if isinstance(chunk, str):
            chunk = chunk.encode("utf-8")
        data = carry + chunk
        if cur_bytes + len(data) >= part_bytes:
            # rotate at the LAST newline so no row spans two parts
            cut = data.rfind(b"\n")
            if cut >= 0:
                cur.write(data[: cut + 1])
                cur.close()
                open_part()
                data = data[cut + 1 :]
        # hold back a trailing partial line (and a possible split CRLF)
        cut = data.rfind(b"\n")
        if cut >= 0:
            cur.write(data[: cut + 1])
            cur_bytes += cut + 1
            carry = data[cut + 1 :]
        else:
            carry = data
    if carry:
        cur.write(carry if carry.endswith(b"\n") else carry + b"\n")
    cur.close()
    return parts


def copy_from_chunks(
    spark: SparkSession,
    chunks,
    schema: StructType | list[tuple[str, str]] | dict[str, str],
    spool_dir: str,
    text_mode: bool = False,
    part_bytes: int = 64 << 20,
    **csv_opts,
) -> DataFrame:
    """COPY ... FROM STDIN: typed scan over a spooled chunk stream.

    text_mode applies pg COPY text defaults: tab separator, ``\\N`` null
    marker, no quoting (reference pgserver/dataloader.go text format).
    """
    spool_chunks(chunks, spool_dir, part_bytes=part_bytes)
    if text_mode:
        csv_opts.setdefault("sep", "\t")
        csv_opts.setdefault("nullstr", "\\N")
        # pg text format has no quote character; the empty string disables quote handling in Spark
        csv_opts.setdefault("quote", "")
    return load_csv(spark, spool_dir, schema, **csv_opts)


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
