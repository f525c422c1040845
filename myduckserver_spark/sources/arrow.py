"""Arrow columnar interchange (COPY ... FORMAT ARROW parity).

The reference streams Arrow IPC in/out of DuckDB
(reference pgserver/arrowwriter.go:66-135, arrowloader.go:25-105) and
buffers replication deltas as Arrow batches (delta/delta.go). Spark's
twin: ``df.toArrow()`` / ``spark.createDataFrame(arrow_table)`` —
Arrow is already Spark's Python interchange format, so these are
zero-copy-ish at the driver edge.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.ipc as ipc
from pyspark.sql import DataFrame, SparkSession


def to_arrow(df: DataFrame) -> pa.Table:
    return df.toArrow()


def from_arrow(spark: SparkSession, table: pa.Table) -> DataFrame:
    return spark.createDataFrame(table)


def write_ipc(df: DataFrame, path: str) -> None:
    """COPY TO STDOUT (FORMAT ARROW) → an Arrow IPC stream file."""
    table = df.toArrow()
    with pa.OSFile(path, "wb") as sink, ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)


def read_ipc(spark: SparkSession, path: str) -> DataFrame:
    """COPY FROM STDIN (FORMAT ARROW) ← an Arrow IPC stream file."""
    with pa.memory_map(path) as src:
        table = ipc.open_stream(src).read_all()
    return spark.createDataFrame(table)
