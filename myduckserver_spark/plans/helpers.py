"""Shared determinism helpers for oracle-matched queries.

Why DECIMAL: double summation is non-associative, and Spark's partial
aggregation order differs run-to-run and engine-to-engine. Casting each
row to DECIMAL(18,6) makes the sum exact and associative, so Spark and
DuckDB produce bit-identical results regardless of partitioning. This is
the Spark-side analog of the reference's exact-decimal handling at the
row seam (reference: backend/iter.go:125-133).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC_IN = "decimal(18,6)"
DEC_OUT = "decimal(38,6)"


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC_IN)


def dsum(c: Column | str, alias: str) -> Column:
    """Exact decimal sum with pinned output type DECIMAL(38,6)."""
    return F.sum(dec(c)).cast(DEC_OUT).alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Deterministic double average: exact decimal sum, then one IEEE divide."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(c)).cast("double") / F.count(F.lit(1))).alias(alias)


def bcount(alias: str) -> Column:
    return F.count(F.lit(1)).cast("long").alias(alias)


def ts_micros(c: Column | str) -> Column:
    """Epoch microseconds that accepts both TIMESTAMP and TIMESTAMP_NTZ.

    Parquet files without timezone annotation read as TIMESTAMP_NTZ on
    Spark 4, which `unix_micros` rejects. With the session pinned to UTC
    (session.py) the cast to TIMESTAMP is numerically a no-op, so this is
    safe for either input type.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))


# Oracle-side (DuckDB SQL) equivalents — keep textually parallel.
def o_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS {alias}"


def o_davg(expr: str, alias: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) AS {alias}"


def o_bcount(alias: str) -> str:
    return f"CAST(COUNT(*) AS BIGINT) AS {alias}"
