"""Shared determinism helpers for oracle-matched queries.

Why DECIMAL internally: double summation is non-associative, and Spark's
partial aggregation order differs run-to-run and engine-to-engine.
Casting each row to DECIMAL(18,6) makes the sum exact and associative,
so Spark and DuckDB produce bit-identical results regardless of
partitioning. This is the Spark-side analog of the reference's
exact-decimal handling at the row seam (reference: backend/iter.go:125-133).

Why DOUBLE at the output seam: the correctness gate fetches Spark results
via Arrow/pandas (DECIMAL -> Python Decimal objects) and the DuckDB oracle
via pandas (DECIMAL -> float64), so a DECIMAL-typed *output* column can
never hash-match even when values are identical. Every final projection
therefore rounds the exact decimal to scale 2 and casts to DOUBLE.
Rounding first keeps the conversion exact: after ROUND(x, 2) the unscaled
value is |x|*100 < 2^53 for any realistic aggregate, so decimal->double is
a single correctly-rounded IEEE operation in both engines (DuckDB divides
the exact integer by a power of ten; Java BigDecimal.doubleValue does the
same) — bit-identical on both sides. Spark ROUND and DuckDB ROUND both
round half away from zero on decimals, so the rounding itself agrees too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC_IN = "decimal(18,6)"
DEC_OUT = "decimal(38,6)"


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC_IN)


def dout(c: Column) -> Column:
    """Canonical hash-stable output for an exact-decimal expression."""
    return F.round(c, 2).cast("double")


def dsum(c: Column | str, alias: str) -> Column:
    """Exact decimal sum, emitted as canonical DOUBLE (see module doc)."""
    return dout(F.sum(dec(c))).alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Deterministic double average: exact decimal sum rounded to an
    exactly-convertible scale, one exact cast, one IEEE divide."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.round(F.sum(dec(c)), 3).cast("double") / F.count(F.lit(1))).alias(alias)


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
def o_dout(expr: str) -> str:
    return f"CAST(ROUND({expr}, 2) AS DOUBLE)"


def o_dsum(expr: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), 2) AS DOUBLE) AS {alias}"
    )


def o_davg(expr: str, alias: str) -> str:
    return (
        f"(CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), 3) AS DOUBLE)"
        f" / COUNT(*)) AS {alias}"
    )


def o_bcount(alias: str) -> str:
    return f"CAST(COUNT(*) AS BIGINT) AS {alias}"


def ordered_bounded(df, *cols):
    """Presentation sort for a result whose cardinality is BOUNDED by
    the query itself (group-by over low-cardinality keys: return flags,
    nations, histogram buckets) — not proportional to input size.

    A plain ``orderBy`` plans Exchange rangepartitioning, which runs a
    separate range-bounds sampling job per execution (~0.1 s of fixed
    latency locally; one extra stage on a cluster). For a bounded
    output, ``coalesce(1)`` narrow-deps the aggregate's few output
    partitions into one and sorts within it: same ordered result, no
    sampling job, no exchange. This is exactly the shape AQE's
    partition coalescing converges to for a tiny final sort — made
    static here because bounded cardinality is knowable at plan time.

    Use ONLY when the row count is bounded at any data scale; results
    proportional to input (per-document scores, per-customer top-k)
    must keep the distributed ``orderBy``.
    """
    from pyspark.sql import Column

    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    assert all(isinstance(c, Column) for c in exprs)
    return df.coalesce(1).sortWithinPartitions(*exprs)
