"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + values
(order-insensitive, columns sorted by name — mirroring the driver's
hash compare described in __spark_entry__.py).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
from dataclasses import dataclass

import duckdb

from myduckserver_spark.tables import TPCH_TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_val(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_one(spark, name: str, spark_fn, oracle: str | None, sf_dir: str) -> CompareResult:
    sdf = spark_fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        return CompareResult(name, True, len(srows), -1, "rows-only (no oracle)")
    con = duckdb_conn(sf_dir)
    try:
        rel = con.sql(oracle)
        ocols = rel.columns
        orows = rel.fetchall()
    finally:
        con.close()
    if sorted(scols) != sorted(ocols):
        return CompareResult(
            name, False, len(srows), len(orows),
            f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}",
        )
    if len(srows) != len(orows):
        return CompareResult(
            name, False, len(srows), len(orows),
            f"row count mismatch: spark={len(srows)} oracle={len(orows)}",
        )
    sn = _norm_rows(scols, srows)
    on = _norm_rows(ocols, orows)
    if sn != on:
        from collections import Counter

        s_only = list((Counter(sn) - Counter(on)).elements())[:4]
        o_only = list((Counter(on) - Counter(sn)).elements())[:4]
        cols = sorted(scols)
        detail = (
            f"value mismatch, cols={cols}\n"
            + "\n".join(f"  spark-only: {r}" for r in s_only)
            + "\n"
            + "\n".join(f"  duck-only : {r}" for r in o_only)
        )
        return CompareResult(name, False, len(srows), len(orows), detail)
    return CompareResult(name, True, len(srows), len(orows))
