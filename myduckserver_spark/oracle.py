"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count + column names + values.

Faithfulness matters more than leniency here: the driver fetches the
DuckDB side via pandas (DECIMAL -> float64) and the Spark side via
Arrow/pandas (DECIMAL -> Decimal objects), so a DECIMAL-typed output
column can never hash-match even when the values are numerically
identical (round-1 lesson: 12 hash_match failures, all DECIMAL/–).
This comparer therefore:

- fetches Spark results with ``toPandas()`` and DuckDB with ``.df()``
  (the same seam the driver crosses),
- canonicalizes values TYPE-SENSITIVELY — a ``Decimal`` never equals a
  ``float``, so the decimal seam fails locally before it fails in the
  driver, and
- reports any Decimal-typed output column as a defect in itself.

Query authors: final outputs must be BIGINT/INT/DOUBLE/STRING/DATE/
TIMESTAMP/BOOLEAN/arrays thereof. Exact DECIMAL arithmetic stays
*inside* the plan (plans/helpers.py), never in the output schema.
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


def _canon(v):
    """Type-sensitive canonical form. Distinct Python/numpy type families
    map to distinct canonical strings so cross-type 'equal' values
    (Decimal('1.5') vs 1.5) do NOT compare equal — mirroring the driver's
    value-hash, which stringifies the two engines' native fetch types."""
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "∅"  # pandas NULL-float; both engines produce NaN for NULL
        return f"f:{f!r}"
    if isinstance(v, decimal.Decimal):
        return f"D:{v}"  # intentionally never equal to f:...
    if isinstance(v, pd.Timestamp):
        return f"t:{v.to_pydatetime().replace(tzinfo=None).isoformat()}"
    if isinstance(v, dt.datetime):
        return f"t:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, dt.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_canon(x)) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon(x)}" for k, x in sorted(v.items())) + "}"
    return f"o:{v!r}"


def _frame_rows(df) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def _decimal_cols(df) -> list[str]:
    bad = []
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            for v in s:
                if isinstance(v, decimal.Decimal):
                    bad.append(c)
                    break
    return bad


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_one(spark, name: str, spark_fn, oracle: str | None, sf_dir: str) -> CompareResult:
    sdf = spark_fn(spark, sf_dir)
    spdf = sdf.toPandas()
    if oracle is None:
        return CompareResult(name, True, len(spdf), -1, "rows-only (no oracle)")
    con = duckdb_conn(sf_dir)
    try:
        odf = con.sql(oracle).df()
    finally:
        con.close()
    notes = []
    sbad = _decimal_cols(spdf)
    if sbad:
        notes.append(f"DECIMAL-typed Spark output cols {sbad} (will hash-fail in driver)")
    if sorted(spdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False, len(spdf), len(odf),
            f"column mismatch: spark={sorted(spdf.columns)} oracle={sorted(odf.columns)}",
        )
    if len(spdf) != len(odf):
        return CompareResult(
            name, False, len(spdf), len(odf),
            f"row count mismatch: spark={len(spdf)} oracle={len(odf)}",
        )
    sn = _frame_rows(spdf)
    on = _frame_rows(odf)
    if sn != on or notes:
        from collections import Counter

        s_only = list((Counter(sn) - Counter(on)).elements())[:4]
        o_only = list((Counter(on) - Counter(sn)).elements())[:4]
        cols = sorted(spdf.columns)
        detail = "; ".join(notes)
        if sn != on:
            detail += (
                f"\nvalue mismatch, cols={cols}\n"
                + "\n".join(f"  spark-only: {r}" for r in s_only)
                + "\n"
                + "\n".join(f"  duck-only : {r}" for r in o_only)
            )
        return CompareResult(name, False, len(spdf), len(odf), detail)
    return CompareResult(name, True, len(spdf), len(odf))
