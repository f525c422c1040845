"""DECIMAL/DATE output fidelity at the engine front door.

A wire client of the reference receives true arbitrary-precision
DECIMALs and native DATEs (reference: backend/iter.go:125-133 renders
DuckDB decimals/dates losslessly into MySQL wire values). The repo's
driver-gate seam deliberately coerces outputs to DOUBLE/str — these
tests pin that the coercion is PRESENTATION-ONLY: ``engine.sql`` itself
returns real DecimalType/DateType columns whose values match a DuckDB
cursor running the identical SQL.
"""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pytest
from pyspark.sql import types as T

from myduckserver_spark.engine import Engine

ROWS = [
    (1, decimal.Decimal("12345.6789"), datetime.date(1997, 3, 15)),
    (2, decimal.Decimal("-0.0001"), datetime.date(2024, 2, 29)),
    (3, decimal.Decimal("99999999999999.9999"), datetime.date(1970, 1, 1)),
    (4, None, None),
]


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE fid (id INT PRIMARY KEY, amt DECIMAL(18,4), d DATE)"
    )
    for i, amt, d in ROWS:
        a = "NULL" if amt is None else str(amt)
        dd = "NULL" if d is None else f"DATE '{d.isoformat()}'"
        e.execute(f"INSERT INTO fid VALUES ({i}, {a}, {dd})")
    return e


def _duck(sql: str):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE fid (id INT, amt DECIMAL(18,4), d DATE)"
    )
    for i, amt, d in ROWS:
        a = "NULL" if amt is None else str(amt)
        dd = "NULL" if d is None else f"DATE '{d.isoformat()}'"
        con.sql(f"INSERT INTO fid VALUES ({i}, {a}, {dd})")
    out = con.sql(sql).fetchall()
    con.close()
    return out


def test_decimal_column_type_and_values(eng):
    df = eng.sql("SELECT id, amt FROM fid ORDER BY id")
    amt_type = df.schema["amt"].dataType
    assert isinstance(amt_type, T.DecimalType)
    assert (amt_type.precision, amt_type.scale) == (18, 4)
    got = [(r.id, r.amt) for r in df.collect()]
    want = _duck("SELECT id, amt FROM fid ORDER BY id")
    assert got == [tuple(w) for w in want]
    # values are exact Decimals, not float round-trips
    assert got[0][1] == decimal.Decimal("12345.6789")
    assert isinstance(got[0][1], decimal.Decimal)


def test_decimal_arithmetic_stays_decimal(eng):
    sql = (
        "SELECT id, CAST(CAST(amt AS DECIMAL(19,4)) * 2 AS DECIMAL(19,4)) "
        "AS dbl_amt FROM fid WHERE amt IS NOT NULL ORDER BY id"
    )
    df = eng.sql(sql)
    assert isinstance(df.schema["dbl_amt"].dataType, T.DecimalType)
    got = [(r.id, r.dbl_amt) for r in df.collect()]
    want = _duck(sql)
    assert got == [tuple(w) for w in want]
    assert got[2][1] == decimal.Decimal("199999999999999.9998")


def test_decimal_aggregate_matches_duckdb(eng):
    # SUM over DECIMAL(18,4): Spark widens to DECIMAL(28,4); compare
    # exact values against DuckDB's cursor (also arbitrary precision)
    df = eng.sql("SELECT SUM(amt) AS s FROM fid")
    assert isinstance(df.schema["s"].dataType, T.DecimalType)
    got = df.collect()[0].s
    want = _duck("SELECT SUM(amt) AS s FROM fid")[0][0]
    assert got == want == decimal.Decimal("100000000012345.6787")


def test_date_column_type_and_values(eng):
    df = eng.sql("SELECT id, d FROM fid ORDER BY id")
    assert isinstance(df.schema["d"].dataType, T.DateType)
    got = [(r.id, r.d) for r in df.collect()]
    want = _duck("SELECT id, d FROM fid ORDER BY id")
    assert got == [tuple(w) for w in want]
    assert got[1][1] == datetime.date(2024, 2, 29)
    assert isinstance(got[0][1], datetime.date)


def test_date_arithmetic_matches_duckdb(eng):
    sql = (
        "SELECT id, d + INTERVAL 40 DAY AS d40 "
        "FROM fid WHERE d IS NOT NULL ORDER BY id"
    )
    got = [
        (r.id, r.d40 if isinstance(r.d40, datetime.date) else r.d40.date())
        for r in eng.sql(sql, dialect="mysql").collect()
    ]
    want = [
        (w[0], w[1].date() if hasattr(w[1], "date") else w[1])
        for w in _duck(sql)
    ]
    assert got == want
    assert got[1] == (2, datetime.date(2024, 4, 9))  # leap-year carry
