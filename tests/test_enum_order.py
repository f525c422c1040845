"""ENUM declaration-order semantics (reference: native DuckDB ENUM,
catalog/type_mapping.go:101-110): ORDER BY on an ENUM column sorts by
declared position, not lexically. Oracle = an actual DuckDB ENUM type
over the same data."""

from __future__ import annotations

import duckdb
import pytest

from myduckserver_spark.engine import Engine

SIZES = ["small", "medium", "large", "x-large"]  # lexical order differs
ROWS = [
    (1, "medium"),
    (2, "x-large"),
    (3, "small"),
    (4, "large"),
    (5, "small"),
    (6, None),
]


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE shirts (id INT PRIMARY KEY, "
        "size ENUM('small','medium','large','x-large'))"
    )
    for i, s in ROWS:
        v = "NULL" if s is None else f"'{s}'"
        e.execute(f"INSERT INTO shirts (id, size) VALUES ({i}, {v})")
    return e


def _duck_oracle():
    con = duckdb.connect()
    con.sql("CREATE TYPE size_t AS ENUM ('small','medium','large','x-large')")
    con.sql("CREATE TABLE shirts (id INT, size size_t)")
    for i, s in ROWS:
        v = "NULL" if s is None else f"'{s}'"
        con.sql(f"INSERT INTO shirts VALUES ({i}, {v})")
    return con


def test_order_by_enum_matches_duckdb_enum(engine):
    got = [
        (r.id, r.size)
        for r in engine.sql(
            "SELECT id, size FROM shirts ORDER BY size NULLS FIRST, id"
        ).collect()
    ]
    con = _duck_oracle()
    want = con.sql(
        "SELECT id, size FROM shirts ORDER BY size NULLS FIRST, id"
    ).fetchall()
    con.close()
    assert got == [(i, s) for i, s in want]
    # and it is genuinely declaration order, not lexical
    sizes = [s for _, s in got if s is not None]
    assert sizes == ["small", "small", "medium", "large", "x-large"]


def test_order_by_enum_desc_and_qualified(engine):
    got = [
        r.size
        for r in engine.sql(
            "SELECT size FROM shirts WHERE size IS NOT NULL "
            "ORDER BY shirts.size DESC, id"
        ).collect()
    ]
    assert got == ["x-large", "large", "medium", "small", "small"]


def test_order_by_non_enum_untouched(engine):
    out = engine._rewrite_enum_order("SELECT * FROM shirts ORDER BY id DESC")
    assert out == "SELECT * FROM shirts ORDER BY id DESC"
    # expressions over the enum column are left alone too
    expr = "SELECT * FROM shirts ORDER BY concat(size, 'x')"
    assert engine._rewrite_enum_order(expr) == expr


def test_where_comparison_still_string(engine):
    """MySQL compares ENUM to string constants BY STRING; only ORDER BY
    uses the index — the rewrite must not touch WHERE."""
    n = engine.sql(
        "SELECT count(*) AS n FROM shirts WHERE size = 'small'"
    ).collect()[0].n
    assert n == 2
