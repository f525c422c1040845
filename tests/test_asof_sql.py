"""ASOF JOIN SQL front door (engine._rewrite_asof_join) — DuckDB-dialect
``FROM l ASOF [LEFT] JOIN r ON ...`` routed to the merge-scan operator
and checked against DuckDB's native AsOf operator on the same data
(the reference's pg surface passes ASOF JOIN straight to DuckDB)."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from myduckserver_spark.engine import Engine


@pytest.fixture(scope="module")
def asof_env(spark, sf_dir, tmp_path_factory):
    eng = Engine(spark, str(tmp_path_factory.mktemp("asof_cat")))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    ev.filter(F.col("event_type") == "view").createOrReplaceTempView(
        "asof_views"
    )
    ev.filter(F.col("event_type") == "purchase").createOrReplaceTempView(
        "asof_buys"
    )
    con = duckdb.connect()
    p = os.path.join(sf_dir, "events.parquet")
    con.sql(
        f"CREATE VIEW asof_views AS SELECT * FROM read_parquet('{p}') "
        "WHERE event_type = 'view'"
    )
    con.sql(
        f"CREATE VIEW asof_buys AS SELECT * FROM read_parquet('{p}') "
        "WHERE event_type = 'purchase'"
    )
    yield eng, con
    con.close()


def _rows(df):
    return sorted(tuple(r) for r in df)


def test_asof_inner_matches_duckdb(asof_env):
    eng, con = asof_env
    sql = (
        "SELECT v.event_id, v.user_id, b.ts AS buy_ts, b.value AS buy_value "
        "FROM asof_views v ASOF JOIN asof_buys b "
        "ON v.user_id = b.user_id AND v.ts >= b.ts "
        "ORDER BY v.event_id"
    )
    got = _rows(
        (r[0], r[1], r[2].isoformat(), round(r[3], 6))
        for r in eng.sql(sql).collect()
    )
    want = _rows(
        (r[0], r[1], r[2].isoformat(), round(r[3], 6))
        for r in con.sql(sql).fetchall()
    )
    assert got == want and len(got) > 0


def test_asof_left_keeps_unmatched(asof_env):
    eng, con = asof_env
    sql = (
        "SELECT v.event_id, b.ts AS buy_ts "
        "FROM asof_views v ASOF LEFT JOIN asof_buys b "
        "ON v.user_id = b.user_id AND v.ts >= b.ts"
    )
    got = _rows(
        (r[0], None if r[1] is None else r[1].isoformat())
        for r in eng.sql(sql).collect()
    )
    want = _rows(
        (r[0], None if r[1] is None else r[1].isoformat())
        for r in con.sql(sql).fetchall()
    )
    assert got == want
    assert any(v is None for _, v in got)  # some views precede any buy


def test_asof_swapped_operands_and_select_star(asof_env):
    eng, _ = asof_env
    # r.ts <= l.ts is the same backward join; SELECT * exposes left
    # columns under their own names and colliding right ones prefixed.
    df = eng.sql(
        "SELECT * FROM asof_views v ASOF JOIN asof_buys b "
        "ON b.user_id = v.user_id AND b.ts <= v.ts"
    )
    assert "event_id" in df.columns and "b_ts" in df.columns
    assert df.count() > 0


def test_asof_needs_inequality(asof_env):
    eng, _ = asof_env
    with pytest.raises(ValueError):
        eng.sql(
            "SELECT v.event_id FROM asof_views v ASOF JOIN asof_buys b "
            "ON v.user_id = b.user_id"
        )


def test_asof_plan_is_single_shuffle_no_join(asof_env):
    eng, _ = asof_env
    df = eng.sql(
        "SELECT v.event_id, b.value AS bv "
        "FROM asof_views v ASOF JOIN asof_buys b "
        "ON v.user_id = b.user_id AND v.ts >= b.ts"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # merge-scan union+window, no pair blowup


def test_asof_forward_matches_duckdb(asof_env):
    # forward as-of: next purchase AT/AFTER each view (v.ts <= b.ts)
    eng, con = asof_env
    sql = (
        "SELECT v.event_id, b.ts AS buy_ts, b.value AS buy_value "
        "FROM asof_views v ASOF JOIN asof_buys b "
        "ON v.user_id = b.user_id AND v.ts <= b.ts"
    )
    got = _rows(
        [
            (r.event_id, r.buy_ts, r.buy_value)
            for r in eng.sql(sql).collect()
        ]
    )
    want = _rows(con.sql(sql).fetchall())
    assert got == want and len(got) > 0


def test_asof_forward_left_strict_matches_duckdb(asof_env):
    # strict (<) + LEFT: unmatched views kept with NULLs
    eng, con = asof_env
    sql = (
        "SELECT v.event_id, b.ts AS buy_ts "
        "FROM asof_views v ASOF LEFT JOIN asof_buys b "
        "ON v.user_id = b.user_id AND v.ts < b.ts"
    )
    got = _rows([(r.event_id, r.buy_ts) for r in eng.sql(sql).collect()])
    want = _rows(con.sql(sql).fetchall())
    assert got == want
    assert any(ts is None for _, ts in got)  # some views have no later buy
