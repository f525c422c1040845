"""Banded interval join (operators/rangejoin.py): boundary inclusion,
cell-straddling matches, and the no-double-match guarantee."""

import datetime as dt

from myduckserver_spark.operators.rangejoin import interval_join


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_interval_join_boundaries_and_cells(spark):
    left = spark.createDataFrame(
        [("a", _ts(7200))], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(3599)),   # just below window start -> out
            ("a", _ts(3600)),   # exactly at lower bound -> in
            ("a", _ts(5000)),   # mid-window, different cell -> in
            ("a", _ts(7200)),   # exactly at upper bound -> in
            ("a", _ts(7201)),   # above -> out
            ("b", _ts(5000)),   # wrong key -> out
        ],
        "k string, ts timestamp",
    )
    out = interval_join(
        left, right, by="k", left_ts="ts", right_ts="ts",
        lower_s=-3600.0, upper_s=0.0,
    )
    got = sorted(r.ts_r for r in out.collect())
    assert got == [_ts(3600), _ts(5000), _ts(7200)]


def test_interval_join_no_duplicate_pairs(spark):
    # window width exactly equals cell width; rows at cell boundaries
    # must still match exactly once
    left = spark.createDataFrame(
        [("a", _ts(i * 100)) for i in range(50)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts(i * 100)) for i in range(50)], "k string, ts timestamp"
    )
    out = interval_join(
        left, right, by="k", left_ts="ts", right_ts="ts",
        lower_s=0.0, upper_s=100.0,
    )
    # each left t matches right t and t+100 (except the last)
    assert out.count() == 50 + 49
    assert out.distinct().count() == out.count()
