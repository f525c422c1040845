"""Merge-scan as-of join operator (operators/asof.py) — the Spark
re-expression of DuckDB's ASOF JOIN available to the reference's
Postgres-surface users."""

from pyspark.sql import functions as F

from myduckserver_spark.operators.asof import asof_join_backward


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0), (4, "a", None)],
        "event_id int, k string, ts double",
    )
    right = spark.createDataFrame(
        [("a", 9.0, "v9"), ("a", 2.0, "v2"), ("a", 5.0, "v5"),
         ("b", 8.0, "v8"), ("b", None, "vnull")],
        "k string, ts double, tag string",
    )
    return left, right


def test_backward_match_with_values(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: (r.ts_asof, r.tag_asof)
        for r in asof_join_backward(
            left, right, by="k", left_ts="ts", right_ts="ts",
            value_cols=["tag"],
        ).collect()
    }
    assert out[1] == (9.0, "v9")   # latest right at/below 10
    assert out[2] == (5.0, "v5")   # exact tie matches
    assert out[3] == (None, None)  # b's only right row is at 8 > 7
    assert out[4] == (None, None)  # NULL left ts matches nothing


def test_exact_match_excluded(spark):
    left, right = _frames(spark)
    out = {
        r.event_id: r.ts_asof
        for r in asof_join_backward(
            left, right, by="k", left_ts="ts", right_ts="ts",
            allow_exact_match=False,
        ).collect()
    }
    assert out[2] == 2.0  # strict <: the tie at 5.0 no longer matches


def test_single_shuffle_plan(spark):
    left, right = _frames(spark)
    plan = asof_join_backward(
        left, right, by="k", left_ts="ts", right_ts="ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # union + window: one shuffle on k
    assert "Join" not in plan           # no pair-blowup join anywhere
