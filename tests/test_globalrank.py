"""Scale-safe global ranking (operators/globalrank.py) vs Spark's own
single-partition window as ground truth — including ties that the range
partitioner must keep together, n<k NTILE edge cases, and the closed
forms for percent_rank / cume_dist."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from myduckserver_spark.operators import globalrank as gr


def _truth(df, *order_exprs):
    w = W.orderBy(*order_exprs)
    return df.select(
        "id",
        F.row_number().over(w).alias("t_rn"),
        F.rank().over(w).alias("t_rank"),
        F.dense_rank().over(w).alias("t_dense"),
        F.percent_rank().over(w).alias("t_pr"),
        F.cume_dist().over(w).alias("t_cd"),
        F.ntile(4).over(w).alias("t_nt4"),
        F.ntile(7).over(w).alias("t_nt7"),
    )


@pytest.mark.parametrize("n", [1, 3, 5, 200])
def test_matches_unpartitioned_window(spark, n):
    # heavy ties: key = id % 17 → tie groups larger than one range
    # partition's fair share at n=200 with 32 shuffle partitions
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % 17).alias("k")
    )
    order = [F.asc("k"), F.asc("id")]
    got = gr.with_global_order(df, *order).select(
        "id",
        F.col(gr.ROW_NUMBER).alias("rn"),
        F.col(gr.RANK).alias("rank"),
        F.col(gr.DENSE_RANK).alias("dense"),
        F.col(gr.PERCENT_RANK).alias("pr"),
        F.col(gr.CUME_DIST).alias("cd"),
        gr.ntile_expr(4).alias("nt4"),
        gr.ntile_expr(7).alias("nt7"),
    )
    truth = _truth(df, *order)
    j = got.join(truth, "id").collect()
    assert len(j) == n
    for r in j:
        assert r.rn == r.t_rn, r
        assert r.rank == r.t_rank, r
        assert r.dense == r.t_dense, r
        assert abs(r.pr - r.t_pr) < 1e-12, r
        assert abs(r.cd - r.t_cd) < 1e-12, r
        assert r.nt4 == r.t_nt4, r
        assert r.nt7 == r.t_nt7, r


def test_rank_only_ties_on_key(spark):
    # every row the same key: rank stays 1, dense 1, cume_dist 1.0
    df = spark.range(50).select("id", F.lit(1).alias("k"))
    got = gr.with_global_order(df, F.asc("k")).select(
        F.col(gr.RANK).alias("rank"),
        F.col(gr.DENSE_RANK).alias("dense"),
        F.col(gr.CUME_DIST).alias("cd"),
    ).collect()
    assert all(r.rank == 1 and r.dense == 1 and r.cd == 1.0 for r in got)


def test_global_nth_value(spark):
    df = spark.range(10).select("id", (F.col("id") * 10).alias("v"))
    g = gr.with_global_order(df, F.desc("v"))
    out = gr.global_nth_value(g, "v", 3, "third").select("id", "third")
    assert {r.third for r in out.collect()} == {70}  # 3rd largest of 0..90
    # nth beyond row count -> NULL on every row
    out2 = gr.global_nth_value(g, "v", 99, "nope").select("nope")
    assert {r.nope for r in out2.collect()} == {None}


def test_no_single_partition_window_in_plan(spark):
    df = spark.range(1000).select("id", (F.col("id") % 5).alias("k"))
    g = gr.with_global_order(df, F.asc("k"), F.asc("id"))
    plan = g._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert win_lines
    assert all("__gr_pid" in ln for ln in win_lines)
