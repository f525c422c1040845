"""Bucketed co-located joins: write once with the shuffle, join forever
without one (operators/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from myduckserver_spark.operators.bucketing import colocated_join, write_bucketed
from myduckserver_spark.tables import load_table


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"),
        "b_orders", "okey", num_buckets=8, sort_cols="okey",
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"),
        "b_lineitem", "okey", num_buckets=8, sort_cols="okey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    # force SMJ so the assertion tests bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_orders", "b_lineitem", "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it computes the right thing
        n = joined.count()
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        expected = orders.join(
            li, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert n == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
