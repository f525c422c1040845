"""AQE skew-join split: the session's skew configs must actually fire
on a hot key and preserve results (SCALING.md §skew; full-size
experiment in scripts/skew_stress.py).

A static hash shuffle sends one hot join key to ONE reducer — the
single-straggler shape that serializes a 1000-executor stage. AQE's
OptimizeSkewedJoin splits the oversized partition into advisory-sized
reads; this pins (a) the split engages when shuffle stats warrant it,
(b) the join result is unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    # tiny thresholds so the decision fires on test-size statistics —
    # the cluster defaults (256 MiB / factor 5) encode the same rule
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark
    for k, v in keep.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_join(spark):
    # 100k rows on ONE key (incompressible payload so shuffle-byte
    # stats see the skew), 10k rows spread over 1k other keys
    big = (
        spark.range(100_000)
        .selectExpr(
            "CAST(0 AS BIGINT) AS k",
            "id AS payload",
            "repeat(uuid(), 2) AS blob",
        )
        .unionByName(
            spark.range(10_000).selectExpr(
                "id % 1000 + 1 AS k", "id AS payload",
                "repeat(uuid(), 2) AS blob",
            )
        )
    )
    dim = spark.range(1_001).selectExpr("id AS k", "id * 10 AS v")
    return big.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("p")
    )


def test_skew_split_engages_and_preserves_results(skew_conf):
    spark = skew_conf
    df = _skewed_join(spark)
    rows_on = {tuple(r) for r in df.collect()}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # AQEShuffleRead … skewed

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    df2 = _skewed_join(spark)
    rows_off = {tuple(r) for r in df2.collect()}
    plan_off = df2._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan_off
    assert rows_on == rows_off
