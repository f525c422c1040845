#!/usr/bin/env python
"""Skew-stress experiment: inject a pathological hot join key and show
AQE's skew-join split engaging (plan marker + wall time), vs the same
join with the split disabled.

Why this exists: the 100 TB charter says skewed keys are when plans
die — one hot key concentrates a reducer partition and a single
straggler task serializes the stage. The session enables
`spark.sql.adaptive.skewJoin` (session.py); this experiment is the
recorded evidence that the mechanism actually fires on a hot key and
what it buys. Findings are summarized in SCALING.md §skew.

Method
------
* Base: sf0.1 lineitem (600k rows, ~uniform across orderkeys).
* Inject ONE hot order with HOT_ROWS (default 1.2M) distinct lineitem
  rows — the hot key then carries ~2/3 of all rows, the worst shape a
  shuffle-hash partitioning can meet (a single reducer gets it all).
* Join against orders (150k rows) as a sort-merge join (broadcast
  disabled — at 100 TB neither side broadcasts), aggregate, and time
  3 fresh runs each with skewJoin OFF and ON.
* Thresholds are scaled down (2 MiB / factor 2) so the decision fires
  on test-sized statistics; at cluster scale the defaults (256 MiB /
  factor 5) express the same rule against real partition sizes.
  `forceOptimizeSkewedJoin` is set because the join feeds an
  aggregation (extra shuffle is acceptable — and present anyway).

Usage: python scripts/skew_stress.py [HOT_ROWS]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from myduckserver_spark.session import build_session  # noqa: E402

SRC = "/root/testdata/sf0.1"


def build_skewed(spark, hot_rows: int):
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    hot_key = li.limit(1).select("l_orderkey").first()[0]
    # Distinct column values per injected row: a hot key's rows are not
    # identical in real data, and identical rows LZ4-collapse in the
    # shuffle blocks, hiding the skew from AQE's byte statistics.
    hot = (
        li.filter(F.col("l_orderkey") == hot_key)
        .limit(1)
        .crossJoin(spark.range(hot_rows).select(F.col("id").alias("__r")))
        .withColumn("l_partkey", F.col("__r"))
        .withColumn(
            "l_extendedprice", (F.col("__r") % 10000).cast("double")
        )
        .drop("__r")
    )
    skewed = li.unionByName(hot).repartition(32).cache()
    n = skewed.count()
    return skewed, hot_key, n


def join_agg(skewed, orders):
    return (
        skewed.join(orders, F.expr("l_orderkey = o_orderkey"))
        .groupBy("o_orderpriority")
        # integer aggregates: exact under ANY partitioning, so the
        # OFF/ON result check can demand bit-equality (a double SUM's
        # rounding is partition-order dependent and would false-alarm)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_partkey").alias("s"),
        )
    )


def run(spark, skewed, orders, skew_on: bool):
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": str(skew_on).lower(),
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "32",
    }
    for k, v in conf.items():
        spark.conf.set(k, v)
    join_agg(skewed, orders).collect()  # JIT / shape warm
    times, plan = [], ""
    for _ in range(3):
        df = join_agg(skewed, orders)  # fresh plan: no shuffle reuse
        t0 = time.perf_counter()
        rows = df.collect()
        times.append(time.perf_counter() - t0)
        plan = df._jdf.queryExecution().executedPlan().toString()
    return sorted(times)[1], plan, rows


def main() -> None:
    hot_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    spark = build_session(app_name="skew_stress")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    skewed, hot_key, n = build_skewed(spark, hot_rows)
    print(
        f"dataset: {n} lineitem rows, hot l_orderkey={hot_key} carries "
        f"{hot_rows} of them ({hot_rows / n:.0%})"
    )
    t_off, p_off, r_off = run(spark, skewed, orders, skew_on=False)
    t_on, p_on, r_on = run(spark, skewed, orders, skew_on=True)
    assert sorted(map(tuple, r_off)) == sorted(map(tuple, r_on)), (
        "skew split changed results"
    )
    # markers: SortMergeJoin(skew=true) + "AQEShuffleRead … skewed"
    split_on = "skew=true" in p_on and "skewed" in p_on
    split_off = "skew=true" in p_off
    print(f"skewJoin OFF: {t_off:.2f}s  plan skew-split: {split_off}")
    print(f"skewJoin ON : {t_on:.2f}s  plan skew-split: {split_on}")
    print(f"speedup: {t_off / t_on:.2f}x; results identical: True")
    for line in p_on.splitlines():
        ls = line.strip()
        if "AQEShuffleRead" in ls or "SortMergeJoin" in ls:
            print("  " + ls[:120])


if __name__ == "__main__":
    main()
