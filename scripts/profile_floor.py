#!/usr/bin/env python
"""Profile the fresh-path serving floor: split per-query wall time into
plan-build (Python/Py4J DataFrame construction), toPandas total, and
count the Spark jobs each query launches.

Usage: python scripts/profile_floor.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myduckserver_spark.plans.registry import REGISTRY, all_queries
from myduckserver_spark.session import build_session
from myduckserver_spark.tables import serving_profile, warm_cache

QUERIES = sys.argv[1:] or [
    "q13_customer_distribution", "dd_exact", "ev_sessionize",
    "w_top3_orders_per_customer", "q5_local_supplier_volume",
    "sim_topk_bruteforce", "q1_pricing_summary", "tx_quality_score",
    "q3_shipping_priority", "q6_forecast_revenue", "q10_returned_items",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="profile_floor")
    all_queries()
    warm_cache(spark, sf_dir)
    serving_profile(spark, sf_dir)
    sc = spark.sparkContext
    tracker = sc.statusTracker

    for _ in range(3):
        for name in QUERIES:
            REGISTRY[name].spark(spark, sf_dir).toPandas()

    print(f"{'query':34s} {'build':>7s} {'exec':>7s} {'total':>7s} {'jobs':>5s}")
    for name in QUERIES:
        bs, es, js = [], [], []
        for _ in range(5):
            j0 = len(tracker().getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = REGISTRY[name].spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            j1 = len(tracker().getJobIdsForGroup(None) or [])
            bs.append(t1 - t0)
            es.append(t2 - t1)
            js.append(j1 - j0)
        bs.sort(); es.sort()
        print(f"{name:34s} {bs[2]*1e3:6.1f}m {es[2]*1e3:6.1f}m "
              f"{(bs[2]+es[2])*1e3:6.1f}m {js[2]:5d}")


if __name__ == "__main__":
    main()
