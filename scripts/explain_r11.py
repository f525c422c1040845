#!/usr/bin/env python
"""Capture .explain('formatted') for headline (or named) queries into
plans/r11/<query>_<tag>.txt — the optimization-round plan evidence.

Usage: python scripts/explain_r11.py before [query ...]
       python scripts/explain_r11.py after  [query ...]

Runs under the same warm_cache + serving_profile state the bench uses,
so the captured plans are the plans the bench actually executes.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myduckserver_spark.plans.registry import REGISTRY, all_queries
from myduckserver_spark.session import build_session
from myduckserver_spark.tables import serving_profile, warm_cache

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q10_returned_items", "q18_large_volume_orders",
    "q13_customer_distribution", "w_top3_orders_per_customer",
    "ev_sessionize", "dd_exact", "dd_minhash_lsh", "sim_topk_bruteforce",
    "tx_quality_score",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="explain_r11")
    all_queries()
    warm_cache(spark, sf_dir)
    serving_profile(spark, sf_dir)
    import contextlib
    import io

    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
