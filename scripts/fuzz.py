#!/usr/bin/env python
"""Grammar-random differential fuzz sweep: N composed query trees
(joins × aggregates × windows × set-ops × subqueries, qgen.py) run on
Spark AND DuckDB; any row/value disagreement is shrunk to its minimal
failing subtree and printed with the seed for pinning.

    python scripts/fuzz.py --n 500 --seed 20260815 --sf sf0.01

Mirrors the reference's randomized engine coverage (GMS enginetests /
sqllogictest with a skip-list, main_test.go:213-397): known cross-
engine seams are excluded by the generator's determinism contract
(qgen.py docstring), not by ignoring failures.
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myduckserver_spark import qgen  # noqa: E402
from myduckserver_spark.oracle import compare_one  # noqa: E402
from myduckserver_spark.session import build_session  # noqa: E402
from myduckserver_spark.tables import load_table  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--sf", default="sf0.01")
    args = ap.parse_args()

    sf_dir = os.path.join("/root/testdata", args.sf)
    spark = build_session(master="local[8]", shuffle_partitions=8)
    for t in ("orders", "customer", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

    from myduckserver_spark.functions.mysql_compat import translate_mysql

    def run(sql: str, name: str):
        # Spark side goes through the MySQL front door (the product
        # path); tree SQL is dialect-common, so for most trees this is
        # the identity — it matters for the quantified ANY/ALL forms,
        # which DuckDB runs natively and Spark needs rewritten.
        return compare_one(
            spark, name,
            lambda sp, sf, q=translate_mysql(sql): sp.sql(q),
            sql, sf_dir,
        )

    rng = random.Random(args.seed)
    t0 = time.time()
    failures = 0
    for i in range(args.n):
        tree = qgen.gen_tree(rng, depth=args.depth)
        res = run(tree.sql(), f"tree_{i}")
        if res.ok:
            if (i + 1) % 50 == 0:
                print(f"  {i + 1}/{args.n} ok "
                      f"({time.time() - t0:.0f}s)", flush=True)
            continue
        failures += 1
        minimal = qgen.shrink(
            tree, lambda sub, j=i: not run(sub.sql(), f"shrink_{j}").ok
        )
        print(f"FAIL tree {i} (seed {args.seed}):")
        print(f"  detail: {res.detail.splitlines()[0][:200]}")
        print(f"  minimal subtree SQL:\n    {minimal.sql()}")
    dt = time.time() - t0
    print(f"{args.n - failures}/{args.n} green in {dt:.1f}s "
          f"(seed {args.seed}, depth {args.depth}, {args.sf})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
