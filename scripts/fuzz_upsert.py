#!/usr/bin/env python
"""Conditional-upsert differential fuzz (round 10): randomized
``INSERT ... ON CONFLICT (pk) DO UPDATE SET ... WHERE cond`` batches
run through the engine's pg door AND verbatim on DuckDB (which
implements pg's conditional upsert natively); final table states must
match. Batches keep intra-batch keys unique — pg (and this engine)
reject a stored row affected twice.

    python scripts/fuzz_upsert.py --n 30 --seed 20260817
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from myduckserver_spark.engine import Engine  # noqa: E402
from myduckserver_spark.session import build_session  # noqa: E402

CONDS = [
    "t.a < {k}",
    "t.a >= {k}",
    "excluded.a > {k}",
    "excluded.a <> t.a",
    "t.b < excluded.b",
    "t.a + excluded.a > {k}",
]
ASSIGNS = [
    "a = excluded.a",
    "a = t.a + excluded.a",
    "b = excluded.b",
    "a = excluded.a, b = excluded.b",
    "b = t.b || excluded.b",
]


def gen_stmts(rng: random.Random) -> tuple[str, list[str]]:
    seed_ids = rng.sample(range(1, 10), rng.randint(2, 5))
    seed_rows = ", ".join(
        f"({i}, {rng.randint(0, 9)}, '{rng.choice('xyzw')}')"
        for i in seed_ids
    )
    seed = f"INSERT INTO t VALUES {seed_rows}"
    stmts = []
    for _ in range(rng.randint(1, 3)):
        ids = rng.sample(range(1, 12), rng.randint(1, 4))
        rows = ", ".join(
            f"({i}, {rng.randint(0, 9)}, '{rng.choice('xyzw')}')"
            for i in ids
        )
        cond = rng.choice(CONDS).format(k=rng.randint(0, 9))
        assign = rng.choice(ASSIGNS)
        stmts.append(
            f"INSERT INTO t VALUES {rows} ON CONFLICT (id) "
            f"DO UPDATE SET {assign} WHERE {cond}"
        )
    return seed, stmts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--seed", type=int, default=20260817)
    args = ap.parse_args()
    rng = random.Random(args.seed)

    spark = build_session(app_name="fuzz_upsert", master="local[8]",
                         shuffle_partitions=8)
    bad = 0
    for trial in range(args.n):
        seed, stmts = gen_stmts(rng)
        wh = tempfile.mkdtemp(prefix="fuzz_upsert_")
        eng = Engine(spark, wh)
        con = duckdb.connect()
        ddl = "CREATE TABLE t (id INT PRIMARY KEY, a INT, b TEXT)"
        eng.execute(ddl)
        con.sql(ddl)
        # DuckDB spells the stored row with the table name; the
        # engine accepts the same `t.` spelling — run identical text
        ok = True
        for stmt in [seed] + stmts:
            try:
                eng.execute(stmt, dialect="postgres")
                con.sql(stmt)
            except Exception as ex:
                print(f"ERR #{trial}: {stmt}\n  "
                      f"{type(ex).__name__}: {str(ex)[:200]}")
                ok = False
                break
        if ok:
            got = sorted(tuple(r) for r in eng.sql(
                "SELECT id, a, b FROM t").collect())
            want = sorted(tuple(r) for r in con.sql(
                "SELECT id, a, b FROM t").fetchall())
            if got != want:
                print(f"DIVERGE #{trial}:")
                for s in [seed] + stmts:
                    print("   ", s)
                print(f"  engine={got}\n  duckdb={want}")
                bad += 1
        else:
            bad += 1
        con.close()
        shutil.rmtree(wh, ignore_errors=True)
        if (trial + 1) % 10 == 0:
            print(f"  {trial + 1}/{args.n}", flush=True)
    print(f"{args.n - bad}/{args.n} green (seed {args.seed})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
