#!/usr/bin/env python
"""Differential DML-sequence fuzz campaign: N random write programs
(INSERT / IGNORE / REPLACE / ON DUPLICATE KEY / UPDATE / DELETE,
myduckserver_spark/dmlgen.py) applied through the Engine AND DuckDB;
any per-statement error divergence or final-state mismatch is shrunk
to a minimal failing sequence and printed with its seed.

    python scripts/fuzz_dml.py --n 200 --seed 20260815 --stmts 8
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from myduckserver_spark import dmlgen  # noqa: E402
from myduckserver_spark.engine import Engine  # noqa: E402
from myduckserver_spark.session import build_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=20260815)
    ap.add_argument("--stmts", type=int, default=8)
    ap.add_argument(
        "--on-dup-batches", type=int, default=0,
        help="additionally run N ON DUPLICATE batch-vs-rowwise trials "
             "(engine-internal oracle: single-row set-based tier "
             "replayed sequentially vs the batch sequential tier)",
    )
    ap.add_argument(
        "--composite", type=int, default=0,
        help="additionally run N composite-PK sequences (tuple-keyed "
             "probes, ON DUP, REPLACE, and ORDER BY ... LIMIT DML — "
             "DuckDB oracles LIMIT via a tuple-IN subquery)",
    )
    ap.add_argument(
        "--triggered", type=int, default=0,
        help="additionally run N trigger-bearing sequences (engine "
             "runs real AFTER triggers; DuckDB runs a per-statement "
             "emulation; base table + audit trail compared)",
    )
    args = ap.parse_args()

    spark = build_session(master="local[8]", shuffle_partitions=8)
    eng = Engine(spark, tempfile.mkdtemp(prefix="fuzz_dml_wh_"))
    duck = duckdb.connect()

    rng = random.Random(args.seed)
    t0 = time.time()
    bad = 0
    for trial in range(args.n):
        table = f"fz{trial}"
        uniq = trial % 3 == 2   # every third sequence: UNIQUE-index table
        multi = trial % 3 == 1  # every third: multi-table JOIN DML axis
        if multi:
            seq = dmlgen.gen_sequence_multi(rng, table, n_stmts=args.stmts)
        else:
            seq = dmlgen.gen_sequence(rng, table, n_stmts=args.stmts,
                                      with_unique=uniq)
        ok, detail = dmlgen.apply_pair(eng, duck, table, seq, uniq, multi)
        if not ok:
            bad += 1
            small = dmlgen.shrink(eng, duck, table, seq, uniq, multi)
            _, sdetail = dmlgen.apply_pair(
                eng, duck, table, small, uniq, multi)
            print(f"DIVERGENCE trial={trial} seed={args.seed}")
            print(f"  {detail}")
            print("  minimal sequence:")
            for my, du in small:
                print(f"    mysql: {my}")
                if du != my:
                    print(f"    duck : {du}")
            print(f"  minimal detail: {sdetail}")
        if (trial + 1) % 20 == 0:
            print(
                f"[{trial + 1}/{args.n}] {bad} divergences, "
                f"{time.time() - t0:.0f}s",
                flush=True,
            )
    for trial in range(args.on_dup_batches):
        uniq = trial % 2 == 1
        seed, batch, singles = dmlgen.gen_on_dup_batch(
            rng, f"od{trial}", with_unique=uniq)
        ok, detail = dmlgen.apply_batch_vs_rowwise(
            eng, f"od{trial}", seed, batch, singles, with_unique=uniq)
        if not ok:
            bad += 1
            print(f"ON-DUP DIVERGENCE trial={trial} seed={args.seed} "
                  f"uniq={uniq}")
            print(f"  seed sql: {seed}")
            print(f"  {detail}")
        if (trial + 1) % 20 == 0:
            print(f"[on_dup {trial + 1}/{args.on_dup_batches}] "
                  f"{bad} divergences, {time.time() - t0:.0f}s",
                  flush=True)
    for trial in range(args.composite):
        table = f"ck{trial}"
        seq = dmlgen.gen_sequence_ck(rng, table, n_stmts=args.stmts)
        ok, detail = dmlgen.apply_pair(
            eng, duck, table, seq, ck=True)
        if not ok:
            bad += 1
            small = dmlgen.shrink(eng, duck, table, seq, ck=True)
            _, sdetail = dmlgen.apply_pair(
                eng, duck, table, small, ck=True)
            print(f"COMPOSITE DIVERGENCE trial={trial} "
                  f"seed={args.seed}")
            print(f"  {detail}")
            print("  minimal sequence:")
            for my, du in small:
                print(f"    mysql: {my}")
                if du != my:
                    print(f"    duck : {du}")
            print(f"  minimal detail: {sdetail}")
        if (trial + 1) % 20 == 0:
            print(f"[composite {trial + 1}/{args.composite}] "
                  f"{bad} divergences, {time.time() - t0:.0f}s",
                  flush=True)
    for trial in range(args.triggered):
        table = f"tz{trial}"
        seq = dmlgen.gen_sequence_triggered(rng, table,
                                            n_stmts=args.stmts)
        ok, detail = dmlgen.apply_triggered_pair(eng, duck, table, seq)
        if not ok:
            bad += 1
            print(f"TRIGGERED DIVERGENCE trial={trial} "
                  f"seed={args.seed}")
            print(f"  {detail}")
            for my, _du, _c in seq:
                print(f"    mysql: {my}")
        if (trial + 1) % 20 == 0:
            print(f"[triggered {trial + 1}/{args.triggered}] "
                  f"{bad} divergences, {time.time() - t0:.0f}s",
                  flush=True)
    print(f"done: {args.n} sequences + {args.on_dup_batches} on-dup "
          f"batches + {args.composite} composite + {args.triggered} "
          f"triggered, {bad} divergences, {time.time() - t0:.0f}s")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
