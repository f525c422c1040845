"""Pre-flight sweep: run EVERY registered query against its DuckDB
oracle with the driver-faithful comparer (myduckserver_spark/oracle.py).

This is the builder's local replica of the driver's CORRECTNESS gate —
run it before committing query changes:

    python scripts/sweep.py                 # all queries at sf0.01
    python scripts/sweep.py --sf sf0.001    # faster, smaller data
    python scripts/sweep.py --only q1 dd_   # name-prefix filter

Exit code 1 if anything fails; prints a one-line verdict per query and
a failure digest at the end.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    # enforce the bounded-cardinality contract of ordered_bounded on
    # every sweep (helpers.ordered_bounded counts its result under
    # this; a proportional result slipping into the 1-task sort is a
    # scale bug the sweep should catch, not ship)
    os.environ.setdefault("MDS_ASSERT_BOUNDED", "100000")
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01", help="scale dir under /root/testdata")
    ap.add_argument("--only", nargs="*", default=None, help="name prefixes to run")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()
    sf_dir = (
        args.sf if os.path.isdir(args.sf) else os.path.join("/root/testdata", args.sf)
    )

    from myduckserver_spark.oracle import compare_one
    from myduckserver_spark.plans.registry import REGISTRY, all_queries
    from myduckserver_spark.session import build_session

    # Round-4 invariant: the sweep runs with ZERO "No Partition
    # Defined" warnings (a single-partition window in any query plan is
    # a 100 TB scale bug). Capture the JVM's stderr (log4j writes to
    # fd 2, inherited at JVM launch) so a regression FAILS the sweep
    # instead of scrolling by.
    import tempfile

    real_stderr = os.dup(2)
    errlog = tempfile.NamedTemporaryFile(
        prefix="sweep_err_", suffix=".log", delete=False
    )
    os.dup2(errlog.fileno(), 2)

    all_queries()  # trigger registrations
    spark = build_session()
    names = list(REGISTRY)
    if args.only:
        names = [n for n in names if any(n.startswith(p) for p in args.only)]

    failures: list[tuple[str, str]] = []
    t_all = time.time()
    for i, name in enumerate(names):
        q = REGISTRY[name]
        t0 = time.time()
        try:
            r = compare_one(spark, name, q.spark, q.oracle, sf_dir)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures.append((name, f"EXCEPTION: {e}"))
            print(f"[{i+1:3}/{len(names)}] {name:36} ERROR  {e}")
            continue
        dt_q = time.time() - t0
        status = "ok" if r.ok else "FAIL"
        if not r.ok:
            failures.append((name, r.detail))
        if not args.quiet or not r.ok:
            print(
                f"[{i+1:3}/{len(names)}] {name:36} {status:5} "
                f"{r.spark_rows:>7} rows  {dt_q:5.2f}s"
            )
    os.dup2(real_stderr, 2)
    os.close(real_stderr)
    with open(errlog.name, errors="replace") as f:
        errtext = f.read()
    os.unlink(errlog.name)
    n_warn = errtext.count("No Partition Defined")
    if n_warn:
        lines = [
            ln for ln in errtext.splitlines() if "No Partition Defined" in ln
        ]
        failures.append(
            ("__zero_window_warnings__",
             f"{n_warn} single-partition window warning(s):\n"
             + "\n".join(lines[:5]))
        )
    # Round-7 invariant: zero HintErrorLogger lines — an unresolved
    # join hint means a serving-profile plan pin silently did nothing
    # (the round-6 q13 BROADCAST(oc) defect). Fail loudly instead.
    n_hint = errtext.count("HintErrorLogger")
    if n_hint:
        lines = [ln for ln in errtext.splitlines() if "HintErrorLogger" in ln]
        failures.append(
            ("__zero_unbound_hints__",
             f"{n_hint} unresolved join-hint warning(s):\n"
             + "\n".join(lines[:5]))
        )
    print(
        f"\n{len(names) - len(failures)}/{len(names)} green "
        f"in {time.time() - t_all:.1f}s at {sf_dir}"
    )
    for name, detail in failures:
        print(f"\n=== {name} ===\n{detail[:2000]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
