"""Timed sweep of every queries() entry at a given SF dir.

Usage: python scripts/sweep.py [sf_dir]
Prints per-query wall seconds sorted slowest-first, then the total.
One warm pass per query (codegen is shape-keyed), then one timed pass.
"""

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from myduckserver_spark.session import build_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(
        app_name="sweep", extra_conf={"spark.driver.memory": "16g"}
    )
    qs = entry_mod.queries()
    print(f"{len(qs)} queries @ {sf_dir}", flush=True)
    times = {}
    for name, fn in qs.items():
        try:
            fn(spark, sf_dir).collect()  # warm: JIT/codegen + scan cache
            t0 = time.monotonic()
            n = len(fn(spark, sf_dir).collect())
            dt = time.monotonic() - t0
            times[name] = dt
            print(f"  {name}: {dt:.2f}s ({n} rows)", flush=True)
        except Exception as exc:  # noqa: BLE001 - sweep must survive one bad query
            print(f"  {name}: FAILED {type(exc).__name__}: {exc}", flush=True)
            times[name] = float("nan")
    print("\n== slowest ==")
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {name}: {dt:.2f}s")
    print(f"TOTAL: {sum(v for v in times.values() if v == v):.1f}s")


if __name__ == "__main__":
    main()
