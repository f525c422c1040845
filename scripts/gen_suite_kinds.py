"""Generate myduckserver_spark/plans/suite_kinds.json: for every
registered query's oracle SQL, probe DuckDB (LIMIT 0) for the output
column types and reduce them to the canonical "kind" vocabulary the
suite fingerprint builder (plans/suites.py) understands.

Run after adding/changing any query that participates in a suite:

    python scripts/gen_suite_kinds.py

The JSON is committed so import never probes data files.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "myduckserver_spark",
    "plans",
    "suite_kinds.json",
)


def kind_of(duck_type: str) -> str:
    t = str(duck_type).upper()
    if t.endswith("[]"):
        inner = kind_of(t[:-2])
        return {"int": "arrint", "dbl": "arrdbl", "str": "arrstr"}[inner]
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UBIGINT",
             "UINTEGER", "USMALLINT", "UTINYINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "dbl"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "ts"
    if t in ("VARCHAR", "TEXT", "STRING", "UUID"):
        return "str"
    if t == "BLOB":
        return "bin"
    if t.startswith("DECIMAL"):
        return "DECIMAL!"  # forbidden at the output seam — fix the query
    return f"?{t}"


def main() -> int:
    from myduckserver_spark.oracle import duckdb_conn
    from myduckserver_spark.plans.registry import REGISTRY, load_plan_modules

    load_plan_modules()
    con = duckdb_conn(SF_DIR)
    kinds: dict[str, dict[str, str]] = {}
    bad = []
    for name, q in REGISTRY.items():
        if q.oracle is None or name.startswith("suite_"):
            continue
        try:
            rel = con.sql(f"SELECT * FROM (\n{q.oracle}\n) LIMIT 0")
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"probe failed: {e}"))
            continue
        colkinds = {}
        for c, t in zip(rel.columns, rel.types):
            k = kind_of(t)
            if k.startswith("?") or k.endswith("!"):
                bad.append((name, f"column {c}: unsupported type {t} ({k})"))
            colkinds[c] = k
        kinds[name] = colkinds
    con.close()
    with open(OUT, "w") as f:
        json.dump(kinds, f, indent=1, sort_keys=True)
    print(f"wrote {len(kinds)} query kind maps to {OUT}")
    for name, msg in bad:
        print(f"WARN {name}: {msg}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
