"""Seeded differential fuzzing: generated ANSI queries run on BOTH
engines and must agree row-for-row — the randomized complement to the
182 hand-written oracle queries (the reference gets this class of
coverage from GMS enginetests + sqllogictest files, main_test.go
TestSQLLogicTests; SURVEY §5).

The generator is DETERMINISTIC (fixed seed): failures reproduce, and a
regression in either engine's shim surfaces as a stable query id. The
grammar stays inside the determinism contract of the oracle gate:
integer aggregates cast to BIGINT, no AVG/float sums, no LIMIT without
a total order (the comparator sorts rows, so ORDER BY is unnecessary).
"""

import random

import duckdb
import pytest

from myduckserver_spark.oracle import compare_one
from myduckserver_spark.tables import load_table

SEED = 20260814
N_QUERIES = 60

# (table, groupable cols, int cols for SUM, filterable numeric col +
# inclusive range, string col + values)
TABLES = {
    "orders": {
        "group": ["o_orderstatus", "o_orderpriority"],
        "int": ["o_orderkey", "o_custkey"],
        "num": ("o_orderkey", 1, 6000),
        "str": ("o_orderstatus", ["O", "F", "P"]),
    },
    "customer": {
        "group": ["c_mktsegment", "c_nationkey"],
        "int": ["c_custkey", "c_nationkey"],
        "num": ("c_custkey", 1, 1500),
        "str": ("c_mktsegment",
                ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
                 "FURNITURE"]),
    },
    "lineitem": {
        "group": ["l_returnflag", "l_linestatus"],
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "num": ("l_orderkey", 1, 6000),
        "str": ("l_returnflag", ["A", "N", "R"]),
    },
}


def _gen_join_query(rng: random.Random) -> str:
    """orders⋈customer or lineitem⋈orders with grouping on either side."""
    if rng.random() < 0.5:
        frm = "orders JOIN customer ON o_custkey = c_custkey"
        gcols = rng.sample(
            ["c_mktsegment", "c_nationkey", "o_orderstatus"],
            rng.randint(1, 2),
        )
        scol = rng.choice(["o_orderkey", "c_custkey"])
        a, b = sorted((rng.randint(1, 6000), rng.randint(1, 6000)))
        pred = f"o_orderkey BETWEEN {a} AND {b}"
    else:
        frm = "lineitem JOIN orders ON l_orderkey = o_orderkey"
        gcols = rng.sample(
            ["l_returnflag", "o_orderstatus", "l_linestatus"],
            rng.randint(1, 2),
        )
        scol = rng.choice(["l_partkey", "l_suppkey", "o_custkey"])
        a, b = sorted((rng.randint(1, 6000), rng.randint(1, 6000)))
        pred = f"l_orderkey BETWEEN {a} AND {b}"
    cols = ", ".join(gcols)
    return (
        f"SELECT {cols}, CAST(COUNT(*) AS BIGINT) AS cnt, "
        f"CAST(SUM({scol}) AS BIGINT) AS s "
        f"FROM {frm} WHERE {pred} GROUP BY {cols}"
    )


def _gen_query(rng: random.Random) -> str:
    if rng.random() < 0.3:
        return _gen_join_query(rng)
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    gcols = rng.sample(spec["group"], rng.randint(1, len(spec["group"])))
    scol = rng.choice(spec["int"])
    ncol, lo, hi = spec["num"]
    a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    preds = [f"{ncol} BETWEEN {a} AND {b}"]
    if rng.random() < 0.5:
        col, vals = spec["str"]
        chosen = rng.sample(vals, rng.randint(1, min(2, len(vals))))
        inlist = ", ".join(f"'{v}'" for v in chosen)
        neg = "NOT " if rng.random() < 0.3 else ""
        preds.append(f"{col} {neg}IN ({inlist})")
    if rng.random() < 0.3:
        icol = rng.choice(spec["int"])
        preds.append(f"{icol} % {rng.randint(2, 7)} = 0")
    having = ""
    if rng.random() < 0.4:
        having = f" HAVING COUNT(*) >= {rng.randint(1, 3)}"
    cols = ", ".join(gcols)
    return (
        f"SELECT {cols}, CAST(COUNT(*) AS BIGINT) AS cnt, "
        f"CAST(SUM({scol}) AS BIGINT) AS s, "
        f"CAST(MIN({scol}) AS BIGINT) AS mn, "
        f"CAST(MAX({scol}) AS BIGINT) AS mx "
        f"FROM {t} WHERE {' AND '.join(preds)} "
        f"GROUP BY {cols}{having}"
    )


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return sf_dir


def test_differential_fuzz_corpus(spark, views):
    rng = random.Random(SEED)
    failures = []
    for i in range(N_QUERIES):
        sql = _gen_query(rng)
        res = compare_one(
            spark, f"fuzz_{i}", lambda sp, sf, q=sql: sp.sql(q), sql, views
        )
        if not res.ok:
            failures.append((i, sql, res.detail))
    assert not failures, failures[:3]


def test_fuzz_generator_is_deterministic():
    a = [_gen_query(random.Random(SEED)) for _ in range(3)]
    b = [_gen_query(random.Random(SEED)) for _ in range(3)]
    assert a == b
