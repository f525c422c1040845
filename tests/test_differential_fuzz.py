"""Seeded differential fuzzing: generated ANSI queries run on BOTH
engines and must agree row-for-row — the randomized complement to the
185 hand-written oracle queries (the reference gets this class of
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
N_QUERIES = 120

# Unique-per-row ordering keys per table: every window ORDER BY ends
# with one of these so rank/row_number are deterministic on both
# engines (ties would otherwise make the comparison flaky, not wrong).
UNIQUE_ORDER = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "lineitem": "l_orderkey, l_linenumber",
}

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


def _gen_window_query(rng: random.Random) -> str:
    """row_number/rank/dense_rank + running SUM over a deterministic
    total order (partition key + unique tiebreaker)."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    part = rng.choice(spec["group"])
    scol = rng.choice(spec["int"])
    ncol, lo, hi = spec["num"]
    a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    uniq = UNIQUE_ORDER[t]
    fn = rng.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
    return (
        f"SELECT {part}, CAST({fn} OVER "
        f"(PARTITION BY {part} ORDER BY {scol}, {uniq}) AS BIGINT) AS rk, "
        f"CAST(SUM({scol}) OVER "
        f"(PARTITION BY {part} ORDER BY {scol}, {uniq} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs, "
        f"CAST({scol} AS BIGINT) AS v "
        f"FROM {t} WHERE {ncol} BETWEEN {a} AND {b}"
    )


def _gen_grouping_query(rng: random.Random) -> str:
    """ROLLUP / CUBE / GROUPING SETS with GROUPING() disambiguation —
    the NULL-vs-subtotal seam that bit round 1's hand-written set.

    Known engine divergence, excluded by ``HAVING COUNT(*) > 0``: on
    EMPTY input (the WHERE range matches no rows) DuckDB still emits
    the ``()`` grouping-set grand-total row (COUNT=0, per the SQL
    standard's scalar-aggregate rule), while Spark returns zero rows.
    Every non-empty group has COUNT >= 1, so the predicate only drops
    that divergent row and both engines agree on everything else."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    if len(spec["group"]) < 2:
        g1, g2 = spec["group"][0], spec["group"][0]
    else:
        g1, g2 = rng.sample(spec["group"], 2)
    scol = rng.choice(spec["int"])
    ncol, lo, hi = spec["num"]
    a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    shape = rng.choice([
        f"ROLLUP({g1}, {g2})",
        f"CUBE({g1}, {g2})",
        f"GROUPING SETS (({g1}), ({g2}), ())",
    ])
    return (
        f"SELECT {g1}, {g2}, "
        f"CAST(GROUPING({g1}) AS BIGINT) AS gr1, "
        f"CAST(GROUPING({g2}) AS BIGINT) AS gr2, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt, "
        f"CAST(SUM({scol}) AS BIGINT) AS s "
        f"FROM {t} WHERE {ncol} BETWEEN {a} AND {b} "
        f"GROUP BY {shape} HAVING COUNT(*) > 0"
    )


def _gen_setop_query(rng: random.Random) -> str:
    """UNION / UNION ALL / INTERSECT / EXCEPT of two filtered slices of
    the same projection — both engines use identical distinct-set
    semantics for the non-ALL forms."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    gcol = rng.choice(spec["group"])
    icol = rng.choice(spec["int"])
    ncol, lo, hi = spec["num"]
    a1, b1 = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    a2, b2 = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    proj = f"{gcol}, CAST({icol} % 10 AS BIGINT) AS bucket"
    return (
        f"SELECT {proj} FROM {t} WHERE {ncol} BETWEEN {a1} AND {b1} "
        f"{op} "
        f"SELECT {proj} FROM {t} WHERE {ncol} BETWEEN {a2} AND {b2}"
    )


def _gen_exists_query(rng: random.Random) -> str:
    """Correlated EXISTS / NOT EXISTS (semi/anti join rewrites)."""
    neg = "NOT " if rng.random() < 0.5 else ""
    a, b = sorted((rng.randint(1, 6000), rng.randint(1, 6000)))
    if rng.random() < 0.5:
        return (
            f"SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt "
            f"FROM customer WHERE {neg}EXISTS (SELECT 1 FROM orders "
            f"WHERE o_custkey = c_custkey AND o_orderkey BETWEEN {a} AND {b}) "
            f"GROUP BY c_mktsegment"
        )
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM orders WHERE {neg}EXISTS (SELECT 1 FROM lineitem "
        f"WHERE l_orderkey = o_orderkey AND l_partkey BETWEEN {a} AND {b}) "
        f"GROUP BY o_orderstatus"
    )


def _gen_derived_query(rng: random.Random) -> str:
    """Aggregation over a derived table that itself LIMITs under a
    TOTAL order (unique key) — the nested-derived-table shape the
    transpiler hardening pins, with a deterministic row set."""
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    ncol, lo, hi = spec["num"]
    a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    g = rng.choice(spec["group"])
    scol = rng.choice(spec["int"])
    n = rng.randint(50, 500)
    return (
        f"SELECT {g}, CAST(COUNT(*) AS BIGINT) AS cnt, "
        f"CAST(SUM({scol}) AS BIGINT) AS s "
        f"FROM (SELECT {g}, {scol} FROM {t} "
        f"WHERE {ncol} BETWEEN {a} AND {b} "
        f"ORDER BY {UNIQUE_ORDER[t]} LIMIT {n}) d "
        f"GROUP BY {g}"
    )


def _gen_scalar_subquery(rng: random.Random) -> str:
    """Correlated scalar subquery in the select list (count/min of the
    child table per parent row) — Catalyst decorrelation vs DuckDB's
    native correlated evaluation."""
    a, b = sorted((rng.randint(1, 1500), rng.randint(1, 1500)))
    agg = rng.choice(
        ["COUNT(*)", "COALESCE(MIN(o_orderkey), 0)",
         "COALESCE(MAX(o_orderkey), 0)"]
    )
    return (
        f"SELECT c_custkey, CAST((SELECT {agg} FROM orders "
        f"WHERE o_custkey = c_custkey) AS BIGINT) AS sub "
        f"FROM customer WHERE c_custkey BETWEEN {a} AND {b}"
    )


def _gen_query(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.16:
        return _gen_join_query(rng)
    if r < 0.32:
        return _gen_window_query(rng)
    if r < 0.46:
        return _gen_grouping_query(rng)
    if r < 0.58:
        return _gen_setop_query(rng)
    if r < 0.66:
        return _gen_exists_query(rng)
    if r < 0.74:
        return _gen_derived_query(rng)
    if r < 0.80:
        return _gen_scalar_subquery(rng)
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


def test_empty_input_rollup_divergence_is_pinned(spark, views):
    """Document (not hide) the one seam the fuzzer excludes: ROLLUP
    over an empty input. DuckDB emits the () grand-total row with
    COUNT=0 (SQL-standard scalar-aggregate rule); Spark emits no rows.
    If either engine changes behavior this test flags it so the
    HAVING-based exclusion in _gen_grouping_query can be removed."""
    sql = (
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM customer WHERE c_custkey < 0 "
        "GROUP BY ROLLUP(c_mktsegment)"
    )
    assert spark.sql(sql).count() == 0
    con = duckdb.connect()
    import os

    con.sql(
        "CREATE VIEW customer AS SELECT * FROM read_parquet("
        f"'{os.path.join(views, 'customer.parquet')}')"
    )
    assert len(con.sql(sql).fetchall()) == 1
    con.close()


def test_topk_under_correlation_divergence_is_pinned(spark, views):
    """Document the round-7 seam the tree grammar excludes: Spark 4.1
    DROPS the ORDER BY of an ordered-LIMIT derived table when that
    relation feeds a correlated scalar subquery — the LIMIT then keeps
    ARBITRARY rows instead of the smallest (found by the round-7 tree
    fuzzer, shrunk to this shape; DuckDB returns the ordered prefix).
    qgen.gen_tree(allow_topk=False) excludes topk below correlations;
    if Spark fixes the planner this test flags it so the exclusion can
    be lifted."""
    import os

    xsrc = (
        "SELECT k, g FROM ("
        "SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS k, "
        "CAST(l_returnflag AS STRING) AS g FROM lineitem "
        "UNION SELECT CAST(k AS BIGINT), CAST(g AS STRING) "
        "FROM (VALUES (6, 'c')) AS t(k, g)"
        ") ORDER BY k, g LIMIT 10"
    )
    q = (
        f"SELECT x.k, (SELECT COUNT(*) FROM ({xsrc}) y "
        f"WHERE y.g = x.g) AS c FROM ({xsrc}) x"
    )
    spark_ks = sorted(r.k for r in spark.sql(q).collect())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
        f"'{os.path.join(views, 'lineitem.parquet')}')"
    )
    duck_ks = sorted(r[0] for r in con.sql(q).fetchall())
    con.close()
    # DuckDB keeps the ordered prefix; Spark's outer x lost its sort
    assert len(spark_ks) == len(duck_ks) == 10
    assert spark_ks != duck_ks, (
        "Spark now preserves ordered-LIMIT under correlation — lift "
        "the allow_topk=False exclusion in qgen.gen_tree"
    )


# ---- MySQL-dialect decoration fuzz (round-5 structural pass) ----
#
# Same differential contract, but the Spark side goes through the FULL
# MySQL front door (translate_mysql) with randomized MySQL-only
# decorations — index hints, SELECT modifiers, version comments,
# LOCK IN SHARE MODE, # comments — while the DuckDB oracle runs the
# clean ANSI form. Any decoration the structural pass mishandles
# surfaces as a row mismatch or an analysis error.

N_MYSQL_QUERIES = 40


def _gen_mysql_pair(rng: random.Random) -> tuple[str, str]:
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    gcols = rng.sample(spec["group"], rng.randint(1, len(spec["group"])))
    scol = rng.choice(spec["int"])
    ncol, lo, hi = spec["num"]
    a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    pred = f"{ncol} BETWEEN {a} AND {b}"
    cols = ", ".join(gcols)

    mod = rng.choice(
        ["", "DISTINCTROW ", "STRAIGHT_JOIN ", "SQL_NO_CACHE ",
         "HIGH_PRIORITY ", "SQL_CALC_FOUND_ROWS "]
    )
    hint = rng.choice(
        ["", " USE INDEX (i1)", " IGNORE INDEX (i1, i2)",
         " FORCE KEY (ix)", " USE INDEX FOR ORDER BY (i1)",
         " USE KEY FOR GROUP BY (i1)"]
    )
    count_expr = "COUNT(*)"
    if rng.random() < 0.4:
        count_expr = f"/*!40000 {count_expr} */"
    tail = rng.choice(["", " LOCK IN SHARE MODE"])
    comment = rng.choice(["", "  # trailing mysql comment"])

    # round-5 expression-operator forms: infix MOD and a COLLATE
    # clause on the first group column (both MySQL-only spellings;
    # the oracle runs the ANSI equivalent)
    pred_deco, pred_clean = pred, pred
    if rng.random() < 0.5:
        mdiv = rng.randint(2, 9)
        mres = rng.randint(0, mdiv - 1)
        pred_deco += f" AND ({scol} MOD {mdiv}) <> {mres}"
        pred_clean += f" AND ({scol} % {mdiv}) <> {mres}"
    sel_deco = cols
    if rng.random() < 0.4:
        first = gcols[0]
        sel_deco = ", ".join(
            [f"{first} COLLATE utf8mb4_bin AS {first}"] + gcols[1:]
        )

    decorated = (
        f"SELECT {mod}{sel_deco}, CAST({count_expr} AS BIGINT) AS cnt, "
        f"CAST(SUM({scol}) AS BIGINT) AS s "
        f"FROM {t}{hint} WHERE {pred_deco} "
        f"GROUP BY {cols}{tail}{comment}"
    )
    clean = (
        f"SELECT {cols}, CAST(COUNT(*) AS BIGINT) AS cnt, "
        f"CAST(SUM({scol}) AS BIGINT) AS s "
        f"FROM {t} WHERE {pred_clean} GROUP BY {cols}"
    )
    return decorated, clean


def test_differential_fuzz_mysql_dialect(spark, views):
    from myduckserver_spark.statements import strip_comments
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    rng = random.Random(SEED + 1)
    failures = []
    for i in range(N_MYSQL_QUERIES):
        decorated, clean = _gen_mysql_pair(rng)
        spark_sql = translate_mysql(strip_comments(decorated))
        res = compare_one(
            spark, f"myfuzz_{i}",
            lambda sp, sf, q=spark_sql: sp.sql(q), clean, views,
        )
        if not res.ok:
            failures.append((i, decorated, res.detail))
    assert not failures, failures[:3]


# ---- Postgres-dialect fuzz (round-5 pg front door) ----
#
# DuckDB natively speaks the Postgres dialect, so the oracle runs the
# DECORATED text verbatim while the Spark side goes through
# translate_postgres — any pg spelling the translator mishandles
# surfaces as a row mismatch or an analysis error.

N_PG_QUERIES = 60


def _gen_pg_query(rng: random.Random) -> str:
    t = rng.choice(list(TABLES))
    spec = TABLES[t]
    gcols = rng.sample(spec["group"], rng.randint(1, len(spec["group"])))
    scol = rng.choice(spec["int"])
    ncol, lo, hi = spec["num"]
    a, b = sorted((rng.randint(lo, hi), rng.randint(lo, hi)))
    cols = ", ".join(gcols)
    scolref = f"{scol}::bigint" if rng.random() < 0.5 else scol
    pred = f"{ncol} BETWEEN {a} AND {b}"
    strcol, vals = spec["str"]
    if rng.random() < 0.5:
        v = rng.choice(vals)
        op = rng.choice(["~", "ILIKE"])  # DuckDB has no ~* operator
        pat = f"'^{v[:2]}'" if op == "~" else f"'{v[:2]}%'"
        pred += f" AND {strcol} {op} {pat}"
    # aggregate FILTER (WHERE …) — pg/standard spelling (round 6)
    filt = ""
    if rng.random() < 0.4:
        mid = (lo + hi) // 2
        filt = (
            f", CAST(COUNT(*) FILTER (WHERE {ncol} >= {mid}) "
            f"AS BIGINT) AS fc"
        )
    having = ""
    if rng.random() < 0.4:
        having = f" HAVING COUNT(*) >= {rng.randint(1, 3)}"
    q = (
        f"SELECT {cols}, CAST(COUNT(*) AS BIGINT) AS cnt, "
        f"CAST(SUM({scolref}) AS BIGINT) AS s{filt} "
        f"FROM {t} WHERE {pred} GROUP BY {cols}{having}"
    )
    shape = rng.random()
    if shape < 0.25:
        # pg spelling of LIMIT over a total order
        q = (
            f"SELECT * FROM ({q}) sub ORDER BY cnt DESC, {gcols[0]} "
            f"FETCH FIRST {rng.randint(2, 6)} ROWS ONLY"
        )
    elif shape < 0.45:
        # correlated LATERAL over the grouped derived table (round 6)
        g0 = gcols[0]
        q = (
            f"SELECT sub.*, l.mx FROM ({q}) sub, "
            f"LATERAL (SELECT CAST(MAX({scol}) AS BIGINT) AS mx "
            f"FROM {t} i WHERE i.{g0} = sub.{g0}) l"
        )
    return q


def test_differential_fuzz_pg_dialect(spark, views):
    from myduckserver_spark.functions.pg_compat import translate_postgres

    rng = random.Random(SEED + 2)
    failures = []
    for i in range(N_PG_QUERIES):
        pg_sql = _gen_pg_query(rng)
        spark_sql = translate_postgres(pg_sql)
        res = compare_one(
            spark, f"pgfuzz_{i}",
            lambda sp, sf, q=spark_sql: sp.sql(q), pg_sql, views,
        )
        if not res.ok:
            failures.append((i, pg_sql, res.detail))
    assert not failures, failures[:3]


# ---- Grammar-random query TREES (round 6) ----
#
# qgen.py composes joins × aggregates × windows × set-ops × subqueries
# into random trees under a canonical (k, g, v) schema; scripts/fuzz.py
# is the ≥500-tree sweep, this is the CI slice.

N_TREES = 120


def test_differential_fuzz_query_trees(spark, views):
    from myduckserver_spark import qgen
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    rng = random.Random(SEED + 3)
    failures = []
    for i in range(N_TREES):
        tree = qgen.gen_tree(rng, depth=3)
        sql = tree.sql()
        # Spark side through the MySQL front door (identity for
        # dialect-common trees; rewrites the quantified ANY/ALL forms)
        res = compare_one(
            spark, f"tree_{i}",
            lambda sp, sf, q=translate_mysql(sql): sp.sql(q), sql, views
        )
        if not res.ok:
            minimal = qgen.shrink(
                tree,
                lambda sub: not compare_one(
                    spark, "shrink",
                    lambda sp, sf, q=translate_mysql(sub.sql()): sp.sql(q),
                    sub.sql(), views,
                ).ok,
            )
            failures.append((i, minimal.sql(), res.detail[:200]))
    assert not failures, failures[:3]


def test_tree_generator_is_deterministic():
    from myduckserver_spark import qgen

    a = [qgen.gen_tree(random.Random(SEED), 3).sql() for _ in range(5)]
    b = [qgen.gen_tree(random.Random(SEED), 3).sql() for _ in range(5)]
    assert a == b


def test_tree_shrinker_finds_minimal_subtree():
    """The shrinker returns the DEEPEST subtree satisfying the failure
    predicate — here 'contains an EXCEPT', planted at depth 2."""
    from myduckserver_spark import qgen

    leaf = qgen.Node("leaf", {"table": "orders", "mod": 3, "res": 0})
    bad = qgen.Node("setop", {"op": "EXCEPT"}, [leaf, leaf])
    tree = qgen.Node(
        "join", {"how": "INNER"},
        [qgen.Node("distinct", {}, [bad]), leaf],
    )
    got = qgen.shrink(tree, lambda n: "EXCEPT" in n.sql())
    assert got is bad


def test_quantified_subquery_differential(spark):
    """Exhaustive differential check of the quantified-comparison
    rewrites (= ANY → IN, <> ALL → NOT IN, order ops → MIN/MAX):
    every (op × quantifier) pair the transpiler handles, with and
    without correlation, against DuckDB's NATIVE ANY/ALL on the same
    text. Sorted row multisets must match."""
    import duckdb

    from myduckserver_spark.functions.mysql_compat import translate_mysql
    from myduckserver_spark.oracle import duckdb_conn
    from myduckserver_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    con = duckdb_conn(sf_dir)
    try:
        subqs = [
            "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
            "SELECT c_custkey FROM customer WHERE c_nationkey < 5",
            # correlated operand
            "SELECT o_custkey FROM orders WHERE "
            "o_orderstatus = x.c_mktsegment OR o_custkey < x.c_custkey",
        ]
        ops = ["=", "<>", ">", ">=", "<", "<="]
        quants = ["ANY", "SOME", "ALL"]
        checked = skipped = 0
        for sub in subqs:
            for op in ops:
                for q in quants:
                    sql = (
                        "SELECT c_custkey FROM customer x WHERE "
                        f"x.c_custkey {op} {q} ({sub})"
                    )
                    tr = translate_mysql(sql)
                    assert q not in tr.upper().split(), (
                        f"unrewritten quantifier for {op} {q}:\n{tr}"
                    )
                    mine = sorted(
                        r[0] for r in spark.sql(tr).collect())
                    theirs = sorted(
                        r[0] for r in con.sql(sql).fetchall())
                    assert mine == theirs, (
                        f"divergence for {op} {q}: "
                        f"{len(mine)} vs {len(theirs)} rows\n{sql}"
                    )
                    checked += 1
        assert checked == 54 and skipped == 0  # all op × quant pairs
    finally:
        con.close()
