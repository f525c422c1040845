"""Grammar-random query-TREE generator for differential fuzzing.

The corpus fuzzers (tests/test_differential_fuzz.py) draw from fixed
single-shape templates; this module composes random TREES — joins ×
aggregates × windows × set-ops × subqueries nest freely to a depth
bound — mirroring the breadth the reference inherits from GMS
enginetests + sqllogictest (main_test.go:213-397, with its skip-list
discipline: known seams are excluded by construction, not silently).

Determinism contract (the comparator sorts rows, so order never
matters, but VALUES must be reproducible on both engines):
- every node emits the SAME canonical schema
  ``(k BIGINT, g STRING, v BIGINT)`` — that is what makes arbitrary
  nesting type-safe;
- integer arithmetic only (no float aggregates);
- window functions use RANGE frames / RANK over a non-unique key, both
  tie-stable (peer rows get equal values);
- LIMIT appears ONLY under a total order on all three columns (the
  ``topk`` node): equal rows are indistinguishable, so the result
  multiset is well-defined even with duplicate rows;
- UNION/INTERSECT/EXCEPT (and the ALL bag-semantics variants) behave
  identically in Spark and DuckDB.

Round-7 grammar growth: CASE projection, two-key grouping folded back
into g, ordered-total LIMIT (topk), INTERSECT ALL / EXCEPT ALL,
correlated scalar COUNT in the projection, inline VALUES leaves.

Failures shrink structurally: every subtree is itself a complete
query, so the minimal failing subtree is found by re-testing children
(``shrink``), and the pinned reproduction is (seed, subtree SQL).
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

# leaf tables: (pk expr, group expr, value expr) — all cast to the
# canonical (k, g, v) schema in _leaf_sql
_LEAVES = {
    "orders": ("o_orderkey", "o_orderstatus", "o_custkey"),
    "customer": ("c_custkey", "c_mktsegment", "c_nationkey"),
    "lineitem": ("l_orderkey * 10 + l_linenumber", "l_returnflag",
                 "l_partkey"),
}


@dataclass
class Node:
    kind: str
    params: dict = field(default_factory=dict)
    children: list["Node"] = field(default_factory=list)

    def sql(self) -> str:
        return _SQL[self.kind](self)


def _leaf_sql(n: Node) -> str:
    t = n.params["table"]
    if t == "__values__":
        rows = ", ".join(
            f"({k}, '{g}', {v})" for k, g, v in n.params["rows"]
        )
        return (
            f"SELECT CAST(k AS BIGINT) AS k, CAST(g AS STRING) AS g, "
            f"CAST(v AS BIGINT) AS v FROM (VALUES {rows}) AS t(k, g, v)"
        )
    pk, g, v = _LEAVES[t]
    m, r = n.params["mod"], n.params["res"]
    return (
        f"SELECT CAST({pk} AS BIGINT) AS k, "
        f"CAST({g} AS STRING) AS g, "
        f"CAST({v} AS BIGINT) AS v "
        f"FROM {t} WHERE ({pk}) % {m} = {r}"
    )


def _setop_sql(n: Node) -> str:
    a, b = (c.sql() for c in n.children)
    return f"({a}) {n.params['op']} ({b})"


def _join_sql(n: Node) -> str:
    a, b = (c.sql() for c in n.children)
    how = n.params["how"]
    if how == "FULL":
        # FULL OUTER nulls either side; coalesce both
        return (
            f"SELECT COALESCE(a.k, b.k) AS k, "
            f"COALESCE(a.g, b.g) AS g, "
            f"CAST(COALESCE(a.v, 0) + COALESCE(b.v, 0) AS BIGINT) AS v "
            f"FROM ({a}) a FULL JOIN ({b}) b ON a.k = b.k"
        )
    # LEFT join nulls b.v; COALESCE keeps v non-null and BIGINT
    return (
        f"SELECT a.k AS k, a.g AS g, "
        f"CAST(a.v + COALESCE(b.v, 0) AS BIGINT) AS v "
        f"FROM ({a}) a {how} JOIN ({b}) b ON a.k = b.k"
    )


def _agg_sql(n: Node) -> str:
    (a,) = (c.sql() for c in n.children)
    having = (
        f" HAVING COUNT(*) >= {n.params['minrows']}"
        if n.params.get("minrows") else ""
    )
    fn = n.params["fn"]  # SUM | MIN | MAX | COUNT
    vexpr = "COUNT(*)" if fn == "COUNT" else f"{fn}(v)"
    if n.params.get("two_keys"):
        # composite grouping key folded back into g (schema-stable)
        m = n.params["two_keys"]
        return (
            f"SELECT CAST(MIN(k) AS BIGINT) AS k, "
            f"CONCAT(g, ':', CAST(k % {m} AS STRING)) AS g, "
            f"CAST({vexpr} AS BIGINT) AS v "
            f"FROM ({a}) GROUP BY g, k % {m}{having}"
        )
    return (
        f"SELECT CAST(MIN(k) AS BIGINT) AS k, g, "
        f"CAST({vexpr} AS BIGINT) AS v "
        f"FROM ({a}) GROUP BY g{having}"
    )


def _window_sql(n: Node) -> str:
    (a,) = (c.sql() for c in n.children)
    if n.params["fn"] == "rank":
        # RANK over a non-unique key: peers tie, deterministic
        vexpr = "RANK() OVER (PARTITION BY g ORDER BY k)"
    else:
        # RANGE frame: peer rows (equal k) share the running total,
        # deterministic under duplicate keys
        vexpr = (
            "SUM(v) OVER (PARTITION BY g ORDER BY k "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    return (
        f"SELECT k, g, CAST({vexpr} AS BIGINT) AS v FROM ({a})"
    )


def _subq_sql(n: Node) -> str:
    a, b = (c.sql() for c in n.children)
    if n.params["form"] == "in":
        return f"SELECT k, g, v FROM ({a}) x WHERE x.g IN (SELECT g FROM ({b}))"
    if n.params["form"] == "notexists":
        return (
            f"SELECT k, g, v FROM ({a}) x WHERE NOT EXISTS "
            f"(SELECT 1 FROM ({b}) y WHERE y.k = x.k)"
        )
    if n.params["form"] == "quant":
        # quantified comparison (round 8): DuckDB runs ANY/ALL
        # natively; the Spark side goes through translate_mysql,
        # which rewrites them (IN / NOT IN / MIN-MAX folds / EXISTS)
        op, q = n.params["op"], n.params["quant"]
        return (
            f"SELECT k, g, v FROM ({a}) x WHERE x.v {op} {q} "
            f"(SELECT v FROM ({b}))"
        )
    # scalar: rows above the other side's midpoint value. FLOOR, not a
    # bare double→bigint cast: Spark truncates that cast while DuckDB
    # rounds, so x.5 midpoints would diverge.
    return (
        f"SELECT k, g, v FROM ({a}) x WHERE x.v > "
        f"(SELECT CAST(FLOOR(COALESCE(MIN(v) + MAX(v), 0) / 2.0) "
        f"AS BIGINT) FROM ({b}))"
    )


def _distinct_sql(n: Node) -> str:
    (a,) = (c.sql() for c in n.children)
    return f"SELECT DISTINCT k, g, v FROM ({a})"


def _case_sql(n: Node) -> str:
    (a,) = (c.sql() for c in n.children)
    m = n.params["mod"]
    return (
        f"SELECT k, g, CAST(CASE WHEN v % {m} = 0 THEN v * 2 "
        f"WHEN v > k THEN v - k ELSE 0 END AS BIGINT) AS v FROM ({a})"
    )


def _topk_sql(n: Node) -> str:
    # LIMIT under a TOTAL order on all three columns: equal rows are
    # indistinguishable, so the result multiset is well-defined even
    # with duplicates (the generator's no-LIMIT rule needs exactly
    # this totality to relax)
    (a,) = (c.sql() for c in n.children)
    return (
        f"SELECT k, g, v FROM ({a}) ORDER BY k, g, v "
        f"LIMIT {n.params['n']}"
    )


def _corrproj_sql(n: Node) -> str:
    # correlated scalar aggregate in the projection (COUNT: never NULL)
    a, b = (c.sql() for c in n.children)
    return (
        f"SELECT x.k, x.g, CAST(x.v + (SELECT COUNT(*) FROM ({b}) y "
        f"WHERE y.g = x.g) AS BIGINT) AS v FROM ({a}) x"
    )


def _filter_sql(n: Node) -> str:
    (a,) = (c.sql() for c in n.children)
    return f"SELECT k, g, v FROM ({a}) WHERE {n.params['pred']}"


_SQL = {
    "leaf": _leaf_sql,
    "setop": _setop_sql,
    "join": _join_sql,
    "agg": _agg_sql,
    "window": _window_sql,
    "subq": _subq_sql,
    "distinct": _distinct_sql,
    "filter": _filter_sql,
    "case": _case_sql,
    "topk": _topk_sql,
    "corrproj": _corrproj_sql,
}


def gen_tree(rng: random.Random, depth: int = 3,
             allow_topk: bool = True, corr_ctx: bool = False) -> Node:
    """Random query tree with at most `depth` operator levels above
    the leaves. Leaf predicates subsample rows (pk % m = r) so deep
    UNION ALL / join stacks stay small at test scale while the SHAPE
    exercises the planner.

    ``corr_ctx=True`` marks a subtree that sits under a correlated
    reference and restricts it to decorrelation-solid shapes (leaf,
    filter, case, distinct, setop, join, agg).

    The ``corrproj`` node (correlated scalar COUNT in the projection)
    is implemented but EXCLUDED from random composition: round-7
    fuzzing found Spark 4.1's decorrelation breaks in three distinct
    ways when it composes — an ordered-LIMIT inner/outer relation
    LOSES its ORDER BY and keeps arbitrary rows (wrong results; pinned
    in tests/test_differential_fuzz.py::
    test_topk_under_correlation_divergence_is_pinned), a window below
    the correlation throws INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND, and an
    aggregate ABOVE the correlated projection (or a nested
    correlation) throws java.util.NoSuchElementException. The simple
    uncomposed shape is covered by the template fuzzer's correlated-
    scalar generator; composition is excluded skip-list style (the
    reference inherits the same discipline from GMS sqllogictest)."""
    if depth <= 0:
        if rng.random() < 0.15:  # inline VALUES leaf: constant folding
            nrows = rng.randint(1, 4)
            return Node("leaf", {"table": "__values__", "rows": [
                (rng.randint(0, 9), rng.choice("abc"),
                 rng.randint(0, 99)) for _ in range(nrows)
            ]})
        return Node("leaf", {
            "table": rng.choice(list(_LEAVES)),
            "mod": rng.choice([3, 5, 7, 11]),
            "res": rng.randint(0, 2),
        })
    if corr_ctx:
        kinds = ["setop", "join", "agg", "distinct", "filter", "case"]
    else:
        kinds = ["setop", "join", "agg", "window", "subq", "distinct",
                 "filter", "case"]
        if allow_topk:
            kinds.append("topk")
    kind = rng.choice(kinds)
    if kind == "setop":
        return Node("setop", {
            "op": rng.choice(
                ["UNION ALL", "UNION", "INTERSECT", "EXCEPT",
                 "INTERSECT ALL", "EXCEPT ALL"]),
        }, [gen_tree(rng, depth - 1, allow_topk, corr_ctx),
            gen_tree(rng, depth - 1, allow_topk, corr_ctx)])
    if kind == "join":
        return Node("join",
                    {"how": rng.choice(["INNER", "LEFT", "FULL"])},
                    [gen_tree(rng, depth - 1, allow_topk, corr_ctx),
                     gen_tree(rng, depth - 1, allow_topk, corr_ctx)])
    if kind == "agg":
        return Node("agg", {
            "fn": rng.choice(["SUM", "MIN", "MAX", "COUNT"]),
            "minrows": rng.choice([0, 0, 2]),
            "two_keys": rng.choice([0, 0, 0, 2, 3]),
        }, [gen_tree(rng, depth - 1, allow_topk, corr_ctx)])
    if kind == "window":
        return Node("window", {"fn": rng.choice(["rank", "runsum"])},
                    [gen_tree(rng, depth - 1, allow_topk, corr_ctx)])
    if kind == "subq":
        form = rng.choice(["in", "notexists", "scalar", "quant"])
        # notexists correlates into its right side: no topk below a
        # correlation (see docstring)
        corr = form == "notexists"
        params = {"form": form}
        if form == "quant":
            params["op"] = rng.choice(["=", "<>", ">", ">=", "<", "<="])
            params["quant"] = rng.choice(["ANY", "ALL", "SOME"])
        return Node("subq", params,
                    [gen_tree(rng, depth - 1, allow_topk,
                              corr_ctx or corr),
                     gen_tree(rng, depth - 1, allow_topk,
                              corr_ctx or corr)])
    if kind == "case":
        return Node("case", {"mod": rng.choice([2, 3, 5])},
                    [gen_tree(rng, depth - 1, allow_topk, corr_ctx)])
    if kind == "topk":
        return Node("topk", {"n": rng.choice([3, 10, 50])},
                    [gen_tree(rng, depth - 1, allow_topk, corr_ctx)])
    if kind == "corrproj":
        # the correlated scalar reaches BOTH sides: exclude topk from
        # the whole subtree (Spark drops the inner ORDER BY — pinned)
        # both sides under the correlation: restricted grammar
        return Node("corrproj", {},
                    [gen_tree(rng, depth - 1, False, True),
                     gen_tree(rng, depth - 1, False, True)])
    if kind == "filter":
        m = rng.choice([2, 3, 4])
        preds = [
            f"v % {m} = {rng.randint(0, m - 1)}",
            f"k % {m} <> {rng.randint(0, m - 1)}",
            "v > k", "v <= k", "g IS NOT NULL",
        ]
        a, b = rng.sample(preds, 2)
        op = rng.choice(["AND", "OR"])
        return Node("filter", {"pred": f"({a}) {op} ({b})"},
                    [gen_tree(rng, depth - 1, allow_topk, corr_ctx)])
    return Node("distinct", {}, [gen_tree(rng, depth - 1, allow_topk, corr_ctx)])


def subtrees(node: Node):
    """Yield every subtree, deepest-first — each is a complete query,
    so the FIRST failing one in this order is a minimal reproduction."""
    for c in node.children:
        yield from subtrees(c)
    yield node


def shrink(node: Node, still_fails) -> Node:
    """Smallest subtree for which `still_fails(subtree)` holds (the
    node itself if no child reproduces the failure)."""
    for sub in subtrees(node):
        if still_fails(sub):
            return sub
    return node
