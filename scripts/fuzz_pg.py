#!/usr/bin/env python
"""pg-dialect differential fuzz: randomized statements over the
round-10 pg surface (quantified ANY/ALL over arrays and subqueries,
json_each/json_object_keys lateral iteration, array slices,
BETWEEN SYMMETRIC, vector-similarity spellings) run through
``translate_postgres`` on Spark AND verbatim on DuckDB (the
reference's pg door is DuckDB passthrough,
pgserver/connection_handler.go:411-449). Any value disagreement
prints the statement + seed.

    python scripts/fuzz_pg.py --n 200 --seed 20260816 --sf sf0.01
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from myduckserver_spark.functions.pg_compat import translate_postgres  # noqa: E402
from myduckserver_spark.session import build_session  # noqa: E402
from myduckserver_spark.functions.json_udfs import (  # noqa: E402
    register_json_udfs,
)
from myduckserver_spark.tables import register_views  # noqa: E402


def gen_stmt(rng: random.Random) -> str:
    """One random pg statement over the nation/documents tables."""
    kind = rng.choice(
        ["any_arr", "all_arr", "any_sub", "all_sub", "sym",
         "slice", "json_each", "json_keys", "vec", "quoted_ident",
         "backslash", "within_group", "regex_fn",
         "arr_ops", "jsonb_contain", "jsonpath", "bitlit",
         "to_json_scalar", "arr_helpers"])
    langs = rng.sample(["en", "de", "fr", "es", "ja", "zz"],
                       rng.randint(1, 4))
    arr = ", ".join(f"'{x}'" for x in langs)
    if kind == "any_arr":
        op = rng.choice(["=", "<>"])
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents "
                f"WHERE lang {op} ANY(ARRAY[{arr}])")
    if kind == "all_arr":
        op = rng.choice(["<>", "="])
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents "
                f"WHERE lang {op} ALL(ARRAY[{arr}])")
    if kind == "any_sub":
        op = rng.choice(["=", ">", "<", ">=", "<=", "<>"])
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents "
                f"WHERE n_chars {op} ANY(SELECT MIN(n_chars) + "
                f"{rng.randint(0, 200)} FROM documents)")
    if kind == "all_sub":
        op = rng.choice([">", "<", ">=", "<="])
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents "
                f"WHERE n_chars {op} ALL(SELECT MIN(n_chars) + "
                f"{rng.randint(0, 200)} FROM documents)")
    if kind == "sym":
        # DuckDB has no BETWEEN SYMMETRIC: hand it the expanded form
        a, b = rng.randint(0, 3000), rng.randint(0, 3000)
        return (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents "
            f"WHERE n_chars BETWEEN SYMMETRIC {a} AND {b}",
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents "
            f"WHERE n_chars BETWEEN least({a}, {b}) AND "
            f"greatest({a}, {b})",
        )
    if kind == "slice":
        a = rng.randint(1, 4)
        b = rng.randint(a, 5)
        return (f"SELECT (ARRAY[1,2,3,4,5])[{a}:{b}] AS s")
    if kind == "json_each":
        # DuckDB in this image has no json_each table function — the
        # oracle is computed in Python (pg semantics: _text unwraps
        # string values, plain json_each keeps JSON encodings)
        pairs = {f"k{i}": rng.choice([rng.randint(0, 9), "s", None])
                 for i in range(rng.randint(1, 4))}
        import json as _j
        doc = _j.dumps(pairs).replace("'", "''")
        fn = rng.choice(["json_each", "json_each_text"])
        if fn == "json_each_text":
            exp = [(k, v if isinstance(v, str)
                    else (None if v is None else _j.dumps(v)))
                   for k, v in sorted(pairs.items())]
        else:
            exp = [(k, _j.dumps(v)) for k, v in sorted(pairs.items())]
        return (f"SELECT key, value FROM {fn}('{doc}') "
                f"ORDER BY key", exp)
    if kind == "json_keys":
        pairs = {f"k{i}": i for i in range(rng.randint(1, 5))}
        import json as _j
        doc = _j.dumps(pairs).replace("'", "''")
        return (f"SELECT * FROM json_object_keys('{doc}')",
                [(k,) for k in pairs])
    if kind == "quoted_ident":
        return (f'SELECT "n_name", "n_regionkey" FROM "nation" '
                f'WHERE "nation"."n_regionkey" = {rng.randint(0, 4)} '
                f'ORDER BY "n_name"')
    if kind == "backslash":
        # plain literals: backslash is LITERAL under
        # standard_conforming_strings=on (DuckDB agrees)
        frag = rng.choice([r"a\b", r"C:\tmp", r"x\ny", r"\d+"])
        return (f"SELECT length('{frag}') AS n, '{frag}' AS s")
    if kind == "within_group":
        q = rng.choice(["0.25", "0.5", "0.9"])
        return (f"SELECT CAST(percentile_cont({q}) WITHIN GROUP "
                f"(ORDER BY n_chars) AS DOUBLE) AS p, "
                f"mode() WITHIN GROUP (ORDER BY lang) AS m "
                f"FROM documents")
    if kind == "regex_fn":
        pat = rng.choice([r"[aeiou]+", r"\w\w", r"\d", "en|de"])
        return (f"SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents "
                f"WHERE regexp_matches(lang, '{pat}')")
    if kind == "arr_ops":
        # && / @> over int arrays; DuckDB list_has_any/list_has_all
        # is the independent oracle
        a = [rng.randint(0, 6) for _ in range(rng.randint(1, 5))]
        b = [rng.randint(0, 6) for _ in range(rng.randint(1, 3))]
        al, bl = ",".join(map(str, a)), ",".join(map(str, b))
        op, dfn = rng.choice([("&&", "list_has_any"),
                              ("@>", "list_has_all")])
        return (f"SELECT (ARRAY[{al}] {op} ARRAY[{bl}]) AS r",
                f"SELECT {dfn}([{al}], [{bl}]) AS r")
    if kind == "jsonb_contain":
        # expectation derived BY CONSTRUCTION (needle sampled from
        # the doc → true; mismatching value injected → false)
        import json as _j
        doc = {f"k{i}": rng.choice(
            [rng.randint(0, 5), "s" + str(rng.randint(0, 3)),
             [rng.randint(0, 3) for _ in range(3)]])
            for i in range(3)}
        should = rng.random() < 0.5
        if should:
            needle = {}
            for k in rng.sample(list(doc), rng.randint(1, 2)):
                v = doc[k]
                needle[k] = (rng.sample(v, rng.randint(1, len(v)))
                             if isinstance(v, list) else v)
        else:
            k = rng.choice(list(doc))
            v = doc[k]
            needle = {k: v + 99 if isinstance(v, int)
                      else ("zz" if isinstance(v, str) else [99])}
        d = _j.dumps(doc).replace("'", "''")
        nd = _j.dumps(needle).replace("'", "''")
        return (f"SELECT ('{d}'::jsonb @> '{nd}'::jsonb) AS c",
                [(should,)])
    if kind == "jsonpath":
        import json as _j
        arr = [rng.randint(0, 9) for _ in range(rng.randint(1, 5))]
        thresh = rng.randint(0, 9)
        exp = any(x > thresh for x in arr)
        d = _j.dumps({"a": arr})
        return (f"SELECT jsonb_path_exists('{d}', "
                f"'$.a[*] ? (@ > {thresh})') AS e", [(exp,)])
    if kind == "bitlit":
        bits = "".join(rng.choice("01")
                       for _ in range(rng.randint(1, 8)))
        hx = "".join(rng.choice("0123456789abcdef")
                     for _ in range(rng.randint(1, 4)))
        return (f"SELECT b'{bits}'::int AS a, x'{hx}'::int AS b, "
                f"B'{bits}' AS c",
                [(int(bits, 2), int(hx, 16), bits)])
    if kind == "to_json_scalar":
        v = rng.choice([str(rng.randint(-5, 99)), "'x''y'", "true",
                        "ARRAY[1,2]"])
        return (f"SELECT to_json({v})::text AS j",
                f"SELECT to_json({v})::varchar AS j")
    if kind == "arr_helpers":
        a = [rng.randint(0, 4) for _ in range(rng.randint(1, 6))]
        x = rng.randint(0, 4)
        n = rng.randint(0, len(a))
        al = ",".join(map(str, a))
        exp_pos = [i + 1 for i, v in enumerate(a) if v == x]
        exp_trim = a[:len(a) - n]
        return (f"SELECT array_positions(ARRAY[{al}], {x}) AS p, "
                f"trim_array(ARRAY[{al}], {n}) AS t",
                [(exp_pos, exp_trim)])
    # vec
    v1 = [round(rng.uniform(-1, 1), 3) for _ in range(4)]
    v2 = [round(rng.uniform(-1, 1), 3) for _ in range(4)]
    a1 = ", ".join(str(x) for x in v1)
    a2 = ", ".join(str(x) for x in v2)
    fn = rng.choice(["list_cosine_similarity", "list_distance",
                     "list_inner_product"])
    return (f"SELECT CAST(round({fn}(ARRAY[{a1}]::float8[], "
            f"ARRAY[{a2}]::float8[]), 6) AS DOUBLE) AS v")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=20260816)
    ap.add_argument("--sf", default="sf0.01")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"
    rng = random.Random(args.seed)

    spark = build_session(app_name="fuzz_pg", master="local[8]",
                          shuffle_partitions=8)
    register_views(spark, sf_dir)
    register_json_udfs(spark)
    con = duckdb.connect()
    for t in ("documents", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    t0 = time.time()
    bad = 0
    for i in range(args.n):
        stmt = gen_stmt(rng)
        ostmt = stmt
        if isinstance(stmt, tuple):
            stmt, ostmt = stmt
        try:
            got = [tuple(r) for r in
                   spark.sql(translate_postgres(stmt)).collect()]
            want = (ostmt if isinstance(ostmt, list)
                    else con.sql(ostmt).fetchall())
        except Exception as ex:
            print(f"ERR #{i}: {stmt}\n  {type(ex).__name__}: "
                  f"{str(ex)[:200]}")
            bad += 1
            continue
        norm = lambda rows: sorted(
            tuple(list(x) if isinstance(x, (list, tuple)) else x
                  for x in r) for r in rows)
        if norm(got) != norm(want):
            print(f"DIVERGE #{i}: {stmt}\n  spark={got[:5]} "
                  f"duck={want[:5]}")
            bad += 1
        if (i + 1) % 50 == 0:
            print(f"  {i + 1}/{args.n} ({time.time() - t0:.0f}s)",
                  flush=True)
    print(f"{args.n - bad}/{args.n} green in {time.time() - t0:.1f}s "
          f"(seed {args.seed}, {args.sf})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
