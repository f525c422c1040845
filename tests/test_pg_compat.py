"""Postgres-dialect front door: translate_postgres unit tests plus
DuckDB-oracle execution parity.

The reference passes pg SQL essentially verbatim to DuckDB
(reference: pgserver/connection_handler.go:411-449); DuckDB therefore
*is* the semantics oracle for this dialect — each execution test runs
the original pg text on DuckDB and the translated text on Spark.
"""

from __future__ import annotations

import pytest

from myduckserver_spark.functions.pg_compat import translate_postgres
from myduckserver_spark.oracle import compare_one
from myduckserver_spark.tables import register_views


# ------------------------------------------------------------ unit tests


@pytest.mark.parametrize(
    "src,expected",
    [
        ("SELECT a::text FROM t", "SELECT CAST(a AS STRING) FROM t"),
        ("SELECT a::int8 FROM t", "SELECT CAST(a AS BIGINT) FROM t"),
        (
            "SELECT a::double precision FROM t",
            "SELECT CAST(a AS DOUBLE) FROM t",
        ),
        (
            "SELECT a::numeric(12,2) FROM t",
            "SELECT CAST(a AS DECIMAL(12,2)) FROM t",
        ),
        (
            "SELECT f(x)::text FROM t",
            "SELECT CAST(f(x) AS STRING) FROM t",
        ),
        (
            "SELECT (a + b)::bigint FROM t",
            "SELECT CAST((a + b) AS BIGINT) FROM t",
        ),
        (
            "SELECT a::text::int FROM t",
            "SELECT CAST(CAST(a AS STRING) AS INT) FROM t",
        ),
        (
            "SELECT '1'::int, b::varchar(10) FROM t",
            "SELECT CAST('1' AS INT), CAST(b AS STRING) FROM t",
        ),
        (
            "SELECT a::int[] FROM t",
            "SELECT CAST(a AS ARRAY<INT>) FROM t",
        ),
        # ::text inside a string literal must NOT be rewritten
        (
            "SELECT 'a::text' FROM t",
            "SELECT 'a::text' FROM t",
        ),
    ],
)
def test_cast_rewrites(src, expected):
    assert translate_postgres(src) == expected


def test_regex_operators():
    """DuckDB's ~ is regexp_full_match — the translated RLIKE is
    anchored to mirror the reference's pg-on-DuckDB behavior."""
    assert (
        translate_postgres("SELECT * FROM t WHERE name ~ 'ab+'")
        == "SELECT * FROM t WHERE (name RLIKE '^(?:ab+)$')"
    )
    assert (
        translate_postgres("SELECT * FROM t WHERE name ~* 'ab+'")
        == "SELECT * FROM t WHERE (name RLIKE '(?i)^(?:ab+)$')"
    )
    assert (
        translate_postgres("SELECT * FROM t WHERE name !~ 'ab+'")
        == "SELECT * FROM t WHERE NOT (name RLIKE '^(?:ab+)$')"
    )
    assert (
        translate_postgres("SELECT * FROM t WHERE name !~* 'ab+'")
        == "SELECT * FROM t WHERE NOT (name RLIKE '(?i)^(?:ab+)$')"
    )
    # inside string literal: untouched
    assert translate_postgres("SELECT '~' FROM t") == "SELECT '~' FROM t"


def test_distinct_on_rewrite_shape():
    out = translate_postgres(
        "SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v DESC LIMIT 5"
    )
    assert "ROW_NUMBER() OVER (PARTITION BY k ORDER BY k, v DESC)" in out
    assert out.rstrip().endswith("LIMIT 5")
    assert "__don_rn = 1" in out


def test_qualify_rewrite_shape():
    out = translate_postgres(
        "SELECT a, b FROM t QUALIFY row_number() OVER (ORDER BY b) = 1 "
        "ORDER BY a LIMIT 5"
    )
    assert out.startswith("SELECT * EXCEPT(__q) FROM (")
    assert "(row_number() OVER (ORDER BY b) = 1) AS __q" in out
    assert out.endswith("WHERE __q ORDER BY a LIMIT 5")
    # No top-level QUALIFY → untouched; 'qualify' inside a literal too.
    assert translate_postgres("SELECT a FROM t") == "SELECT a FROM t"
    lit = "SELECT 'QUALIFY x' AS s FROM t"
    assert translate_postgres(lit) == lit


def test_misc_rewrites():
    assert (
        translate_postgres("SELECT x FROM t FETCH FIRST 7 ROWS ONLY")
        == "SELECT x FROM t LIMIT 7"
    )
    assert translate_postgres("SELECT E'a\\nb'") == "SELECT 'a\\nb'"
    assert (
        translate_postgres("SELECT strpos(name, 'x') FROM t")
        == "SELECT position('x', name) FROM t"
    )
    out = translate_postgres(
        "SELECT string_agg(n, ',' ORDER BY n) FROM t"
    )
    assert out == "SELECT listagg(n, ',') WITHIN GROUP (ORDER BY n) FROM t"
    out = translate_postgres("SELECT g FROM generate_series(1, 5) AS s(g)")
    assert "explode(sequence(1, 5))" in out and " AS g" in out


# ------------------------------------------------------- execution parity


def _pg_exec(pg_sql: str):
    def fn(spark, sf_dir):
        register_views(spark, sf_dir)
        return spark.sql(translate_postgres(pg_sql))

    return fn


# (name, pg SQL run verbatim on DuckDB, translated on Spark)
_PARITY = [
    (
        "pg_distinct_on",
        """
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
        FROM orders
        ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
        """,
    ),
    (
        "pg_casts_regex",
        """
        SELECT c_custkey, c_custkey::text AS ck_str,
               (c_acctbal >= 0)::int AS solvent
        FROM customer
        WHERE c_name ~ '.*[13]'
        ORDER BY c_custkey
        """,
    ),
    (
        "pg_string_agg",
        """
        SELECT n_regionkey::bigint AS rk,
               string_agg(n_name, ',' ORDER BY n_name) AS names
        FROM nation GROUP BY n_regionkey ORDER BY rk
        """,
    ),
    (
        "pg_generate_series",
        """
        SELECT g::bigint AS n, (g * g)::bigint AS sq
        FROM generate_series(1, 12) AS t(g) ORDER BY n
        """,
    ),
    (
        "pg_fetch_first",
        """
        SELECT o_orderkey FROM orders ORDER BY o_orderkey
        FETCH FIRST 5 ROWS ONLY
        """,
    ),
    (
        "pg_qualify_rownum",
        """
        SELECT n_regionkey::bigint AS rk, n_name
        FROM nation
        QUALIFY row_number() OVER (
            PARTITION BY n_regionkey ORDER BY n_name) <= 2
        ORDER BY rk, n_name
        """,
    ),
    (
        "pg_recursive_cte",
        """
        WITH RECURSIVE r(n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 10
        )
        SELECT n::bigint AS n, (n % 3)::bigint AS n_mod
        FROM r ORDER BY n
        """,
    ),
    (
        "pg_qualify_over_agg",
        """
        SELECT c_nationkey::bigint AS nk, count(*)::bigint AS n_cust
        FROM customer
        GROUP BY c_nationkey
        QUALIFY rank() OVER (ORDER BY count(*) DESC, c_nationkey) <= 3
        ORDER BY n_cust DESC, nk
        LIMIT 3
        """,
    ),
]


@pytest.mark.parametrize("name,pg_sql", _PARITY, ids=[p[0] for p in _PARITY])
def test_pg_parity(spark, sf_dir, name, pg_sql):
    res = compare_one(spark, name, _pg_exec(pg_sql), pg_sql, sf_dir)
    assert res.ok, res.detail


def test_to_char_parity(spark, sf_dir):
    """to_char has no DuckDB equivalent by the same name — oracle uses
    strftime for the same output."""
    pg_sql = (
        "SELECT to_char(o_orderdate, 'YYYY-MM') AS ym, "
        "count(*)::bigint AS n FROM orders GROUP BY 1 ORDER BY ym"
    )
    oracle = (
        "SELECT strftime(o_orderdate, '%Y-%m') AS ym, "
        "count(*)::bigint AS n FROM orders GROUP BY 1 ORDER BY ym"
    )
    res = compare_one(spark, "pg_to_char", _pg_exec(pg_sql), oracle, sf_dir)
    assert res.ok, res.detail


def test_engine_postgres_dialect(spark, tmp_path):
    """engine.sql(dialect='postgres') end-to-end."""
    from myduckserver_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.create_table("pgt", [("id", "bigint"), ("name", "text")])
    eng.execute("INSERT INTO pgt VALUES (1, 'Alpha'), (2, 'beta'), (3, 'gamma')")
    rows = eng.sql(
        "SELECT id::text AS i, name FROM pgt WHERE name ~* 'a.*' ORDER BY id",
        dialect="postgres",
    ).collect()
    assert [(r.i, r.name) for r in rows] == [("1", "Alpha")]


def test_array_literals_and_subscripts(spark):
    assert spark.sql(translate_postgres(
        "SELECT ARRAY[1,2,3] AS x"
    )).collect()[0].x == [1, 2, 3]
    # pg subscripts are 1-based; slices are left untouched
    assert spark.sql(translate_postgres(
        "SELECT (ARRAY[10,20,30])[2] AS x"
    )).collect()[0].x == 20
    assert spark.sql(translate_postgres(
        "SELECT ARRAY[ARRAY[1],ARRAY[2]] AS x"
    )).collect()[0].x == [[1], [2]]


def test_pg_json_operators(spark):
    cases = {
        "SELECT '{\"a\":1}'::jsonb ->> 'a' AS x": "1",
        "SELECT '{\"a\":{\"b\":5}}'::json -> 'a' ->> 'b' AS x": "5",
        "SELECT '[10,20]'::jsonb ->> 1 AS x": "20",
        "SELECT jsonb_build_object('a', 1) AS x": '{"a":1}',
    }
    for q, want in cases.items():
        assert spark.sql(translate_postgres(q)).collect()[0].x == want, q


def test_pg_aggregates_and_series(spark):
    out = spark.sql(translate_postgres(
        "SELECT array_agg(v ORDER BY v DESC) AS x "
        "FROM (VALUES (1), (3), (2)) AS t(v)"
    )).collect()[0].x
    assert out == [3, 2, 1]
    out = spark.sql(translate_postgres(
        "SELECT json_object_agg(k, v) AS x "
        "FROM (VALUES ('a', 1), ('b', 2)) AS t(k, v)"
    )).collect()[0].x
    import json

    assert json.loads(out) == {"a": 1, "b": 2}
    assert [r.x for r in spark.sql(translate_postgres(
        "SELECT generate_series(1, 3) AS x"
    )).collect()] == [1, 2, 3]
    assert [r.x for r in spark.sql(translate_postgres(
        "SELECT unnest(ARRAY[7,8]) AS x"
    )).collect()] == [7, 8]


def test_pg_epoch_and_tablesample(spark):
    assert spark.sql(translate_postgres(
        "SELECT extract(epoch from timestamp '1970-01-01 00:01:00') AS x"
    )).collect()[0].x == 60.0
    # TABLESAMPLE targets a real relation (Spark restriction on
    # derived-table sampling is unchanged by the rewrite)
    assert translate_postgres(
        "SELECT * FROM t TABLESAMPLE BERNOULLI(10)"
    ) == "SELECT * FROM t TABLESAMPLE (10 PERCENT)"
    assert translate_postgres(
        "SELECT * FROM t TABLESAMPLE SYSTEM(1.5)"
    ) == "SELECT * FROM t TABLESAMPLE (1.5 PERCENT)"


def test_filter_clause_all_positions(spark, tmp_path):
    """Aggregate FILTER (WHERE …) in select / HAVING / ORDER BY runs
    natively on Spark; WINDOW position goes through the CASE rewrite
    (_rewrite_filter_over_window) — Spark rejects it raw."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE ft (g INT, v INT)")
    e.execute("INSERT INTO ft VALUES (1, 5), (1, -2), (1, 3), (2, 7), "
              "(2, -1)")
    rows = e.sql(
        "SELECT g, COUNT(*) FILTER (WHERE v > 0) AS pos, "
        "COALESCE(SUM(v) FILTER (WHERE v < 0), 0) AS neg "
        "FROM ft GROUP BY g "
        "HAVING COUNT(*) FILTER (WHERE v > 0) >= 1 "
        "ORDER BY SUM(v) FILTER (WHERE v > 0) DESC",
        dialect="postgres",
    ).collect()
    assert [(r.g, r.pos, r.neg) for r in rows] == [(1, 2, -2), (2, 1, -1)]
    # window position: rewritten to CASE
    w = e.sql(
        "SELECT g, v, COUNT(*) FILTER (WHERE v > 0) "
        "OVER (PARTITION BY g) AS wp, "
        "SUM(v) FILTER (WHERE v < 0) OVER (PARTITION BY g) AS wn "
        "FROM ft ORDER BY g, v",
        dialect="postgres",
    ).collect()
    assert [(r.g, r.v, r.wp, r.wn) for r in w] == [
        (1, -2, 2, -2), (1, 3, 2, -2), (1, 5, 2, -2),
        (2, -1, 1, -1), (2, 7, 1, -1),
    ]


def test_filter_over_window_rewrite_shape():
    out = translate_postgres(
        "SELECT SUM(x) FILTER (WHERE y > 0) OVER (PARTITION BY g) FROM t"
    )
    assert "FILTER" not in out.upper()
    assert "CASE WHEN y > 0 THEN x END" in out
    out2 = translate_postgres(
        "SELECT COUNT(*) FILTER (WHERE y = 'a') OVER () FROM t"
    )
    assert "CASE WHEN y = 'a' THEN 1 END" in out2
    # non-window FILTER is untouched (Spark runs it natively)
    keep = "SELECT COUNT(*) FILTER (WHERE y > 0) FROM t GROUP BY g"
    assert translate_postgres(keep) == keep


def test_lateral_through_pg_front_door(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE lt (g INT, v INT)")
    e.execute("INSERT INTO lt VALUES (1, 5), (1, 9), (2, 7)")
    for q in (
        # comma LATERAL and JOIN LATERAL ... ON true
        "SELECT a.g, b.v FROM (SELECT DISTINCT g FROM lt) a, "
        "LATERAL (SELECT v FROM lt WHERE lt.g = a.g "
        "ORDER BY v DESC LIMIT 1) b ORDER BY a.g",
        "SELECT a.g, b.v FROM (SELECT DISTINCT g FROM lt) a "
        "JOIN LATERAL (SELECT v FROM lt WHERE lt.g = a.g "
        "ORDER BY v DESC LIMIT 1) b ON true ORDER BY a.g",
    ):
        rows = e.sql(q, dialect="postgres").collect()
        assert [(r.g, r.v) for r in rows] == [(1, 9), (2, 7)]


def test_pg_on_conflict_forms(spark, tmp_path):
    """pg-text ON CONFLICT DO NOTHING / DO UPDATE with EXCLUDED.* and
    table-qualified existing-row references."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE pkt (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO pkt VALUES (1, 1)")
    e.execute("INSERT INTO pkt VALUES (1, 9), (2, 5) "
              "ON CONFLICT (id) DO NOTHING", dialect="postgres")
    assert sorted((r.id, r.v) for r in
                  e.execute("SELECT * FROM pkt").collect()) == \
        [(1, 1), (2, 5)]
    # pkt.v = the EXISTING row's value (pg semantics)
    e.execute("INSERT INTO pkt VALUES (1, 9) ON CONFLICT (id) "
              "DO UPDATE SET v = EXCLUDED.v + pkt.v", dialect="postgres")
    assert sorted((r.id, r.v) for r in
                  e.execute("SELECT * FROM pkt").collect()) == \
        [(1, 10), (2, 5)]


def test_discard_all_clears_session_state(spark, tmp_path):
    """DISCARD ALL drops session TEMPORARY tables and deallocates
    prepared statements (reference covers this at the pg wire layer:
    test/bats/postgres/cli.bats discard_all_clears_temp_tables)."""
    import pytest as _pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_discard"))
    e.execute("CREATE TEMPORARY TABLE tt (id INT PRIMARY KEY)")
    e.execute("INSERT INTO tt VALUES (1)")
    e.execute("PREPARE p1 FROM 'SELECT 1 AS x'")
    r = e.execute("DISCARD ALL", dialect="postgres")
    assert "DISCARD ALL" in r.info
    with _pytest.raises(Exception):
        e.execute("SELECT * FROM tt").collect()
    with _pytest.raises(ValueError):
        e.execute("EXECUTE p1")
    # narrower scopes: PLANS keeps temp tables, drops prepared
    e.execute("CREATE TEMPORARY TABLE tt2 (id INT PRIMARY KEY)")
    e.execute("PREPARE p2 FROM 'SELECT 2 AS x'")
    e.execute("DISCARD PLANS", dialect="postgres")
    assert e.execute("SELECT COUNT(*) AS n FROM tt2").collect()[0].n == 0
    with _pytest.raises(ValueError):
        e.execute("EXECUTE p2")


def test_pg_xor_and_regexp_split(spark, tmp_path):
    """pg `#` is bitwise XOR (NOT a comment — that's MySQL's #), and
    regexp_split_to_array maps to split."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_xor"))
    assert e.execute("SELECT 5 # 3 AS x", dialect="postgres"
                     ).collect()[0].x == 6
    assert e.execute(
        "SELECT regexp_split_to_array('a,b', ',') AS x",
        dialect="postgres",
    ).collect()[0].x == ["a", "b"]
    # '#' inside a pg string literal is untouched
    assert e.execute("SELECT '#tag' AS x", dialect="postgres"
                     ).collect()[0].x == "#tag"
    # MySQL dialect still treats # as a line comment
    assert e.execute("SELECT 1 AS x # comment").collect()[0].x == 1


def test_pg_json_path_operators_clear_error(spark, tmp_path):
    """`#>` / `#>>` / `#-` with a LITERAL path are now supported
    (round-9); a NON-literal path must not be mangled into `^>` by
    the XOR rewrite — it still raises the clear unsupported-operator
    message; `#` inside double-quoted identifiers is preserved."""
    import pytest as _pytest

    from myduckserver_spark.engine import Engine

    from myduckserver_spark.functions.pg_compat import _rewrite_xor_op

    e = Engine(spark, str(tmp_path / "wh_jsonpath"))
    r = e.execute(
        "SELECT '{\"a\": 3}'::json #>> '{a}' AS x",
        dialect="postgres",
    ).collect()[0]
    assert r.x == "3"
    with _pytest.raises(NotImplementedError, match="JSON path"):
        e.execute(
            "SELECT '{}'::json #> some_col AS x FROM t",
            dialect="postgres",
        )
    # '#' inside a double-quoted identifier survives; the real
    # operator outside still rewrites
    assert _rewrite_xor_op('SELECT "a#b", 1 # 2') == 'SELECT "a#b", 1 ^ 2'
    assert _rewrite_xor_op("SELECT '#lit', 5 # 3") == "SELECT '#lit', 5 ^ 3"


def test_serial_types_and_at_time_zone(spark, tmp_path):
    """SERIAL/BIGSERIAL columns (pg's serial family; also MySQL's own
    SERIAL alias) map onto the AUTO_INCREMENT machinery, and
    ``expr AT TIME ZONE 'z'`` becomes to_utc_timestamp (pg interprets
    a plain timestamp as wall-clock in z and converts to the session
    zone — UTC here)."""
    import datetime as dt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE st (id SERIAL PRIMARY KEY, v INT)",
              dialect="postgres")
    e.execute("INSERT INTO st (v) VALUES (10), (20)", dialect="postgres")
    assert sorted((r.id, r.v) for r in
                  e.execute("SELECT * FROM st").collect()) \
        == [(1, 10), (2, 20)]
    e.execute("CREATE TABLE bs (id BIGSERIAL PRIMARY KEY, s TEXT)",
              dialect="postgres")
    meta = e.table_meta("bs")
    assert meta.auto_increment == "id" and "id" in meta.not_null
    # MySQL's SERIAL alias takes the same path
    e.execute("CREATE TABLE ms (id SERIAL, v INT)")
    e.execute("INSERT INTO ms (v) VALUES (7)")
    assert e.execute("SELECT id FROM ms").collect()[0].id == 1
    one = lambda q: e.execute(q, dialect="postgres").collect()[0][0]  # noqa: E731
    assert one("SELECT TIMESTAMP '2024-01-01 12:00:00' "
               "AT TIME ZONE 'US/Eastern' AS x") \
        == dt.datetime(2024, 1, 1, 17)
    assert one("SELECT TIMESTAMP '2024-01-01 12:00:00' "
               "AT TIME ZONE 'UTC' AS x") == dt.datetime(2024, 1, 1, 12)


def test_pg_session_functions(spark, tmp_path):
    """version() on the pg door reports a PostgreSQL-style string
    (psql/BI clients parse it — the reference's pg wire advertises a
    server_version); current_schema() is the engine's schema."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    r = e.execute("SELECT version() AS v, current_schema() AS s",
                  dialect="postgres").collect()[0]
    assert r.v.startswith("PostgreSQL ") and r.s == "main"
    # MySQL door keeps the MySQL-style version
    assert "myduckserver" in e.execute(
        "SELECT VERSION() AS v").collect()[0].v
    # not rewritten inside string literals
    assert e.execute("SELECT 'version()' AS x",
                     dialect="postgres").collect()[0].x == "version()"


def test_pg_sequence_lifecycle(spark, tmp_path):
    """CREATE/DROP/ALTER SEQUENCE + nextval/currval/setval/lastval
    (round-8 verdict item #3; reference gets these via the pg→DuckDB
    passthrough, catalog/table.go:219,259,802). Counter persists
    across engine restarts; per-occurrence nextval gives per-row ids
    in multi-row VALUES; per-row scan shapes reject toward
    AUTO_INCREMENT."""
    import pytest

    from myduckserver_spark.engine import Engine

    wh = str(tmp_path / "wh")
    e = Engine(spark, wh)

    def val(q):
        return e.execute(q, dialect="postgres").collect()[0][0]

    e.execute("CREATE SEQUENCE seq1")
    assert [val("SELECT nextval('seq1')") for _ in range(3)] == [1, 2, 3]
    assert val("SELECT currval('seq1')") == 3
    assert val("SELECT lastval()") == 3
    assert val("SELECT setval('seq1', 100)") == 100
    assert val("SELECT nextval('seq1')") == 101
    assert val("SELECT setval('seq1', 200, false)") == 200
    assert val("SELECT nextval('seq1')") == 200  # is_called=false
    # options: START / INCREMENT / MAXVALUE / CYCLE
    e.execute("CREATE SEQUENCE seq2 START WITH 10 INCREMENT BY 5 "
              "MAXVALUE 21 CYCLE")
    assert [val("SELECT nextval('seq2')") for _ in range(4)] \
        == [10, 15, 20, 1]
    e.execute("ALTER SEQUENCE seq2 RESTART WITH 7", dialect="postgres")
    assert val("SELECT nextval('seq2')") == 7
    # restart: counter persisted in warehouse metadata
    e2 = Engine(spark, wh)
    assert e2.execute("SELECT currval('seq1')",
                      dialect="postgres").collect()[0][0] == 200
    assert e2.execute("SELECT nextval('seq1')",
                      dialect="postgres").collect()[0][0] == 201
    # per-occurrence nextval in a VALUES list = per-row ids
    e.execute("CREATE TABLE ts (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO ts VALUES (nextval('seq1'), 1), "
              "(nextval('seq1'), 2)", dialect="postgres")
    ids = sorted(r.id for r in e.execute("SELECT id FROM ts").collect())
    assert ids == [202, 203]
    # post-COPY migration shape: setval from a scalar subquery
    assert val("SELECT setval('seq1', (SELECT max(id) FROM ts))") == 203
    # per-row scan semantics: clear rejection
    with pytest.raises(NotImplementedError, match="AUTO_INCREMENT"):
        e.execute("INSERT INTO ts SELECT nextval('seq1'), v FROM ts",
                  dialect="postgres")
    with pytest.raises(NotImplementedError, match="AUTO_INCREMENT"):
        e.execute("UPDATE ts SET id = nextval('seq1')",
                  dialect="postgres")
    # DROP + error surfaces
    e.execute("DROP SEQUENCE seq2")
    with pytest.raises(ValueError, match="does not exist"):
        val("SELECT nextval('seq2')")
    e.execute("DROP SEQUENCE IF EXISTS seq2")
    e.execute("CREATE SEQUENCE fresh")
    with pytest.raises(ValueError, match="not yet defined"):
        val("SELECT currval('fresh')")
    with pytest.raises(ValueError, match="already exists"):
        e.execute("CREATE SEQUENCE seq1")
    e.execute("CREATE SEQUENCE IF NOT EXISTS seq1")  # no-op
    # exhaustion without CYCLE
    e.execute("CREATE SEQUENCE cap MAXVALUE 2")
    assert [val("SELECT nextval('cap')") for _ in range(2)] == [1, 2]
    with pytest.raises(ValueError, match="maximum value"):
        val("SELECT nextval('cap')")
    # schema-qualified + regclass-cast forms normalize
    e.execute("CREATE SEQUENCE public.qual_seq START 5")
    assert val("SELECT nextval('public.qual_seq'::regclass)") == 5
    assert val("SELECT nextval('qual_seq')") == 6


def test_pg_json_path_ops_and_misc_shims(spark, tmp_path):
    """#> / #>> / #- JSON path operators, string_to_array, pg_typeof,
    current_setting (round-8 verdict item #4; reference passes the
    operators through to DuckDB and shims current_setting eagerly,
    pgserver/in_place_handler.go:26-200)."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))

    def row(q):
        return e.execute(q, dialect="postgres").collect()[0]

    doc = '\'{"a":{"b":[10,20]},"k":1}\'::jsonb'
    assert row(f"SELECT {doc} #> '{{a,b,1}}' AS x").x == "20"
    assert row(f"SELECT {doc} #>> '{{a,b}}' AS x").x == "[10,20]"
    assert row(f"SELECT {doc} #- '{{a}}' AS x").x == '{"k": 1}'
    # XOR still works alongside (the operators are consumed first)
    assert row("SELECT 5 # 3 AS x").x == 6
    assert row("SELECT string_to_array('a.b.c', '.') AS p").p \
        == ["a", "b", "c"]
    assert row("SELECT string_to_array('x~y~z', '~', 'y') AS p").p \
        == ["x", None, "z"]
    assert row("SELECT pg_typeof(1.5::double precision) AS t").t \
        == "double"
    assert row("SELECT current_setting('server_version') AS v").v \
        == "15.0"
    assert row(
        "SELECT current_setting('no_such_thing', true) AS v").v is None
    with pytest.raises(ValueError, match="unrecognized configuration"):
        row("SELECT current_setting('no_such_thing')")
    # SET custom GUC then read it back (Django/RLS tenant pattern)
    e.execute("SET myapp.tenant = 'acme'")
    assert row("SELECT current_setting('myapp.tenant') AS t").t == "acme"


def test_duckdb_star_modifiers_and_literals(spark, tmp_path):
    """DuckDB dialect via the pg door (round-8 verdict item #8):
    * EXCLUDE -> Spark * EXCEPT; * REPLACE -> * EXCEPT + trailing
    re-projection (values/names identical, position diverges —
    documented); bare [..] list literals and {'k': v} struct literals
    -> array()/named_struct()."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, b INT, c VARCHAR(4))")
    e.execute("INSERT INTO t VALUES (1, 2, 'x')")
    r = e.execute("SELECT * EXCLUDE (b) FROM t", dialect="postgres")
    assert r.columns == ["a", "c"]
    r = e.execute("SELECT * EXCLUDE c FROM t", dialect="postgres")
    assert r.columns == ["a", "b"]
    r = e.execute(
        "SELECT * REPLACE (a * 10 AS a, upper(c) AS c) FROM t",
        dialect="postgres",
    ).collect()[0]
    assert (r.a, r.b, r.c) == (10, 2, "X")
    row = e.execute(
        "SELECT [1, 2, 3] AS l, {'k': 7, 'n': [4, 5]} AS s, "
        "[10, 20][1] AS first FROM t",
        dialect="postgres",
    ).collect()[0]
    assert row.l == [1, 2, 3]
    assert row.s.k == 7 and row.s.n == [4, 5]
    assert row.first == 10


def test_pg_array_length_and_regexp_flags(spark, tmp_path):
    """array_length(a, 1) -> size; 4-arg regexp_replace 'g'/'gi'
    flags (probe-battery round 9)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))

    def row(q):
        return e.execute(q, dialect="postgres").collect()[0]

    assert row("SELECT array_length(ARRAY[1,2,3], 1) AS al").al == 3
    r = row("SELECT regexp_replace('abcb', 'b', 'X', 'g') AS rr, "
            "regexp_replace('ABC', 'b', 'X', 'gi') AS ri")
    assert (r.rr, r.ri) == ("aXcX", "AXC")


def test_pg_function_battery_round9(spark, tmp_path):
    """Probe-battery round-9 pg shims: pg_type catalog (qualified and
    bare — drivers resolve array OIDs at handshake), array helpers,
    format, quote_*, encode/decode, regex substring, age, jsonb
    lengths/elements, ? key-existence, FROM-comma unnest lateral."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY)")
    e.execute("INSERT INTO t VALUES (1), (2)")

    def row(q):
        return e.execute(q, dialect="postgres").collect()[0]

    r = row("SELECT oid, typarray FROM pg_type WHERE typname = 'int4'")
    assert (r.oid, r.typarray) == (23, 1007)
    assert row("SELECT oid FROM pg_catalog.pg_type "
               "WHERE typname = 'varchar'").oid == 1043
    assert row("SELECT array_to_string(ARRAY[1,NULL,3], ',', '*') "
               "AS x").x == "1,*,3"
    assert row("SELECT array_cat(ARRAY[1], ARRAY[2]) AS x").x == [1, 2]
    assert row("SELECT array_prepend(0, ARRAY[1,2]) AS x").x == [0, 1, 2]
    assert row("SELECT format('Hi %s #%d', 'a', 7) AS x").x == "Hi a #7"
    r = row("SELECT quote_ident('my col') AS qi, "
            "quote_literal('it''s') AS ql")
    assert (r.qi, r.ql) == ('"my col"', "'it''s'")
    r = row("SELECT encode('abc'::bytea, 'hex') AS h, "
            "decode('616263', 'hex') AS d")
    assert r.h == "616263" and bytes(r.d) == b"abc"
    assert row("SELECT substring('Thomas' from '...$') AS x").x == "mas"
    assert row("SELECT substring('Thomas' from 'h(.)m') AS x").x == "o"
    assert row("SELECT (age(TIMESTAMP '2024-02-01', "
               "TIMESTAMP '2024-01-01') > INTERVAL '20 days') AS x").x
    assert row("SELECT jsonb_array_length('[1,2,3]'::jsonb) AS x").x == 3
    vals = [r[0] for r in e.execute(
        "SELECT json_array_elements_text('[\"x\", 2]'::json) AS v",
        dialect="postgres").collect()]
    assert vals == ["x", "2"]
    r = row("SELECT '{\"a\":1}'::jsonb ? 'a' AS k1, "
            "'{\"a\":1}'::jsonb ? 'b' AS k2")
    assert (r.k1, r.k2) == (True, False)
    rows = e.execute(
        "SELECT t.a, x FROM t, unnest(ARRAY[1,2]) AS x ORDER BY a, x",
        dialect="postgres").collect()
    assert [(r.a, r.x) for r in rows] == [(1, 1), (1, 2), (2, 1), (2, 2)]
    rows = e.execute(
        "SELECT t.a, x FROM t, unnest(ARRAY[7]) AS u(x) ORDER BY a",
        dialect="postgres").collect()
    assert [(r.a, r.x) for r in rows] == [(1, 7), (2, 7)]
    # round 10: containment is implemented (empty object ⊆ anything)
    assert row("SELECT ('{\"a\":1}'::jsonb @> '{}'::jsonb) AS x").x \
        is True


def test_mysql_random_bytes(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    r = e.execute("SELECT LENGTH(RANDOM_BYTES(16)) AS a, "
                  "LENGTH(RANDOM_BYTES(48)) AS b").collect()[0]
    assert (r.a, r.b) == (16, 48)


def test_pg_battery_round9_part2(spark, tmp_path):
    """to_date/to_timestamp with pg formats, dow/isodow numbering,
    clock/statement/transaction_timestamp, bare localtimestamp,
    num_nonnulls/num_nulls, div/trunc/starts_with, pg_sleep,
    pg size/introspection shims (probe battery round 9)."""
    import datetime as dt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY)")
    e.execute("INSERT INTO t VALUES (1)")

    def row(q):
        return e.execute(q, dialect="postgres").collect()[0]

    assert row("SELECT to_date('2024-08-16', 'YYYY-MM-DD') AS d").d \
        == dt.date(2024, 8, 16)
    assert row("SELECT to_timestamp('2024-08-16 10:00', "
               "'YYYY-MM-DD HH24:MI') AS t").t \
        == dt.datetime(2024, 8, 16, 10, 0)
    r = row("SELECT extract(dow from DATE '2024-08-18') AS d, "
            "extract(isodow from DATE '2024-08-18') AS i")
    assert (r.d, r.i) == (0, 7)  # Sunday: pg dow=0, isodow=7
    assert row("SELECT clock_timestamp() IS NOT NULL AS c, "
               "localtimestamp IS NOT NULL AS l").c
    r = row("SELECT num_nonnulls(1, NULL, 2) AS a, "
            "num_nulls(1, NULL) AS b")
    assert (r.a, r.b) == (2, 1)
    r = row("SELECT div(9, 4) AS d, trunc(-42.8) AS t, "
            "starts_with('alpha', 'al') AS s, pg_sleep(0) = 0 AS p")
    assert (r.d, int(r.t), r.s, r.p) == (2, -42, True, True)
    r = row("SELECT pg_database_size('main') > 0 AS a, "
            "pg_table_size('t') > 0 AS b")
    assert (r.a, r.b) == (True, True)
    r = row("SELECT pg_size_pretty(1536::bigint) AS a, "
            "pg_size_pretty(10485760::bigint) AS b")
    assert (r.a, r.b) == ("1536 bytes", "10.0 MB")
    r = row("SELECT pg_get_userbyid(10) AS u, txid_current() AS t, "
            "pg_is_in_recovery() AS rec, "
            "has_table_privilege('t', 'SELECT') AS h")
    assert (r.u, r.t, r.rec, r.h) == ("root", 0, False, True)


def test_pg_similar_to_like_aliases_array_subquery(spark, tmp_path):
    """SIMILAR TO (SQL-regex dialect, full-anchored), the ~~/!~~/~~*/
    !~~* LIKE-operator aliases (previously mis-lexed as regex ops),
    and ARRAY(SELECT ...) -> scalar collect_list (round 9)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY)")
    e.execute("INSERT INTO t VALUES (1), (2)")

    def row(q):
        return e.execute(q, dialect="postgres").collect()[0]

    assert row("SELECT ARRAY(SELECT a FROM t ORDER BY a) AS x").x \
        == [1, 2]
    r = row("SELECT 'abc' SIMILAR TO '%(b|d)%' AS a, "
            "'abc' SIMILAR TO '(b|c)%' AS b, "
            "'abc' NOT SIMILAR TO 'a_c' AS c")
    assert (r.a, r.b, r.c) == (True, False, False)
    r = row("SELECT 'xy' ~~ 'x%' AS a, 'xy' !~~ 'z%' AS b, "
            "'XY' ~~* 'x%' AS c, 'XY' !~~* 'x%' AS d, "
            "'hat' ~ 'h.t' AS e")
    assert (r.a, r.b, r.c, r.d, r.e) == (True, True, True, False, True)


def test_duckdb_dialect_function_batch(spark, tmp_path):
    """DuckDB dialect through the pg door (the reference exposes
    DuckDB SQL verbatim): list_* family, struct_pack, regexp_matches
    (partial), 2-arg regexp_extract (group 0), strftime/strptime
    (C-style % tokens via the MySQL format mapper), epoch/epoch_ms,
    date_diff/date_add, range() in scalar and FROM position,
    string_split (round 9)."""
    import datetime as dt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))

    def row(q):
        return e.execute(q, dialect="postgres").collect()

    r = row("SELECT list_value(1, 2) AS a, list_contains([1, 2], 2) "
            "AS b, list_filter([1,2,3], x -> x > 1) AS c, "
            "list_sort([3,1]) AS d, list_extract([10, 20], 2) AS f")[0]
    assert (r.a, r.b, r.c, r.d, r.f) == ([1, 2], True, [2, 3],
                                         [1, 3], 20)
    r = row("SELECT list_aggregate([1, 2, 3], 'sum') AS s, "
            "list_aggregate([1, 2], 'avg') AS a, "
            "list_sum([1.5, 2.5]) AS ls")[0]
    assert (r.s, r.a, r.ls) == (6.0, 1.5, 4.0)
    r = row("SELECT struct_pack(x := 1, y := 'two') AS sp")[0]
    assert (r.sp.x, r.sp.y) == (1, "two")
    r = row("SELECT regexp_matches('abc', 'b') AS m, "
            "regexp_extract('abc123', '[0-9]+') AS e")[0]
    assert (r.m, r.e) == (True, "123")
    r = row("SELECT strftime(DATE '2024-08-16', '%Y-%m') AS f, "
            "strptime('2024-08-16', '%Y-%m-%d') AS p, "
            "epoch(TIMESTAMP '2024-01-01 00:00:00') AS ep")[0]
    assert (r.f, r.p, r.ep) == ("2024-08",
                                dt.datetime(2024, 8, 16), 1704067200)
    r = row("SELECT date_diff('day', DATE '2024-01-01', "
            "DATE '2024-03-01') AS d, date_add(DATE '2024-01-01', "
            "INTERVAL 1 MONTH) AS a, range(3) AS r")[0]
    assert (r.d, r.a, r.r) == (60, dt.date(2024, 2, 1), [0, 1, 2])
    assert [x[0] for x in row("SELECT x FROM range(1, 4) AS t(x)")] \
        == [1, 2, 3]
    assert row("SELECT string_split('a,b', ',') AS s")[0].s \
        == ["a", "b"]


def test_nextval_rejects_select_with_from(spark, tmp_path):
    """Constant-folded nextval in a multi-row SELECT would stamp every
    scanned row with the SAME id — reject per-row shapes (round-10
    ADVICE); the FROM-less probe stays allowed."""
    import pytest
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_seqguard"))
    e.execute("CREATE SEQUENCE gs START 7", dialect="postgres")
    r = e.execute("SELECT nextval('gs') AS v",
                  dialect="postgres").collect()
    assert r[0].v == 7
    e.execute("CREATE TABLE st (a INT)", dialect="postgres")
    e.execute("INSERT INTO st VALUES (1), (2)", dialect="postgres")
    with pytest.raises(NotImplementedError, match="per-row"):
        e.execute("SELECT nextval('gs') FROM st", dialect="postgres")


def test_from_table_fn_aliasless_before_clause():
    """`FROM range(5) WHERE ...` / `FROM t, unnest(a) WHERE ...` —
    a clause keyword after the table function is NOT its alias
    (round-10 ADVICE: the bare alias capture ate WHERE)."""
    from myduckserver_spark.functions.pg_compat import translate_postgres

    out = translate_postgres("SELECT * FROM range(5) WHERE range < 3")
    assert "AS WHERE" not in out.upper()
    assert "WHERE range < 3" in out
    out = translate_postgres("SELECT x FROM t, unnest(a) WHERE x < 3")
    assert "AS WHERE" not in out.upper()
    assert "LATERAL VIEW explode(a)" in out
    # aliased forms still capture
    out = translate_postgres("SELECT * FROM t, unnest(a) t2(x)")
    assert "t2 AS x" in out


def test_pg_quantified_any_all(spark, tmp_path):
    """pg quantified comparisons (round-10 verdict #1): the psycopg
    list-parameter idiom `= ANY(ARRAY[...])`, array-column ANY/ALL
    (exists/forall lambdas, pg three-valued logic), and the subquery
    forms routed through the shared quantifier rewrite."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_any"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    # scalar array forms + 3VL parity with pg
    assert val("SELECT 3 = ANY(ARRAY[1,2,3])") is True
    assert val("SELECT 9 = ANY(ARRAY[1,2,3])") is False
    assert val("SELECT 2 = ANY(ARRAY[2,NULL])") is True
    assert val("SELECT 1 = ANY(ARRAY[2,NULL])") is None
    assert val("SELECT 5 > ALL(ARRAY[1,2])") is True
    assert val("SELECT 5 <> ALL(ARRAY[1,2])") is True
    assert val("SELECT 2 <> ALL(ARRAY[1,2])") is False
    assert val("SELECT 4 >= SOME(ARRAY[9, 4])") is True
    # array-valued column + WHERE context
    e.execute("CREATE TABLE qa (id INT, tags text[])", dialect="postgres")
    e.execute("INSERT INTO qa VALUES (1, ARRAY['red','blue']), "
              "(2, ARRAY['green'])", dialect="postgres")
    rows = e.execute(
        "SELECT id FROM qa WHERE 'red' = ANY(tags) ORDER BY id",
        dialect="postgres").collect()
    assert [r.id for r in rows] == [1]
    rows = e.execute(
        "SELECT id FROM qa WHERE 'red' <> ALL(tags) ORDER BY id",
        dialect="postgres").collect()
    assert [r.id for r in rows] == [2]
    # subquery forms through the pg door
    e.execute("CREATE TABLE qs (m INT)", dialect="postgres")
    e.execute("INSERT INTO qs VALUES (2), (4)", dialect="postgres")
    rows = e.execute(
        "SELECT id FROM qa WHERE id = ANY(SELECT m - 1 FROM qs)",
        dialect="postgres").collect()
    assert [r.id for r in rows] == [1]
    rows = e.execute(
        "SELECT id FROM qa WHERE id < ALL(SELECT m FROM qs) ORDER BY id",
        dialect="postgres").collect()
    assert [r.id for r in rows] == [1]
    rows = e.execute(
        "SELECT id FROM qa WHERE id > ANY(SELECT m FROM qs) ORDER BY id",
        dialect="postgres").collect()
    assert [r.id for r in rows] == []


def test_json_each_table_functions(spark, tmp_path):
    """pg json_each/jsonb_each[_text] + json_object_keys as
    FROM-position table functions (round-10 verdict #4): inline()
    over a key/value entry array, pg-exact column names and value
    encodings."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_jeach"))

    rows = e.execute(
        """SELECT key, value FROM json_each('{"a":1,"b":"x"}')
           ORDER BY key""", dialect="postgres").collect()
    assert [(r.key, r.value) for r in rows] == [("a", "1"), ("b", '"x"')]
    rows = e.execute(
        """SELECT key, value FROM jsonb_each_text('{"a":1,"b":"x"}')
           ORDER BY key""", dialect="postgres").collect()
    assert [(r.key, r.value) for r in rows] == [("a", "1"), ("b", "x")]
    rows = e.execute(
        """SELECT * FROM json_object_keys('{"a":1,"b":2}')""",
        dialect="postgres").collect()
    assert [r.json_object_keys for r in rows] == ["a", "b"]

    # implicit-lateral comma form over a table column
    e.execute("CREATE TABLE js (id INT, j TEXT)", dialect="postgres")
    e.execute("""INSERT INTO js VALUES (1, '{"x":1,"y":2}'),
                 (2, '{"z":3}')""", dialect="postgres")
    rows = e.execute(
        "SELECT t.id, e.key, e.value FROM js t, json_each(t.j) e "
        "ORDER BY t.id, e.key", dialect="postgres").collect()
    assert [(r.id, r.key, r.value) for r in rows] == [
        (1, "x", "1"), (1, "y", "2"), (2, "z", "3")]
    # column-alias form e(k, v)
    rows = e.execute(
        "SELECT t.id, e.k, e.v FROM js t, json_each_text(t.j) "
        "AS e(k, v) ORDER BY t.id, e.k", dialect="postgres").collect()
    assert [(r.id, r.k, r.v) for r in rows] == [
        (1, "x", "1"), (1, "y", "2"), (2, "z", "3")]
    # single-column SRF alias names the column (pg rule)
    rows = e.execute(
        "SELECT t.id, k FROM js t, json_object_keys(t.j) AS k "
        "ORDER BY t.id, k", dialect="postgres").collect()
    assert [(r.id, r.k) for r in rows] == [
        (1, "x"), (1, "y"), (2, "z")]


def test_pg_format_trunc_between_symmetric(spark, tmp_path):
    """Round-10 verdict #6 battery: format() %I/%L specifiers,
    2-arg numeric trunc, BETWEEN SYMMETRIC."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_fmt"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT format('Hello %s, number %s', 'world', 42)") \
        == "Hello world, number 42"
    assert val("SELECT format('CREATE TABLE %I (c text)', 'my tbl')") \
        == 'CREATE TABLE "my tbl" (c text)'
    assert val("SELECT format('%I', 'weird\"name')") == '"weird""name"'
    assert val("SELECT format('%s = %L', 'nm', 'O''Brien')") \
        == "nm = 'O''Brien'"
    assert val("SELECT format('v = %L', NULL)") == "v = NULL"
    assert val("SELECT format('%s%%', 50)") == "50%"

    assert float(val("SELECT trunc(42.4382, 2)")) == 42.43
    assert float(val("SELECT trunc(-1.999, 2)")) == -1.99
    assert float(val("SELECT trunc(9.99)")) == 9.0
    assert float(val("SELECT trunc(-9.99)")) == -9.0

    assert val("SELECT 5 BETWEEN SYMMETRIC 10 AND 1") is True
    assert val("SELECT 5 BETWEEN SYMMETRIC 1 AND 10") is True
    assert val("SELECT 0 BETWEEN SYMMETRIC 10 AND 1") is False
    e.execute("CREATE TABLE bsy (x INT)", dialect="postgres")
    e.execute("INSERT INTO bsy VALUES (1), (5), (11)",
              dialect="postgres")
    rows = e.execute(
        "SELECT x FROM bsy WHERE x BETWEEN SYMMETRIC 10 AND 2 "
        "ORDER BY x", dialect="postgres").collect()
    assert [r.x for r in rows] == [5]


def test_duckdb_vector_similarity_spellings(spark, tmp_path):
    """DuckDB vector-similarity functions through the pg door
    (round-10 verdict #7): list/array_cosine_similarity, _distance,
    _inner_product — the plain-SQL spelling of the vector workflow.
    Ranking must agree with brute-force cosine."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_vsim"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert abs(val("SELECT list_cosine_similarity("
                   "ARRAY[1.0,0.0], ARRAY[1.0,0.0])") - 1.0) < 1e-9
    assert abs(val("SELECT array_cosine_similarity("
                   "ARRAY[1.0,0.0], ARRAY[0.0,1.0])")) < 1e-9
    assert abs(val("SELECT list_distance("
                   "ARRAY[0.0,0.0], ARRAY[3.0,4.0])") - 5.0) < 1e-9
    assert abs(val("SELECT list_inner_product("
                   "ARRAY[1.0,2.0], ARRAY[3.0,4.0])") - 11.0) < 1e-9
    assert abs(val("SELECT list_cosine_distance("
                   "ARRAY[1.0,0.0], ARRAY[1.0,0.0])")) < 1e-9

    # order-by-similarity over a table column matches brute force
    e.execute("CREATE TABLE vv (id INT, v FLOAT[2])", dialect="postgres")
    e.execute("INSERT INTO vv VALUES (1, ARRAY[1.0,0.0]), "
              "(2, ARRAY[0.7,0.7]), (3, ARRAY[0.0,1.0])",
              dialect="postgres")
    rows = e.execute(
        "SELECT id FROM vv ORDER BY "
        "list_cosine_similarity(v, ARRAY[1.0,0.1]) DESC",
        dialect="postgres").collect()
    assert [r.id for r in rows] == [1, 2, 3]


def test_star_replace_keeps_ordinal_position(spark, tmp_path):
    """`SELECT * REPLACE (e AS c)` keeps the replaced column at its
    original position like DuckDB when the FROM table is resolvable
    (round-10 verdict #8)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_star"))
    e.execute("CREATE TABLE sr (a INT, b INT, c INT)",
              dialect="postgres")
    e.execute("INSERT INTO sr VALUES (1, 2, 3)", dialect="postgres")
    df = e.execute("SELECT * REPLACE (b * 10 AS b) FROM sr",
                   dialect="postgres")
    assert df.columns == ["a", "b", "c"]
    assert [tuple(r) for r in df.collect()] == [(1, 20, 3)]
    df = e.execute("SELECT t.* REPLACE (c + 1 AS c) FROM sr t",
                   dialect="postgres")
    assert df.columns == ["a", "b", "c"]
    assert [tuple(r) for r in df.collect()] == [(1, 2, 4)]


def test_battery17_pg_surface(spark, tmp_path):
    """Round-10 probe battery 17: jsonb ?|/?&, jsonb_set,
    json_strip_nulls, jsonb_pretty, array_replace,
    generate_subscripts, regexp_split_to_table, unnest WITH
    ORDINALITY — all pg-exact."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b17"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("""SELECT '{"a":1}'::jsonb ?| ARRAY['a','z']""") is True
    assert val("""SELECT '{"a":1}'::jsonb ?| ARRAY['y','z']""") is False
    assert val("""SELECT '{"a":1,"b":2}'::jsonb ?& ARRAY['a','b']""") \
        is True
    assert val("""SELECT '{"a":1}'::jsonb ?& ARRAY['a','b']""") is False
    import json
    assert json.loads(val(
        """SELECT jsonb_set('{"a":1,"b":2}', '{a}', '9')""")) \
        == {"a": 9, "b": 2}
    assert json.loads(val(
        """SELECT jsonb_set('{"a":[{"b":1}]}', '{a,0,b}', '"x"')""")) \
        == {"a": [{"b": "x"}]}
    # create_missing=false leaves absent paths untouched
    assert json.loads(val(
        """SELECT jsonb_set('{"a":1}', '{z}', '5', false)""")) \
        == {"a": 1}
    assert json.loads(val(
        """SELECT json_strip_nulls('{"a":null,"b":{"c":null,"d":1}}')
        """)) == {"b": {"d": 1}}
    assert "\n" in val("""SELECT jsonb_pretty('{"a":1}')""")
    assert list(val(
        "SELECT array_replace(ARRAY[1,2,1], 1, 9)")) == [9, 2, 9]
    rows = e.execute(
        "SELECT generate_subscripts(ARRAY[10,20,30], 1) AS i",
        dialect="postgres").collect()
    assert [r.i for r in rows] == [1, 2, 3]
    rows = e.execute(
        "SELECT x FROM regexp_split_to_table('a,b,c', ',') AS x",
        dialect="postgres").collect()
    assert [r.x for r in rows] == ["a", "b", "c"]
    rows = e.execute(
        "SELECT u, o FROM unnest(ARRAY['x','y']) WITH ORDINALITY "
        "AS t(u, o)", dialect="postgres").collect()
    assert [(r.u, r.o) for r in rows] == [("x", 1), ("y", 2)]
    # lateral WITH ORDINALITY over a table column
    e.execute("CREATE TABLE uo (id INT, a text[])", dialect="postgres")
    e.execute("INSERT INTO uo VALUES (1, ARRAY['p','q'])",
              dialect="postgres")
    rows = e.execute(
        "SELECT t.id, e.v, e.i FROM uo t, unnest(t.a) "
        "WITH ORDINALITY AS e(v, i) ORDER BY e.i",
        dialect="postgres").collect()
    assert [(r.id, r.v, r.i) for r in rows] == [(1, "p", 1), (1, "q", 2)]


def test_pg_overlaps_operator(spark, tmp_path):
    """pg (s1, e1) OVERLAPS (s2, e2) datetime overlap (round-10
    battery): pair-normalized half-open interval intersection."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_ovl"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT (DATE '2024-01-01', DATE '2024-02-01') "
               "OVERLAPS (DATE '2024-01-15', DATE '2024-03-01')") is True
    assert val("SELECT (DATE '2024-01-01', DATE '2024-02-01') "
               "OVERLAPS (DATE '2024-02-01', DATE '2024-03-01')") is False
    # pg normalizes reversed pairs
    assert val("SELECT (DATE '2024-02-01', DATE '2024-01-01') "
               "OVERLAPS (DATE '2024-01-15', DATE '2024-03-01')") is True


def test_pg_session_and_slice_surface(spark, tmp_path):
    """Round-10 battery 19: pg SET ... TO / SHOW <setting>, array
    slices, to_hex, CREATE TEMP TABLE — the psql/ORM connection
    bootstrap surface."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b19"))
    e.execute("SET search_path TO public", dialect="postgres")
    row = e.execute("SHOW search_path", dialect="postgres").collect()
    assert row[0][0] == "public"
    row = e.execute("SHOW standard_conforming_strings",
                    dialect="postgres").collect()
    assert row[0][0] == "on"
    row = e.execute("SHOW server_version", dialect="postgres").collect()
    assert row[0][0].startswith("15")
    assert list(e.execute("SELECT (ARRAY[10,20,30,40])[2:3] AS s",
                          dialect="postgres").collect()[0].s) == [20, 30]
    assert e.execute("SELECT to_hex(255) AS h",
                     dialect="postgres").collect()[0].h == "ff"
    e.execute("CREATE TEMP TABLE b19tmp AS SELECT 1 AS x",
              dialect="postgres")
    assert e.execute("SELECT x FROM b19tmp",
                     dialect="postgres").collect()[0].x == 1
    # temp tables stay hidden from SHOW TABLES (TEMPORARY semantics)
    names = [r[0] for r in e.execute("SHOW TABLES").collect()]
    assert "b19tmp" not in names


def test_battery22_bi_aggregates_and_time(spark, tmp_path):
    """Round-10 battery 22: BI aggregate/time surface — WITHIN GROUP
    percentiles/mode, array_agg DISTINCT, date_bin, pg-only extract
    fields, FETCH FIRST WITH TIES, string_to_table."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b22"))
    e.execute("CREATE TABLE m (g VARCHAR(5), x DOUBLE)",
              dialect="postgres")
    e.execute("INSERT INTO m VALUES ('a',1),('a',2),('a',2),('b',10)",
              dialect="postgres")

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT percentile_cont(0.5) WITHIN GROUP "
               "(ORDER BY x) FROM m") == 2.0
    assert val("SELECT mode() WITHIN GROUP (ORDER BY g) FROM m") == "a"
    assert list(val(
        "SELECT array_agg(DISTINCT g ORDER BY g) FROM m")) == ["a", "b"]
    assert str(val(
        "SELECT date_bin(interval '15 minutes', "
        "timestamp '2024-01-01 00:37:00', "
        "timestamp '2024-01-01 00:00:00')")) == "2024-01-01 00:30:00"
    assert val("SELECT extract(isoyear from date '1999-01-01')") == 1998
    assert val("SELECT extract(century from date '2024-01-01')") == 21
    assert val("SELECT extract(milliseconds from "
               "timestamp '2024-01-01 00:00:01.5')") == 1500
    rows = e.execute(
        "SELECT x FROM m ORDER BY x FETCH FIRST 2 ROWS WITH TIES",
        dialect="postgres").collect()
    assert sorted(r.x for r in rows) == [1.0, 2.0, 2.0]  # ties kept
    rows = e.execute("SELECT string_to_table('a.b', '.') AS s",
                     dialect="postgres").collect()
    assert [r.s for r in rows] == ["a", "b"]  # literal sep, not regex


def test_pg_dump_restore_end_to_end(spark, tmp_path):
    """A faithful slice of pg_dump 15 output restores end-to-end
    (round-10 battery 23): SET preamble + set_config, public.-
    qualified DDL/DML, jsonb/text[]/numeric columns, sequence
    lifecycle incl. OWNED BY and setval, ALTER TABLE ONLY ... ADD
    CONSTRAINT, CREATE INDEX USING btree, COMMENT ON."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgdump"))
    dump = """
    SET statement_timeout = 0;
    SET client_encoding = 'UTF8';
    SET standard_conforming_strings = on;
    SELECT pg_catalog.set_config('search_path', '', false);
    CREATE TABLE public.accounts (
        id integer NOT NULL,
        email text NOT NULL,
        balance numeric(12,2) DEFAULT 0.00,
        tags text[],
        meta jsonb,
        created_at timestamp without time zone DEFAULT now()
    );
    CREATE SEQUENCE public.accounts_id_seq
        AS integer START WITH 1 INCREMENT BY 1
        NO MINVALUE NO MAXVALUE CACHE 1;
    ALTER SEQUENCE public.accounts_id_seq OWNED BY public.accounts.id;
    INSERT INTO public.accounts VALUES (1, 'a@x.com', 10.50,
        ARRAY['vip','beta'], '{"plan":"pro"}', '2024-01-01 00:00:00');
    INSERT INTO public.accounts VALUES (2, 'b@x.com', 0.00,
        ARRAY['beta'], '{"plan":"free"}', '2024-01-02 00:00:00');
    SELECT pg_catalog.setval('public.accounts_id_seq', 2, true);
    ALTER TABLE ONLY public.accounts
        ADD CONSTRAINT accounts_pkey PRIMARY KEY (id);
    CREATE INDEX idx_accounts_email ON public.accounts
        USING btree (email);
    COMMENT ON TABLE public.accounts IS 'user accounts';
    """
    for stmt in [x.strip() for x in dump.split(";") if x.strip()]:
        e.execute(stmt, dialect="postgres")
    rows = e.execute(
        "SELECT id, email, tags, meta->>'plan' AS plan "
        "FROM public.accounts ORDER BY id",
        dialect="postgres").collect()
    assert [(r.id, r.email, list(r.tags), r.plan) for r in rows] == [
        (1, "a@x.com", ["vip", "beta"], "pro"),
        (2, "b@x.com", ["beta"], "free"),
    ]
    assert e.execute("SELECT nextval('accounts_id_seq')",
                     dialect="postgres").collect()[0][0] == 3
    # PK restored: duplicate insert rejects
    import pytest
    with pytest.raises(Exception, match="(?i)duplicate|1062"):
        e.execute("INSERT INTO accounts VALUES (1, 'dup@x.com', 0, "
                  "NULL, NULL, NULL)", dialect="postgres")


def test_pg_quoted_identifiers_and_txn_modifiers(spark, tmp_path):
    """Round-10 battery 24: pg double-quoted identifiers (every ORM
    quotes: SELECT "t"."col" FROM "t"), SET SESSION CHARACTERISTICS,
    BEGIN ISOLATION LEVEL."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b24"))
    e.execute('CREATE TABLE "MixedCase" (id INT, "ColName" TEXT)',
              dialect="postgres")
    e.execute('INSERT INTO "MixedCase" VALUES (1, \'it''s\')',
              dialect="postgres")
    rows = e.execute(
        'SELECT "MixedCase"."ColName" FROM "MixedCase" '
        'WHERE "MixedCase"."id" = 1', dialect="postgres").collect()
    assert rows[0][0] == "its" or rows[0][0] == "it's"
    e.execute("SET SESSION CHARACTERISTICS AS TRANSACTION "
              "ISOLATION LEVEL READ COMMITTED", dialect="postgres")
    e.execute("BEGIN ISOLATION LEVEL SERIALIZABLE", dialect="postgres")
    e.execute("COMMIT", dialect="postgres")


def test_pg_backslash_literal_semantics(spark, tmp_path):
    """standard_conforming_strings=on: a plain pg literal treats
    backslash LITERALLY; Spark's parser processes C-escapes — the
    translator doubles them (round-10: every regex pattern and
    Windows path was silently mangled). E'...' keeps escape
    processing."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_bsl"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val(r"SELECT regexp_extract('hello123', '\d+')") == "123"
    assert val(r"SELECT 'C:\tmp'") == "C:\\tmp"
    assert val(r"SELECT length('a\b')") == 3
    assert val(r"SELECT 'a' ~ '\w'") is True
    assert val(r"SELECT E'a\tb'") == "a\tb"  # E-string: real tab
    assert val(r"SELECT regexp_extract_all('a1b2', '\d')") == ["1", "2"]


def test_battery25_duckdb_dialect_functions(spark, tmp_path):
    """Round-10 battery 25: DuckDB-dialect function surface (the
    reference's pg door IS DuckDB). Includes three fixed silent
    wrong answers: list_unique COUNTS, 2-arg regexp_extract[_all]
    default to group 0, monthname/dayname return full names."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b25"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT list_unique([1,1,2])") == 2
    assert val("SELECT monthname(DATE '2024-02-05')") == "February"
    assert val("SELECT dayname(DATE '2024-02-05')") == "Monday"
    assert list(val("SELECT list_reverse([1,2,3])")) == [3, 2, 1]
    assert list(val("SELECT array_slice([1,2,3,4], 2, 3)")) == [2, 3]
    assert val("SELECT list_avg([2.0, 4.0])") == 3.0
    assert val("SELECT list_reduce([1,2,3], (x, y) -> x + y)") == 6
    assert val("SELECT hamming('abc', 'abd')") == 1
    assert abs(val("SELECT jaccard('abc', 'abd')") - 0.5) < 1e-9
    assert val("SELECT struct_extract({'a': 1, 'b': 2}, 'a')") == 1
    assert list(val("SELECT string_split_regex('a1b2c', '\\d')")) \
        == ["a", "b", "c"]
    assert val("SELECT greatest_common_divisor(12, 8)") == 4
    assert val("SELECT least_common_multiple(4, 6)") == 12
    assert val("SELECT even(2.5)") == 4
    assert val("SELECT even(-2.5)") == -4
    assert val("SELECT isinf('inf'::double)") is True
    assert val("SELECT list_has_all([1,2,3], [1,2])") is True
    assert val("SELECT list_has_any([1,2], [5])") is False
    assert "MiB" in val("SELECT format_bytes(1048576)")
    assert str(val("SELECT time_bucket(interval '15 minutes', "
                   "timestamp '2024-01-01 00:37:00')")) \
        == "2024-01-01 00:30:00"
    assert str(val("SELECT datetrunc('month', DATE '2024-02-15')")) \
        .startswith("2024-02-01")


def test_battery26_power_and_math_operators(spark, tmp_path):
    """Round-10 battery 26: pg's ``^`` is exponentiation — letting it
    reach Spark unchanged silently XORs (2 ^ 10 returned 8). Plus the
    unary math operators |/ (sqrt), ||/ (cbrt), @ (abs), and the ``#``
    XOR spelling that must keep working after the power rewrite."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b26"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT 2 ^ 10") == 1024.0
    assert val("SELECT 2.0 ^ 3") == 8.0
    assert val("SELECT 3 ^ 2 ^ 2") == 81.0  # pg: left-associative
    assert val("SELECT |/ 25.0") == 5.0
    assert val("SELECT ||/ 27.0") == 3.0
    assert val("SELECT @ -5") == 5
    assert val("SELECT @ (3 - 10)") == 7
    assert val("SELECT 5 # 3") == 6  # XOR survives the power rewrite
    assert val("SELECT 1 WHERE 2 ^ 2 = 4.0") == 1
    # ^ inside literals untouched
    assert val("SELECT 'a^b'") == "a^b"


def test_battery26_to_char_numeric_and_json(spark, tmp_path):
    """Numeric to_char templates route to Spark's numeric to_char
    (G/D/L/FM translated) instead of date_format; row_to_json /
    to_jsonb map onto to_json."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b26b"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT to_char(12345.678, 'FM999,999.00')") \
        == "12,345.68"
    assert val("SELECT to_char(12345.678, 'FM999G999D00')") \
        == "12,345.68"
    assert val("SELECT to_char(-485, '999S')") == "485-"
    # datetime templates still route to date_format
    assert val("SELECT to_char(timestamp '2024-03-05 14:30:00', "
               "'YYYY-MM-DD HH24:MI')") == "2024-03-05 14:30"
    assert val("SELECT row_to_json(t) FROM (SELECT 1 AS a, 'x' AS b) t") \
        == '{"a":1,"b":"x"}'
    assert val("SELECT to_jsonb(ARRAY[1,2,3])") == "[1,2,3]"


def test_battery26_session_and_misc(spark, tmp_path):
    """Bare current_schema, live pg_backend_pid, timezone() function
    spelling, array_upper/array_lower, ORDER BY ... USING </>,
    make_interval named arguments."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b26c"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT current_schema") == "main"
    assert val("SELECT pg_backend_pid() > 0") is True
    assert str(val("SELECT timezone('America/New_York', "
                   "timestamp '2024-01-01 12:00:00')")) \
        == "2024-01-01 17:00:00"
    assert val("SELECT array_upper(ARRAY[1,2,3], 1)") == 3
    assert val("SELECT array_lower(ARRAY[1,2,3], 1)") == 1
    assert val("SELECT array_upper(ARRAY[]::int[], 1)") is None
    assert str(val("SELECT timestamp '2024-01-01' + "
                   "make_interval(days => 3)")) == "2024-01-04 00:00:00"
    assert str(val("SELECT make_interval(hours => 2, mins => 30)")) \
        == "2:30:00"
    e.execute("CREATE TABLE ob_using (s TEXT)", dialect="postgres")
    e.execute("INSERT INTO ob_using VALUES ('b'), ('a'), ('c')",
              dialect="postgres")
    rows = e.execute("SELECT s FROM ob_using ORDER BY s USING <",
                     dialect="postgres").collect()
    assert [r[0] for r in rows] == ["a", "b", "c"]
    rows = e.execute("SELECT s FROM ob_using ORDER BY s USING >",
                     dialect="postgres").collect()
    assert [r[0] for r in rows] == ["c", "b", "a"]


def test_battery26_hypothetical_set_aggregates(spark, tmp_path):
    """pg hypothetical-set aggregates rank/dense_rank/percent_rank/
    cume_dist (v) WITHIN GROUP — lowered to conditional aggregates;
    values verified against an independent Python evaluation of the
    pg definitions (DuckDB has no hypothetical-set aggregates)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b26d"))
    e.execute("CREATE TABLE hs (v INT)", dialect="postgres")
    vals = [10, 20, 20, 30, 40, 40, 40, 50]
    e.execute("INSERT INTO hs VALUES " + ", ".join(f"({v})" for v in vals),
              dialect="postgres")

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    probe = 35
    n = len(vals)
    exp_rank = sum(1 for x in vals if x < probe) + 1
    exp_dense = len({x for x in vals if x < probe}) + 1
    exp_pct = sum(1 for x in vals if x < probe) / n
    exp_cume = (sum(1 for x in vals if x <= probe) + 1) / (n + 1)
    assert val(f"SELECT rank({probe}) WITHIN GROUP (ORDER BY v) "
               "FROM hs") == exp_rank
    assert val(f"SELECT dense_rank({probe}) WITHIN GROUP (ORDER BY v) "
               "FROM hs") == exp_dense
    assert abs(val(f"SELECT percent_rank({probe}) WITHIN GROUP "
                   "(ORDER BY v) FROM hs") - exp_pct) < 1e-12
    assert abs(val(f"SELECT cume_dist({probe}) WITHIN GROUP "
                   "(ORDER BY v) FROM hs") - exp_cume) < 1e-12
    exp_rank_d = sum(1 for x in vals if x > probe) + 1
    assert val(f"SELECT rank({probe}) WITHIN GROUP (ORDER BY v DESC) "
               "FROM hs") == exp_rank_d
    # ordered-set aggregates keep their native route
    assert val("SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v) "
               "FROM hs") == 35.0


def test_pg_update_from_delete_using(spark, tmp_path):
    """pg join-DML forms lowered to the engine's multi-table shapes
    (reference ships these verbatim to DuckDB,
    pgserver/connection_handler.go:411-449): UPDATE ... FROM,
    DELETE ... USING, SET-tuple assignment, INSERT DEFAULT VALUES."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgdml"))
    e.execute("CREATE TABLE pt (id INT PRIMARY KEY, name VARCHAR(20), "
              "score DOUBLE)", dialect="postgres")
    e.execute("INSERT INTO pt VALUES (1,'alice',3.5),(2,'bob',1.0),"
              "(3,'cara',4.25)", dialect="postgres")

    def one(sql):
        return e.execute(sql, dialect="postgres").collect()[0]

    # UPDATE ... FROM (VALUES ...) — psql bread-and-butter bulk update
    e.execute("UPDATE pt SET score = v.s FROM (VALUES (2, 7.5)) "
              "AS v(i, s) WHERE pt.id = v.i", dialect="postgres")
    assert one("SELECT score FROM pt WHERE id = 2")[0] == 7.5
    # aliased target + self-join source
    e.execute("UPDATE pt AS p SET score = p.score + q.score FROM pt q "
              "WHERE p.id = 1 AND q.id = 2", dialect="postgres")
    assert one("SELECT score FROM pt WHERE id = 1")[0] == 11.0
    # DELETE ... USING
    e.execute("DELETE FROM pt USING (VALUES (3)) AS d(i) "
              "WHERE pt.id = d.i", dialect="postgres")
    assert one("SELECT count(*) FROM pt")[0] == 2
    # SET (a, b) = (e1, e2) tuple assignment
    e.execute("UPDATE pt SET (name, score) = ('zed', 0.5) WHERE id = 1",
              dialect="postgres")
    assert tuple(one("SELECT name, score FROM pt WHERE id = 1")) == \
        ("zed", 0.5)
    # uncorrelated row-subquery RHS folds (round 10) — evaluated once
    e.execute("UPDATE pt SET (name, score) = (SELECT 'a', 1.0) "
              "WHERE id = 1", dialect="postgres")
    assert tuple(one("SELECT name, score FROM pt WHERE id = 1")) == \
        ("a", 1.0)
    # INSERT ... DEFAULT VALUES over declared defaults
    e.execute("CREATE TABLE dv (id INT AUTO_INCREMENT PRIMARY KEY, "
              "tag VARCHAR(10) DEFAULT 'x')", dialect="mysql")
    e.execute("INSERT INTO dv DEFAULT VALUES", dialect="postgres")
    assert tuple(one("SELECT id, tag FROM dv")) == (1, "x")


def test_pg_paging_row_epoch_array_ops(spark, tmp_path):
    """Round-10 probe batch: ANSI OFFSET/FETCH paging, ROW()
    constructor comparisons, EXTRACT(EPOCH FROM interval), array ||
    element, uuid/sha/advisory shims."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgexpr"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    # OFFSET n ROWS FETCH NEXT m ROWS ONLY (JPA/Hibernate pagination)
    assert val("SELECT a FROM (VALUES (1),(2),(3)) t(a) ORDER BY a "
               "OFFSET 1 ROWS FETCH NEXT 1 ROWS ONLY") == 2
    assert val("SELECT a FROM (VALUES (1),(2),(3)) t(a) ORDER BY a "
               "OFFSET 2 ROWS") == 3
    assert [r[0] for r in e.execute(
        "SELECT a FROM (VALUES (1),(2),(3)) t(a) ORDER BY a DESC "
        "FETCH NEXT 2 ROWS ONLY", dialect="postgres").collect()] == [3, 2]
    # ROW() constructor comparisons (pg composite = Spark struct)
    assert val("SELECT ROW(1,2) = ROW(1,2)") is True
    assert val("SELECT ROW(1,2) = ROW(1,3)") is False
    # EXTRACT(EPOCH FROM interval) — pg timestamp.c constants
    assert val("SELECT extract(epoch from interval '2 hours')") == 7200.0
    assert val("SELECT extract(epoch from interval '1 day 02:03:04')") \
        == 93784.0
    assert val("SELECT extract(epoch from interval '90' minute)") == 5400.0
    assert val("SELECT extract(epoch from interval '1 mon')") == 2592000.0
    # timestamps keep the generic path
    assert val("SELECT extract(epoch from timestamp "
               "'1970-01-01 00:01:00')") == 60.0
    # array || element / element || array; array||array stays concat
    assert val("SELECT ARRAY[1,2] || 3") == [1, 2, 3]
    assert val("SELECT 0 || ARRAY[1,2]") == [0, 1, 2]
    assert val("SELECT ARRAY[1] || ARRAY[2,3]") == [1, 2, 3]
    assert val("SELECT 'a' || 'b' || 'c'") == "abc"
    # uuid / sha / advisory-lock shims
    assert len(val("SELECT gen_random_uuid()::text")) == 36
    assert len(val("SELECT uuid_generate_v4()::text")) == 36
    assert val("SELECT sha256('abc')") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert val("SELECT pg_advisory_lock(1)") is True
    assert val("SELECT pg_try_advisory_lock(2, 3)") is True
    # LISTEN/NOTIFY/UNLISTEN + bare ANALYZE accept as no-ops
    for s in ("LISTEN chan1", "NOTIFY chan1, 'payload'", "UNLISTEN *",
              "ANALYZE"):
        e.execute(s, dialect="postgres")
    # pg ANALYZE <table> routes to the real stats pass
    e.execute("CREATE TABLE az (id INT PRIMARY KEY, v DOUBLE)",
              dialect="postgres")
    e.execute("INSERT INTO az VALUES (1, 2.0)", dialect="postgres")
    rows = e.execute("ANALYZE az", dialect="postgres").collect()
    assert rows[0]["Msg_text"] == "OK"


def test_pg_json_builders_type_fidelity(spark, tmp_path):
    """json[b]_build_object/_build_array keep per-value JSON types
    (pg semantics) instead of coercing through Spark map()/array();
    json_agg accepts ORDER BY."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgjson"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    import json
    assert json.loads(val(
        "SELECT json_build_object('a', 1, 'b', 'two', 'c', true)")) == \
        {"a": 1, "b": "two", "c": True}
    assert json.loads(val(
        "SELECT jsonb_build_array(1, 'x', NULL, 2.5)")) == \
        [1, "x", None, 2.5]
    assert val("SELECT json_build_object()") == "{}"
    # homogeneous-literal fast path stays compact (pinned upstream)
    assert val("SELECT jsonb_build_object('a', 1)") == '{"a":1}'
    assert val("SELECT jsonb_agg(x ORDER BY x DESC) "
               "FROM (VALUES (1),(2)) t(x)") == "[2,1]"
    assert val("SELECT json_agg(x) FROM (VALUES (3),(4)) t(x)") == "[3,4]"


def test_pg_tsearch_operators(spark, tmp_path):
    """pg text search: @@ with tsquery grammar (&, |, !, <->, :*,
    grouping), plainto/phraseto/websearch builders, ts_rank, reversed
    operand order, and clear rejections (distance <N>, non-literal
    query). Normalization is pg's 'simple' config (lowercase,
    non-alphanumerics split) — stemming configs are a documented
    divergence."""
    import pytest
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_ts"))
    e.execute("CREATE TABLE docs (id INT PRIMARY KEY, body TEXT)",
              dialect="postgres")
    e.execute("INSERT INTO docs VALUES "
              "(1,'The quick brown fox jumps'),"
              "(2,'a lazy dog sleeps'),"
              "(3,'quick dogs and lazy foxes'),"
              "(4,'Fox! Quick, brown.')", dialect="postgres")

    def ids(sql):
        return [r[0] for r in
                e.execute(sql, dialect="postgres").collect()]

    assert ids("SELECT id FROM docs WHERE to_tsvector('english', body)"
               " @@ to_tsquery('english', 'fox & quick') ORDER BY id"
               ) == [1, 4]
    assert ids("SELECT id FROM docs WHERE to_tsvector(body) @@ "
               "to_tsquery('lazy & !dog') ORDER BY id") == [3]
    assert ids("SELECT id FROM docs WHERE to_tsvector(body) @@ "
               "to_tsquery('quick <-> brown') ORDER BY id") == [1, 4]
    assert ids("SELECT id FROM docs WHERE to_tsvector(body) @@ "
               "to_tsquery('fox:*') ORDER BY id") == [1, 3, 4]
    assert ids("SELECT id FROM docs WHERE to_tsvector(body) @@ "
               "plainto_tsquery('quick fox') ORDER BY id") == [1, 4]
    assert ids("SELECT id FROM docs WHERE to_tsvector(body) @@ "
               "phraseto_tsquery('quick brown fox') ORDER BY id") == [1]
    assert ids("SELECT id FROM docs WHERE to_tsvector(body) @@ "
               "websearch_to_tsquery('\"quick brown\" -dog or lazy') "
               "ORDER BY id") == [1, 2, 3, 4]
    assert ids("SELECT id FROM docs WHERE to_tsquery('fox') @@ "
               "to_tsvector(body) ORDER BY id") == [1, 4]
    assert ids("SELECT id FROM docs WHERE to_tsvector(body) @@ "
               "to_tsquery('(quick | lazy) & fox') ORDER BY id"
               ) == [1, 4]
    rows = e.execute(
        "SELECT id, ts_rank(to_tsvector(body), "
        "to_tsquery('quick | fox')) AS r FROM docs "
        "ORDER BY r DESC, id", dialect="postgres").collect()
    assert [(r[0], r[1]) for r in rows] == [
        (1, 2.0), (4, 2.0), (3, 1.0), (2, 0.0)]
    with pytest.raises(NotImplementedError, match="distance"):
        e.execute("SELECT to_tsvector('a b c') @@ to_tsquery('a <2> c')",
                  dialect="postgres")
    with pytest.raises(NotImplementedError, match="literal"):
        e.execute("SELECT id FROM docs WHERE to_tsvector(body) @@ "
                  "to_tsquery(body)", dialect="postgres")


def test_pg_tsearch_property(spark, tmp_path):
    """Randomized differential: 120 generated tsquery trees evaluated
    by the SQL compiler vs an independent Python evaluator over the
    same 'simple'-config token model."""
    import random
    import re as _re
    from myduckserver_spark.functions.pg_compat import (
        _tsquery_parse, _tsquery_sql,
    )

    rng = random.Random(20260816)
    vocab = ["fox", "dog", "quick", "lazy", "brown", "jump", "run"]
    docs = []
    for _ in range(40):
        docs.append(" ".join(
            rng.choice(vocab) for _ in range(rng.randint(1, 12))))

    def py_eval(node, toks, padded):
        k = node[0]
        if k == "term":
            _, w, pre = node
            if pre:
                return any(t.startswith(w) for t in toks)
            return w in toks
        if k == "phrase":
            return f" {' '.join(node[1])} " in padded
        if k == "not":
            return not py_eval(node[1], toks, padded)
        l_ = py_eval(node[1], toks, padded)
        r_ = py_eval(node[2], toks, padded)
        return (l_ and r_) if k == "and" else (l_ or r_)

    def gen_query(depth=0):
        r = rng.random()
        if depth >= 3 or r < 0.45:
            w = rng.choice(vocab)
            if rng.random() < 0.2:
                return w[:3] + ":*"
            if rng.random() < 0.15:
                return f"!{w}"
            return w
        if r < 0.6:
            a, b = rng.choice(vocab), rng.choice(vocab)
            return f"{a} <-> {b}"
        op = rng.choice(["&", "|"])
        lhs, rhs = gen_query(depth + 1), gen_query(depth + 1)
        if rng.random() < 0.3:
            return f"({lhs} {op} {rhs})"
        return f"{lhs} {op} {rhs}"

    cases = []
    for qi in range(120):
        q = gen_query()
        tree = _tsquery_parse(q)
        sql_pred = _tsquery_sql("body", tree)
        expected = []
        for di, d in enumerate(docs):
            toks = _re.sub(r"[^a-z0-9]+", " ", d.lower()).split()
            padded = " " + " ".join(toks) + " "
            if py_eval(tree, toks, padded):
                expected.append(di)
        cases.append((qi, q, sql_pred, expected))

    rows = ", ".join(
        f"({i}, '{d}')" for i, d in enumerate(docs))
    spark.sql("SELECT * FROM (VALUES " + rows + ") AS t(did, body)"
              ).createOrReplaceTempView("ts_prop_docs")
    preds = ", ".join(
        f"CASE WHEN {p} THEN 1 ELSE 0 END AS q{qi}"
        for qi, _, p, _ in cases)
    got = spark.sql(
        f"SELECT did, {preds} FROM ts_prop_docs ORDER BY did"
    ).collect()
    for qi, q, _, expected in cases:
        actual = [r["did"] for r in got if r[f"q{qi}"] == 1]
        assert actual == expected, f"tsquery {q!r}: {actual} != {expected}"


def test_pg_dollar_quotes_functions_ddl(spark, tmp_path):
    """Dollar-quoted literals, pg CREATE FUNCTION LANGUAGE SQL /
    BEGIN ATOMIC → stored SQL functions, MATERIALIZED CTE hints,
    CTAS WITH [NO] DATA, CLUSTER/REINDEX no-ops."""
    import pytest
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgddl"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT $$it's here$$") == "it's here"
    assert val("SELECT $tag$nested $$ quotes$tag$") == "nested $$ quotes"
    e.execute("CREATE FUNCTION addxy(x int, y int) RETURNS int AS "
              "$$ SELECT x + y $$ LANGUAGE SQL", dialect="postgres")
    assert val("SELECT addxy(2, 3)") == 5
    e.execute("CREATE FUNCTION trip(z int) RETURNS int LANGUAGE SQL "
              "BEGIN ATOMIC SELECT z * 3; END", dialect="postgres")
    assert val("SELECT trip(7)") == 21
    with pytest.raises(NotImplementedError, match="plpgsql"):
        e.execute("CREATE FUNCTION bad() RETURNS int AS "
                  "$$ BEGIN RETURN 1; END $$ LANGUAGE plpgsql",
                  dialect="postgres")
    assert val("WITH x AS MATERIALIZED (SELECT 1 AS a) "
               "SELECT a FROM x") == 1
    assert val("WITH x AS NOT MATERIALIZED (SELECT 2 AS a) "
               "SELECT a FROM x") == 2
    e.execute("CREATE TABLE t9 (id INT PRIMARY KEY, v DOUBLE)",
              dialect="postgres")
    e.execute("INSERT INTO t9 VALUES (1, 2.0), (2, 3.0)",
              dialect="postgres")
    e.execute("CREATE TABLE t9b AS SELECT * FROM t9 WITH NO DATA",
              dialect="postgres")
    assert val("SELECT count(*) FROM t9b") == 0
    e.execute("CREATE TABLE t9c AS SELECT * FROM t9 WITH DATA",
              dialect="postgres")
    assert val("SELECT count(*) FROM t9c") == 2
    e.execute("CLUSTER t9 USING some_idx", dialect="postgres")
    e.execute("REINDEX TABLE t9", dialect="postgres")
    # window EXCLUDE: NO OTHERS strips, real exclusions reject clearly
    assert val("SELECT sum(v) OVER (ORDER BY id ROWS BETWEEN 1 "
               "PRECEDING AND CURRENT ROW EXCLUDE NO OTHERS) "
               "FROM t9 ORDER BY id LIMIT 1") == 2.0
    with pytest.raises(NotImplementedError, match="EXCLUDE"):
        e.execute("SELECT sum(v) OVER (ORDER BY id ROWS BETWEEN 1 "
                  "PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) "
                  "FROM t9", dialect="postgres")


def test_pg_jsonb_value_ops_and_multiarray_unnest(spark, tmp_path):
    """jsonb || / - operators (merge, key/index delete, pg type
    rules incl. negative indexes) and multi-array unnest zip with
    NULL padding + WITH ORDINALITY."""
    import json
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgjsonb"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert json.loads(val(
        "SELECT '{\"a\":1}'::jsonb || '{\"b\":2}'::jsonb")) == \
        {"a": 1, "b": 2}
    assert json.loads(val("SELECT '[1,2]'::jsonb || '[3]'::jsonb")) == \
        [1, 2, 3]
    assert json.loads(val("SELECT '[1]'::jsonb || '5'::jsonb")) == [1, 5]
    assert json.loads(val(
        "SELECT '{\"a\":1,\"b\":2}'::jsonb - 'a'")) == {"b": 2}
    assert json.loads(val(
        "SELECT '[\"a\",\"b\",\"a\"]'::jsonb - 'a'")) == ["b"]
    assert json.loads(val("SELECT '[1,2,3]'::jsonb - 1")) == [1, 3]
    assert json.loads(val("SELECT '[1,2,3]'::jsonb - -1")) == [1, 2]
    assert val("SELECT '[1,2,3]'::jsonb ->> -1") == "3"
    assert json.loads(val(
        "SELECT '[{\"a\":1},{\"a\":2}]'::jsonb -> -1")) == {"a": 2}
    # plain string concat / numeric minus untouched
    assert val("SELECT 'a' || 'b'") == "ab"
    assert val("SELECT 5 - 3") == 2
    rows = e.execute(
        "SELECT * FROM unnest(ARRAY[1,2,3], ARRAY['a','b']) AS t(x, y)",
        dialect="postgres").collect()
    assert [(r.x, r.y) for r in rows] == [(1, "a"), (2, "b"), (3, None)]
    rows = e.execute(
        "SELECT * FROM unnest(ARRAY[1,2], ARRAY['a','b']) "
        "WITH ORDINALITY AS t(x, y, n)", dialect="postgres").collect()
    assert [(r.x, r.y, r.n) for r in rows] == [(1, "a", 1), (2, "b", 2)]


def test_pg_jsonpath_family(spark, tmp_path):
    """jsonpath subset: @? / @@ operators, jsonb_path_exists/match/
    query_array/query_first with legs $ .key [n] [*] .* and a
    trailing ? (@ op literal) filter (pg jsonpath docs)."""
    import json
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgjp"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT '{\"a\": [1,2,3]}'::jsonb @? '$.a[2]'") is True
    assert val("SELECT '{\"a\": 1}'::jsonb @? '$.b'") is False
    assert val("SELECT '{\"a\":{\"b\":7}}'::jsonb @@ '$.a.b == 7'") is True
    assert val("SELECT '{\"a\":{\"b\":7}}'::jsonb @@ '$.a.b > 9'") is False
    assert val(
        "SELECT jsonb_path_exists('{\"a\":[1,2]}', '$.a[*] ? (@ > 1)')"
    ) is True
    assert val(
        "SELECT jsonb_path_exists('{\"a\":[1,2]}', '$.a[*] ? (@ > 5)')"
    ) is False
    assert val("SELECT jsonb_path_match('{\"a\": 2}', '$.a > 1')") is True
    assert json.loads(val(
        "SELECT jsonb_path_query_array('{\"a\":[1,2,3]}', "
        "'$.a[*] ? (@ >= 2)')")) == [2, 3]
    assert json.loads(val(
        "SELECT jsonb_path_query_first('{\"a\":[5,6]}', '$.a[0]')")) == 5
    # negative index + object wildcard + keyed filter
    assert json.loads(val(
        "SELECT jsonb_path_query_first('{\"a\":[5,6]}', '$.a[-1]')")) == 6
    assert json.loads(val(
        "SELECT jsonb_path_query_array("
        "'[{\"k\":1},{\"k\":5}]', '$[*] ? (@.k > 2)')")) == [{"k": 5}]
    # unsupported constructs surface as NULL, not wrong answers
    assert val(
        "SELECT jsonb_path_query_array('{\"a\":1}', '$.a + 1')") is None
    # set-returning jsonb_path_query rejects with a pointer
    try:
        e.execute("SELECT jsonb_path_query('{}', '$')",
                  dialect="postgres")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError as ex:
        assert "jsonb_path_query_array" in str(ex)


def test_pg_json_typeof_object_record(spark, tmp_path):
    """json[b]_typeof pg names, jsonb_object(keys, values),
    jsonb_exists, scalar to_json/to_jsonb, row_to_json over ROW(),
    json[b]_to_record(set) with AS definition lists."""
    import json
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgjt"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT jsonb_typeof('[1,2]')") == "array"
    assert val("SELECT json_typeof('\"x\"')") == "string"
    assert val("SELECT jsonb_typeof('{\"a\":1}')") == "object"
    assert val("SELECT jsonb_typeof('null')") == "null"
    assert val("SELECT jsonb_typeof('1.5')") == "number"
    assert json.loads(val(
        "SELECT jsonb_object(ARRAY['a','b'], ARRAY['1','2'])")) == \
        {"a": "1", "b": "2"}
    assert val("SELECT jsonb_exists('{\"k\":1}', 'k')") is True
    assert val("SELECT jsonb_exists('{\"k\":1}', 'z')") is False
    # scalar to_json — pg accepts any type; strings quote, bools bare
    assert val("SELECT to_json('hi'::text)") == '"hi"'
    assert val("SELECT to_json(5)") == "5"
    assert val("SELECT to_jsonb(true)") == "true"
    assert val("SELECT to_json(ARRAY[1,2])") == "[1,2]"
    assert json.loads(val("SELECT row_to_json(ROW(1, 'x'))")) == \
        {"col1": 1, "col2": "x"}
    rows = e.execute(
        "SELECT * FROM json_to_record('{\"a\":1,\"b\":\"x\"}') "
        "AS t(a int, b text)", dialect="postgres").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "x")]
    rows = e.execute(
        "SELECT a, b FROM json_to_recordset("
        "'[{\"a\":1,\"b\":\"p\"},{\"a\":2,\"b\":\"q\"}]') "
        "AS r(a int, b text) ORDER BY a", dialect="postgres").collect()
    assert [(r.a, r.b) for r in rows] == [(1, "p"), (2, "q")]


def test_pg_encoding_scale_maketime(spark, tmp_path):
    """convert_from/convert_to with pg charset names + hex bytea
    literals, scale/min_scale/trim_scale, make_time, date_bin with a
    bare interval string, setseed no-op."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgenc"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val(
        "SELECT convert_from('\\x68690a'::bytea, 'UTF8')") == "hi\n"
    assert val(
        "SELECT encode(convert_to('hi', 'UTF8'), 'hex')") == "6869"
    assert val("SELECT scale(8.4100)") == 4
    assert val("SELECT min_scale(8.4100)") == 2
    assert float(val("SELECT trim_scale(8.4100)")) == 8.41
    assert val("SELECT make_time(8, 15, 23.5)") == "08:15:23.5"
    assert val("SELECT make_time(23, 5, 9)") == "23:05:09"
    assert str(val(
        "SELECT date_bin('15 minutes', "
        "TIMESTAMP '2020-02-11 15:44:17', TIMESTAMP '2001-01-01')"
    )).startswith("2020-02-11 15:30:00")
    assert val("SELECT setseed(0.5)") is None


def test_pg_array_operators_and_helpers(spark, tmp_path):
    """&& overlap, @>/<@ containment over arrays, array_positions/
    array_fill/trim_array/array_ndims, quote_nullable, parse_ident,
    timeofday/localtime/precision-arg clock forms."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgarr"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val("SELECT ARRAY[1,2,3] && ARRAY[3,4]") is True
    assert val("SELECT ARRAY[1,2] && ARRAY[5]") is False
    assert val("SELECT ARRAY[1,2,3] @> ARRAY[2]") is True
    assert val("SELECT ARRAY[1] @> ARRAY[2]") is False
    assert val("SELECT ARRAY[2] <@ ARRAY[1,2,3]") is True
    assert val("SELECT array_positions(ARRAY[1,2,1], 1)") == [1, 3]
    assert val("SELECT array_fill(7, ARRAY[3])") == [7, 7, 7]
    assert val("SELECT trim_array(ARRAY[1,2,3], 1)") == [1, 2]
    assert val("SELECT array_ndims(ARRAY[1,2])") == 1
    assert val("SELECT array_ndims(ARRAY[ARRAY[1],ARRAY[2]])") == 2
    assert val("SELECT quote_nullable(NULL)") == "NULL"
    assert val("SELECT quote_nullable('x''y')") == "'x''y'"
    assert val("SELECT parse_ident('\"SomeSchema\".sometable')") == \
        ["SomeSchema", "sometable"]
    assert val("SELECT timeofday() IS NOT NULL") is True
    assert val("SELECT localtimestamp(0) IS NOT NULL") is True
    assert val("SELECT localtime IS NOT NULL") is True
    assert val("SELECT current_time IS NOT NULL") is True


def test_pg_jsonb_containment(spark, tmp_path):
    """jsonb @> / <@ with pg 9.4 semantics: recursive structure
    match, top-level array-contains-primitive exception, bool vs
    number type discrimination."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgjc"))

    def val(sql):
        return e.execute(sql, dialect="postgres").collect()[0][0]

    assert val(
        "SELECT '{\"a\":1,\"b\":2}'::jsonb @> '{\"a\":1}'::jsonb"
    ) is True
    assert val("SELECT '{\"a\":1}'::jsonb @> '{\"a\":2}'::jsonb") is False
    assert val("SELECT '[1,2,3]'::jsonb @> '[1,3]'") is True
    assert val("SELECT '[1,2]'::jsonb @> '5'") is False
    # top-level array contains bare primitive (the documented pg
    # exception); nested levels still require structural match
    assert val("SELECT '[1,2,3]'::jsonb @> '2'") is True
    assert val(
        "SELECT '{\"a\":{\"b\":[1,2]}}'::jsonb @> '{\"a\":{\"b\":[2]}}'"
    ) is True
    assert val("SELECT '{\"a\":1}' <@ '{\"a\":1,\"b\":2}'::jsonb") is True
    # JSON true never equals 1
    assert val("SELECT '[1,true]'::jsonb @> 'true'") is True
    assert val("SELECT '[1,0]'::jsonb @> 'false'") is False


def test_pg_conditional_upsert(spark, tmp_path):
    """ON CONFLICT (pk) DO UPDATE SET ... WHERE cond: only
    conflicting rows passing cond update; the rest keep stored
    values (pg INSERT docs §ON CONFLICT)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgcu"))
    e.execute("CREATE TABLE cu (id int PRIMARY KEY, v text, n int)",
              dialect="postgres")
    e.execute("INSERT INTO cu VALUES (1,'a',5), (2,'b',50)",
              dialect="postgres")
    e.execute(
        "INSERT INTO cu VALUES (1,'A',100), (2,'B',100), (3,'c',7) "
        "ON CONFLICT (id) DO UPDATE SET v = EXCLUDED.v, "
        "n = EXCLUDED.n WHERE cu.n < 10", dialect="postgres")
    rows = sorted(tuple(r) for r in e.execute(
        "SELECT id, v, n FROM cu", dialect="postgres").collect())
    assert rows == [(1, "A", 100), (2, "b", 50), (3, "c", 7)]
    # cond over the EXCLUDED (incoming) image
    e.execute(
        "INSERT INTO cu VALUES (3,'z',1) ON CONFLICT (id) "
        "DO UPDATE SET v = EXCLUDED.v WHERE excluded.n > 0",
        dialect="postgres")
    rows = [tuple(r) for r in e.execute(
        "SELECT id, v, n FROM cu WHERE id = 3",
        dialect="postgres").collect()]
    assert rows == [(3, "z", 7)]


def test_pg_drop_index_set_local_bitstrings(spark, tmp_path):
    """pg DROP INDEX [IF EXISTS] without ON, SET LOCAL = spelling,
    B'..'/X'..' bit-string literals (text form; ::int folds to the
    numeric value)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgmisc2"))
    e.execute("CREATE TABLE bx (id int PRIMARY KEY, v text)",
              dialect="postgres")
    e.execute("CREATE INDEX bx_idx ON bx (v)", dialect="postgres")
    e.execute("DROP INDEX IF EXISTS bx_idx", dialect="postgres")
    e.execute("DROP INDEX IF EXISTS bx_gone", dialect="postgres")
    e.execute("SET LOCAL statement_timeout = 1000", dialect="postgres")
    r = e.execute(
        "SELECT B'1010' AS b, X'1f' AS x, x'1f'::int AS xi, "
        "b'101'::int AS bi", dialect="postgres").collect()[0]
    assert (r.b, r.x, r.xi, r.bi) == ("1010", "00011111", 31, 5)


def test_pg_prepare_execute_dollar_params(spark, tmp_path):
    """pg-style PREPARE name (types) AS stmt with $n placeholders,
    EXECUTE name(args), DEALLOCATE [ALL] — parameter reuse and
    string-literal $n immunity included."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgprep"))
    e.execute("PREPARE pq (int) AS SELECT $1 + 1 AS r, $1 * 2 AS d",
              dialect="postgres")
    r = e.execute("EXECUTE pq(41)", dialect="postgres").collect()[0]
    assert (r.r, r.d) == (42, 82)
    e.execute("DEALLOCATE pq", dialect="postgres")
    e.execute("PREPARE p2 AS SELECT upper($1) AS u, '$1' AS lit",
              dialect="postgres")
    r = e.execute("EXECUTE p2('hi')", dialect="postgres").collect()[0]
    assert (r.u, r.lit) == ("HI", "$1")
    e.execute("DEALLOCATE ALL", dialect="postgres")
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown prepared"):
        e.execute("EXECUTE p2('x')", dialect="postgres")


def test_pg_materialized_views(spark, tmp_path):
    """CREATE/REFRESH/DROP MATERIALIZED VIEW: physical snapshot table
    + stored defining SQL; stale until REFRESH re-runs it."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgmv"))
    e.execute("CREATE TABLE src (x int PRIMARY KEY)", dialect="postgres")
    e.execute("INSERT INTO src VALUES (1), (2)", dialect="postgres")
    e.execute("CREATE MATERIALIZED VIEW mv1 AS "
              "SELECT CAST(sum(x) AS BIGINT) AS s FROM src",
              dialect="postgres")

    def val():
        return e.execute("SELECT * FROM mv1",
                         dialect="postgres").collect()[0][0]

    assert val() == 3
    e.execute("INSERT INTO src VALUES (10)", dialect="postgres")
    assert val() == 3  # snapshot is stale by design
    e.execute("REFRESH MATERIALIZED VIEW mv1", dialect="postgres")
    assert val() == 13
    e.execute("DROP MATERIALIZED VIEW mv1", dialect="postgres")
    e.execute("DROP MATERIALIZED VIEW IF EXISTS mv1", dialect="postgres")
    import pytest as _pt
    with _pt.raises(ValueError):
        e.execute("REFRESH MATERIALIZED VIEW mv1", dialect="postgres")


def test_pg_enum_and_domain_types(spark, tmp_path):
    """CREATE TYPE AS ENUM / CREATE DOMAIN registry: later DDL
    substitutes the definitions — enum order + membership validation
    (pg 'invalid input value' ≡ strict MySQL 1265), domain base type
    + VALUE check bound to the declaring column."""
    import pytest as _pt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pgty"))
    e.execute("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')",
              dialect="postgres")
    e.execute("CREATE DOMAIN posint AS int CHECK (VALUE > 0)",
              dialect="postgres")
    e.execute("CREATE TABLE person (id int PRIMARY KEY, m mood, "
              "amount posint)", dialect="postgres")
    e.execute("INSERT INTO person VALUES (1, 'happy', 5), "
              "(2, 'sad', 3)", dialect="postgres")
    # declaration order, not lexical: sad < happy
    assert [r.id for r in e.execute(
        "SELECT id FROM person ORDER BY m",
        dialect="postgres").collect()] == [2, 1]
    with _pt.raises(ValueError, match="m_enum_value"):
        e.execute("INSERT INTO person VALUES (3, 'angry', 1)",
                  dialect="postgres")
    with _pt.raises(ValueError, match="amount_check"):
        e.execute("INSERT INTO person VALUES (3, 'ok', -5)",
                  dialect="postgres")
    with _pt.raises(ValueError, match="type exists"):
        e.execute("CREATE TYPE mood AS ENUM ('x')", dialect="postgres")
    e.execute("DROP TABLE person", dialect="postgres")
    e.execute("DROP TYPE mood", dialect="postgres")
    e.execute("DROP DOMAIN IF EXISTS posint", dialect="postgres")
    with _pt.raises(ValueError, match="no such type"):
        e.execute("DROP TYPE mood", dialect="postgres")


def test_rename_column_migrates_metadata(spark, tmp_path):
    """ALTER TABLE RENAME COLUMN carries defaults/NOT NULL/PK/check
    metadata to the new name (was: stale default on the old name made
    every later partial INSERT fail)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_rencol"))
    e.execute("CREATE TABLE rc (id int PRIMARY KEY, "
              "v text NOT NULL DEFAULT 'x', n int CHECK (n >= 0))",
              dialect="postgres")
    e.execute("ALTER TABLE rc RENAME COLUMN v TO w", dialect="postgres")
    e.execute("INSERT INTO rc (id, n) VALUES (7, 1)", dialect="postgres")
    assert e.execute("SELECT w FROM rc WHERE id = 7",
                     dialect="postgres").collect()[0][0] == "x"
    meta = e.table_meta("rc")
    assert "w" in meta.defaults and "v" not in meta.defaults
    assert "w" in meta.not_null and "v" not in meta.not_null


def test_pg_data_modifying_ctes(spark, tmp_path):
    """WITH x AS (INSERT/UPDATE/DELETE ... RETURNING ...) <stmt>:
    each DML runs once, its RETURNING rows feed the CTE name; the
    move-rows idiom (DELETE feeding an INSERT) works end-to-end.
    Also pins the UPDATE-assigns-PK RETURNING fix (post-images
    surface as insert-kind rows in the version diff)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_dmlcte"))
    e.execute("CREATE TABLE a6 (x int PRIMARY KEY)", dialect="postgres")
    e.execute("CREATE TABLE b6 (x int PRIMARY KEY)", dialect="postgres")
    e.execute("INSERT INTO a6 VALUES (1), (2), (3)", dialect="postgres")
    assert e.execute(
        "WITH ins AS (INSERT INTO b6 VALUES (9), (10) RETURNING x) "
        "SELECT CAST(sum(x) AS BIGINT) FROM ins",
        dialect="postgres").collect()[0][0] == 19
    e.execute(
        "WITH moved AS (DELETE FROM a6 WHERE x > 1 RETURNING x) "
        "INSERT INTO b6 SELECT x FROM moved", dialect="postgres")
    assert sorted(r.x for r in e.execute(
        "SELECT x FROM a6", dialect="postgres").collect()) == [1]
    assert sorted(r.x for r in e.execute(
        "SELECT x FROM b6", dialect="postgres").collect()) == \
        [2, 3, 9, 10]
    # mixed plain + DML CTEs; UPDATE assigns the PK itself
    r = e.execute(
        "WITH plain AS (SELECT 100 AS y), "
        "upd AS (UPDATE b6 SET x = x + 100 WHERE x = 9 RETURNING x) "
        "SELECT (SELECT y FROM plain) AS y, "
        "(SELECT count(*) FROM upd) AS n",
        dialect="postgres").collect()[0]
    assert (r.y, r.n) == (100, 1)
    assert sorted(x.x for x in e.execute(
        "SELECT x FROM b6", dialect="postgres").collect()) == \
        [2, 3, 10, 109]
    # plain UPDATE ... RETURNING with a PK assignment (was empty)
    rows = e.execute("UPDATE b6 SET x = 1000 WHERE x = 109 RETURNING x",
                     dialect="postgres").collect()
    assert [r2.x for r2 in rows] == [1000]
    # UNLOGGED is a durability hint only
    e.execute("CREATE UNLOGGED TABLE ul6 (x int)", dialect="postgres")
    e.execute("DROP TABLE ul6", dialect="postgres")


def test_pg_cursors_copy_stdout_explain_opts(spark, tmp_path):
    """Session cursors (DECLARE/FETCH [FORWARD n|NEXT|ALL]/MOVE/
    CLOSE — streamed via toLocalIterator, no full collect), COPY ...
    TO STDOUT (pg text + CSV line formats), EXPLAIN (options), and
    bare pg_stat_user_tables routing."""
    import pytest as _pt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_cur"))
    e.execute("CREATE TABLE c8 (id int PRIMARY KEY, v text)",
              dialect="postgres")
    e.execute("INSERT INTO c8 VALUES (1,'a'), (2,'b'), (3,'c'), "
              "(4,NULL)", dialect="postgres")
    e.execute("DECLARE cur1 CURSOR FOR SELECT id, v FROM c8 "
              "ORDER BY id", dialect="postgres")
    assert [r.id for r in e.execute(
        "FETCH 2 FROM cur1", dialect="postgres").collect()] == [1, 2]
    assert [r.id for r in e.execute(
        "FETCH NEXT FROM cur1", dialect="postgres").collect()] == [3]
    assert [r.id for r in e.execute(
        "FETCH ALL FROM cur1", dialect="postgres").collect()] == [4]
    assert e.execute("FETCH 5 FROM cur1",
                     dialect="postgres").collect() == []
    e.execute("CLOSE cur1", dialect="postgres")
    with _pt.raises(ValueError, match="does not exist"):
        e.execute("FETCH 1 FROM cur1", dialect="postgres")
    # text format: tab separator, \\N nulls; CSV: comma, empty null
    lines = sorted(r.copy_line for r in e.execute(
        "COPY c8 TO STDOUT", dialect="postgres").collect())
    assert "1\ta" in lines and "4\t\\N" in lines
    lines = [r.copy_line for r in e.execute(
        "COPY (SELECT id, v FROM c8 ORDER BY id) TO STDOUT "
        "(FORMAT csv)", dialect="postgres").collect()]
    assert lines[0] == "1,a" and lines[3] == "4,"
    # EXPLAIN option list accepted
    assert e.execute("EXPLAIN (FORMAT JSON, COSTS OFF) "
                     "SELECT * FROM c8", dialect="postgres") is not None
    assert e.execute("SELECT relname FROM pg_stat_user_tables "
                     "WHERE relname = 'c8'",
                     dialect="postgres").collect()[0][0] == "c8"


def test_pg_identity_columns_and_ddl_tail(spark, tmp_path):
    """GENERATED {ALWAYS|BY DEFAULT} AS IDENTITY → the engine's
    AUTO_INCREMENT machinery (was: silently created a plain column
    and every id-less INSERT failed); START WITH honored, non-1
    INCREMENT rejects clearly. Plus OVERRIDING SYSTEM VALUE,
    CREATE TABLE (LIKE src INCLUDING ALL), FROM ONLY, partial
    indexes, ALTER COLUMN SET STATISTICS/STORAGE no-ops."""
    import pytest as _pt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_ident"))
    e.execute("CREATE TABLE idt (id int GENERATED ALWAYS AS IDENTITY "
              "PRIMARY KEY, v text)", dialect="postgres")
    e.execute("INSERT INTO idt (v) VALUES ('a'), ('b')",
              dialect="postgres")
    assert [tuple(r) for r in e.execute(
        "SELECT id, v FROM idt ORDER BY id",
        dialect="postgres").collect()] == [(1, "a"), (2, "b")]
    e.execute("INSERT INTO idt (id, v) OVERRIDING SYSTEM VALUE "
              "VALUES (100, 'c')", dialect="postgres")
    assert e.execute("SELECT v FROM idt WHERE id = 100",
                     dialect="postgres").collect()[0][0] == "c"
    # START WITH honored; INCREMENT BY != 1 rejects (no +n analog)
    e.execute("CREATE TABLE idt3 (id bigint GENERATED BY DEFAULT "
              "AS IDENTITY (START WITH 50), v text)",
              dialect="postgres")
    e.execute("INSERT INTO idt3 (v) VALUES ('x')", dialect="postgres")
    assert e.execute("SELECT id FROM idt3",
                     dialect="postgres").collect()[0][0] == 50
    with _pt.raises(NotImplementedError, match="INCREMENT"):
        e.execute("CREATE TABLE bad2 (id int GENERATED ALWAYS AS "
                  "IDENTITY (START WITH 1 INCREMENT BY 5))",
                  dialect="postgres")
    e.execute("CREATE TABLE liked (LIKE idt INCLUDING ALL)",
              dialect="postgres")
    assert e.execute("SELECT count(*) FROM liked",
                     dialect="postgres").collect()[0][0] == 0
    assert e.table_meta("liked").auto_increment == "id"
    assert len(e.execute("SELECT * FROM ONLY idt",
                         dialect="postgres").collect()) == 3
    e.execute("CREATE INDEX partial_idx ON idt (v) "
              "WHERE v IS NOT NULL", dialect="postgres")
    e.execute("DROP INDEX partial_idx", dialect="postgres")
    e.execute("ALTER TABLE idt ALTER COLUMN v SET STATISTICS 100",
              dialect="postgres")
    e.execute("ALTER TABLE idt ALTER COLUMN v SET STORAGE EXTENDED",
              dialect="postgres")


def test_pg_trigger_functions_and_set_tuple_subquery(spark, tmp_path):
    """pg trigger functions: CREATE FUNCTION ... RETURNS trigger AS
    $$ plpgsql $$ (NEW.col := expr / RETURN NEW / RAISE EXCEPTION
    guards) + CREATE TRIGGER ... EXECUTE FUNCTION, translated onto
    the engine's MySQL trigger machinery; pg DROP TRIGGER ... ON t /
    DROP FUNCTION name(); statement splitting respects $$ bodies.
    Plus: UPDATE SET (a,b) = (SELECT ...) uncorrelated row-subquery
    folds to per-column literals."""
    import pytest as _pt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_trigfn"))
    e.execute("CREATE TABLE t10 (id int PRIMARY KEY, a int, b text)",
              dialect="postgres")
    e.execute("INSERT INTO t10 VALUES (1, 5, 'x')", dialect="postgres")
    e.execute("UPDATE t10 SET (a, b) = (SELECT 9, 'z') WHERE id = 1",
              dialect="postgres")
    assert [tuple(r) for r in e.execute(
        "SELECT a, b FROM t10 WHERE id = 1",
        dialect="postgres").collect()] == [(9, "z")]
    e.execute(
        "CREATE OR REPLACE FUNCTION audit_fn() RETURNS trigger AS $$\n"
        "BEGIN\n  NEW.b := upper(NEW.b);\n  RETURN NEW;\nEND;\n"
        "$$ LANGUAGE plpgsql", dialect="postgres")
    e.execute("CREATE TRIGGER up_b BEFORE INSERT ON t10 "
              "FOR EACH ROW EXECUTE FUNCTION audit_fn()",
              dialect="postgres")
    e.execute("INSERT INTO t10 VALUES (2, 1, 'abc')",
              dialect="postgres")
    assert e.execute("SELECT b FROM t10 WHERE id = 2",
                     dialect="postgres").collect()[0][0] == "ABC"
    # guard subset: RAISE EXCEPTION inside IF
    e.execute(
        "CREATE FUNCTION no_neg() RETURNS trigger AS $$ BEGIN "
        "IF NEW.a < 0 THEN RAISE EXCEPTION 'negative a'; END IF; "
        "RETURN NEW; END; $$ LANGUAGE plpgsql", dialect="postgres")
    e.execute("CREATE TRIGGER guard_a BEFORE INSERT ON t10 "
              "FOR EACH ROW EXECUTE FUNCTION no_neg()",
              dialect="postgres")
    with _pt.raises(Exception, match="negative a"):
        e.execute("INSERT INTO t10 VALUES (3, -1, 'q')",
                  dialect="postgres")
    e.execute("DROP TRIGGER IF EXISTS guard_a ON t10",
              dialect="postgres")
    e.execute("DROP TRIGGER up_b ON t10", dialect="postgres")
    e.execute("INSERT INTO t10 VALUES (4, 1, 'low')",
              dialect="postgres")
    assert e.execute("SELECT b FROM t10 WHERE id = 4",
                     dialect="postgres").collect()[0][0] == "low"
    e.execute("DROP FUNCTION IF EXISTS audit_fn()", dialect="postgres")
    e.execute("DROP FUNCTION no_neg()", dialect="postgres")
