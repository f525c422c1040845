"""UDF registry, pg-macro equivalents, skew salting, backup/restore."""

from pyspark.sql import functions as F

from myduckserver_spark.catalog import Catalog
from myduckserver_spark.functions.macros import (
    array_list_contains,
    list_contains,
    pg_expandarray,
)
from myduckserver_spark.functions.udfs import register_engine_udfs
from myduckserver_spark.operators.skew import salted_join, top_keys


def test_register_and_call_udfs(spark):
    register_engine_udfs(spark)
    r = spark.sql("SELECT ps_current_thread_id() AS tid").collect()[0]
    assert r.tid > 0
    # scaling is per Arrow batch → single partition for a global scale
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double").coalesce(1)
    df.createOrReplaceTempView("udf_in")
    out = spark.sql(
        "SELECT vec_minmax_scale(v) AS s FROM udf_in"
    ).agg(F.min("s"), F.max("s")).collect()[0]
    assert out[0] == 0.0 and out[1] == 1.0


def test_pg_expandarray(spark):
    df = spark.createDataFrame([(1, ["a", "b", "c"])], "id int, arr array<string>")
    out = pg_expandarray(df, "arr").select("id", "n", "x").collect()
    assert [(r.n, r.x) for r in out] == [(1, "a"), (2, "b"), (3, "c")]


def test_list_contains_variants(spark):
    df = spark.createDataFrame(
        [(1, "a,b,c", ["x", "y"]), (2, None, [])],
        "id int, csv string, arr array<string>",
    )
    out = df.select(
        list_contains(F.col("csv"), "b").alias("in_csv"),
        array_list_contains(F.col("arr"), "x").alias("in_arr"),
    ).collect()
    assert out[0].in_csv is True and out[0].in_arr is True
    assert out[1].in_csv is None


def test_salted_join_matches_plain_join(spark):
    # skewed big side: 90% of rows on key 0
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(7)], "k bigint, dim string"
    )
    plain = big.join(small, "k").select("payload", "dim")
    salted = salted_join(big, small, "k").select("payload", "dim")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # determinism across runs
    again = salted_join(big, small, "k").select("payload", "dim")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, salted.collect()))


def test_top_keys_reports_skew(spark):
    big = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(1).alias("k")
    )
    rows = top_keys(big, "k", n=2).collect()
    assert rows[0].k == 0 and rows[0].share > 0.8


def test_backup_restore_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    cat.create_table("t", df)
    dest = cat.backup_table("t", str(tmp_path / "bk"))
    assert dest.endswith("/t")

    # mutate, then restore to the backed-up snapshot
    t = cat.table("t")
    t.overwrite(df.limit(0))
    assert t.read().count() == 0
    cat.restore_table("t", str(tmp_path / "bk"))
    assert cat.table("t").read().count() == 2

def test_mysql_dialect_fn_rewrites(spark):
    """Extended MySQL→Spark function shims execute with MySQL
    semantics (reference transpiles via SQLGlot, transpiler/
    translate.go:102; semantics per the GMS function corpus)."""
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    sql = translate_mysql(
        "SELECT DAYNAME(d) AS dn, MONTHNAME(d) AS mn, WEEKDAY(d) AS wd, "
        "DATE_ADD(d, INTERVAL 3 DAY) AS d3, DATE_SUB(d, INTERVAL 1 MONTH) "
        "AS dm, TRUNCATE(x, 2) AS tr, FIELD('b', 'a', 'b', 'c') AS f, "
        "CHAR_LENGTH('héllo') AS cl "
        "FROM (SELECT TIMESTAMP '2024-01-03 10:00:00' AS d, 3.4567 AS x)"
    )
    row = spark.sql(sql).collect()[0]
    assert row.dn == "Wednesday" and row.mn == "January"
    assert row.wd == 2          # MySQL: Monday=0 → Wednesday=2
    assert str(row.d3).startswith("2024-01-06")
    assert str(row.dm).startswith("2023-12-03")
    assert abs(float(row.tr) - 3.45) < 1e-9   # toward zero, not rounded
    assert row.f == 2
    assert row.cl == 5


def test_mysql_dialect_fn_rewrites_2(spark):
    """ELT/STRCMP/FORMAT/MAKEDATE shims (same SQLGlot-transpile surface,
    reference transpiler/translate.go:102)."""
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    sql = translate_mysql(
        "SELECT ELT(2, 'a', 'b', 'c') AS e2, ELT(9, 'a', 'b') AS e9, "
        "STRCMP('abc', 'abd') AS sc_lt, STRCMP('x', 'x') AS sc_eq, "
        "STRCMP('b', 'a') AS sc_gt, STRCMP(NULL, 'a') AS sc_null, "
        "FORMAT(1234567.891, 2) AS fm, MAKEDATE(2024, 60) AS md"
    )
    row = spark.sql(sql).collect()[0]
    assert row.e2 == "b" and row.e9 is None
    assert (row.sc_lt, row.sc_eq, row.sc_gt, row.sc_null) == (-1, 0, 1, None)
    assert row.fm == "1,234,567.89"
    assert str(row.md) == "2024-02-29"  # leap year: day 60


def test_mysql_convert_rewrite(spark):
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    sql = translate_mysql(
        "SELECT CONVERT('42', SIGNED) AS s, CONVERT(7, CHAR) AS c, "
        "CONVERT('2024-03-05', DATE) AS d, "
        "CONVERT(3.14159, DECIMAL(6,2)) AS dec"
    )
    row = spark.sql(sql).collect()[0]
    assert row.s == 42 and row.c == "7"
    assert str(row.d) == "2024-03-05"
    assert float(row.dec) == 3.14


def test_create_macro_scalar(spark, tmp_path):
    """CREATE [OR REPLACE] MACRO — DuckDB's UDF surface (reference
    catalog/internal_macro.go:17-31, pgserver CREATE OR REPLACE MACRO):
    untyped lazy templates expanded textually at call sites."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE MACRO mul(a, b) AS a * b")
    assert e.sql("SELECT mul(6, 7) AS x").collect()[0].x == 42
    # macro args are expressions, expansion parenthesizes them
    assert e.sql("SELECT mul(1 + 2, 3) AS x").collect()[0].x == 9
    # macros compose (one may call another)
    e.execute("CREATE MACRO sq(v) AS mul(v, v)")
    assert e.sql("SELECT sq(5) AS x").collect()[0].x == 25
    # OR REPLACE redefines; plain CREATE on an existing name errors
    with pytest.raises(ValueError):
        e.execute("CREATE MACRO mul(a, b) AS a + b")
    e.execute("CREATE OR REPLACE MACRO mul(a, b) AS a + b")
    assert e.sql("SELECT mul(6, 7) AS x").collect()[0].x == 13
    # wrong arity is a hard error
    with pytest.raises(ValueError):
        e.sql("SELECT mul(1) AS x")
    # macro names inside string literals are NOT expanded
    assert e.sql("SELECT 'mul(1,2)' AS s").collect()[0].s == "mul(1,2)"
    # persists across engine reopen; DROP removes it
    e2 = Engine(spark, str(tmp_path / "wh"))
    assert e2.sql("SELECT mul(2, 3) AS x").collect()[0].x == 5
    e2.execute("DROP MACRO mul")
    with pytest.raises(Exception):
        e2.sql("SELECT mul(2, 3) AS x").collect()


def test_macro_over_table_columns(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE mt (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO mt VALUES (1, 10), (2, 20)")
    e.execute("CREATE MACRO clampv(x, hi) AS CASE WHEN x > hi THEN hi ELSE x END")
    rows = e.sql(
        "SELECT id, clampv(v, 15) AS c FROM mt ORDER BY id"
    ).collect()
    assert [(r.id, r.c) for r in rows] == [(1, 10), (2, 15)]
