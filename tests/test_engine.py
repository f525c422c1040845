"""Engine facade: SQL front door (incl. MySQL dialect), DDL, DML
(reference backend/executor.go dispatch; TestUpdate/TestDeleteFrom/
TestReplaceInto/TestInsertIgnoreInto suites, main_test.go:840-993)."""

import pytest
from pyspark.sql import functions as F

from myduckserver_spark.engine import Engine
from myduckserver_spark.functions.mysql_compat import (
    mysql_datetime_format,
    translate_mysql,
)


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.create_table(
        "basic_kv",
        [("id", "INT"), ("value", "DOUBLE"), ("c1", "CHAR(10)")],
        rows=[(1, 1.1, "a"), (2, 2.2, "b")],
    )
    return e


def test_sql_select(engine):
    rows = engine.sql("SELECT id, value FROM basic_kv ORDER BY id").collect()
    assert [(r.id, r.value) for r in rows] == [(1, 1.1), (2, 2.2)]


def test_mysql_dialect_limit_backticks(engine):
    rows = engine.sql(
        "SELECT `id` FROM `basic_kv` ORDER BY `id` LIMIT 1, 1", dialect="mysql"
    ).collect()
    assert [r.id for r in rows] == [2]


def test_mysql_dialect_functions(engine):
    df = engine.sql(
        "SELECT UCASE(c1) AS u, IFNULL(NULL, 'x') AS i FROM basic_kv WHERE id = 1",
        dialect="mysql",
    )
    r = df.collect()[0]
    assert r.u == "A" and r.i == "x"


def test_mysql_group_concat(engine):
    r = engine.sql(
        "SELECT GROUP_CONCAT(c1 SEPARATOR '-') AS g FROM basic_kv",
        dialect="mysql",
    ).collect()[0]
    assert sorted(r.g.split("-")) == ["a", "b"]


def test_datetime_format_translation():
    assert mysql_datetime_format("%Y-%m-%d") == "yyyy-MM-dd"
    assert mysql_datetime_format("%H:%i:%s") == "HH:mm:ss"
    assert translate_mysql("SELECT DATE_FORMAT(ts, '%Y-%m')") == \
        "SELECT date_format(ts, 'yyyy-MM')"
    # parse-side tokens are single-letter (round 8): MySQL's %m/%d
    # accept 1-2 digits, Java's MM/dd demand exactly two
    assert translate_mysql("SELECT STR_TO_DATE('2024-01-02', '%Y-%m-%d')") == \
        "SELECT to_timestamp('2024-01-02', 'y-M-d')"


def test_mysql_date_format_executes(engine):
    r = engine.sql(
        "SELECT DATE_FORMAT(TIMESTAMP '2024-03-15 10:11:12', '%Y/%m/%d %H:%i') AS f",
        dialect="mysql",
    ).collect()[0]
    assert r.f == "2024/03/15 10:11"


def test_ctas_and_insert(engine):
    engine.ctas("kv2", "SELECT id, value FROM basic_kv WHERE id = 1")
    assert engine.sql("SELECT COUNT(*) AS n FROM kv2").collect()[0].n == 1
    engine.insert("kv2", engine.spark.createDataFrame([(9, 9.9)], "id int, value double"))
    assert engine.sql("SELECT COUNT(*) AS n FROM kv2").collect()[0].n == 2


def test_update_delete_truncate(engine):
    n = engine.update("basic_kv", F.col("id") == 1, {"value": F.lit(10.0)})
    assert n == 1
    vals = {r.id: r.value for r in engine.sql("SELECT * FROM basic_kv").collect()}
    assert vals[1] == 10.0 and vals[2] == 2.2

    n = engine.delete("basic_kv", F.col("id") == 2)
    assert n == 1
    assert engine.sql("SELECT COUNT(*) AS n FROM basic_kv").collect()[0].n == 1

    engine.truncate("basic_kv")
    assert engine.sql("SELECT COUNT(*) AS n FROM basic_kv").collect()[0].n == 0


def test_replace_and_ignore(engine):
    spark = engine.spark
    new = spark.createDataFrame([(2, 99.0, "Z"), (3, 3.3, "c")],
                                "id int, value double, c1 string")
    engine.insert_replace("basic_kv", new, ["id"])
    vals = {r.id: (r.value, r.c1) for r in engine.sql("SELECT * FROM basic_kv").collect()}
    assert vals == {1: (1.1, "a"), 2: (99.0, "Z"), 3: (3.3, "c")}

    again = spark.createDataFrame([(3, 0.0, "X"), (4, 4.4, "d")],
                                  "id int, value double, c1 string")
    engine.insert_ignore("basic_kv", again, ["id"])
    vals = {r.id: (r.value, r.c1) for r in engine.sql("SELECT * FROM basic_kv").collect()}
    assert vals[3] == (3.3, "c")  # existing wins
    assert vals[4] == (4.4, "d")  # new inserted


def test_drop_table(engine):
    engine.create_table("tmp_t", [("x", "INT")], rows=[(1,)])
    assert "tmp_t" in engine.catalog.list_tables()
    engine.drop_table("tmp_t")
    assert "tmp_t" not in engine.catalog.list_tables()


def test_auto_increment_dense_ids_partition_parallel(spark, tmp_path):
    """Bulk auto-increment assignment must not serialize into one task:
    ids come from the globalrank range-partition pattern and stay dense
    across a multi-partition insert (VERDICT r3 #6)."""
    import re

    from pyspark.sql import functions as F

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.create_table(
        "ai_bulk",
        [("id", "INT"), ("v", "INT")],
        rows=[(1, 0)],
    )
    src = spark.range(5000).repartition(8).selectExpr(
        "CAST(NULL AS INT) AS id", "CAST(id AS INT) AS v"
    )
    e.insert_auto_increment("ai_bulk", src, "id")
    got = e.catalog.table("ai_bulk").read()
    ids = sorted(r.id for r in got.select("id").collect())
    assert ids == list(range(1, 5002))  # dense, unique, starts after max
    # the numbering plan itself carries no unpartitioned window
    numbered = Engine._assign_dense_ids(src, "id", 2, got.schema["id"].dataType)
    plan = numbered._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Window .*?windowspecdefinition\(([^)]*)\)", plan):
        assert "__gr_pid" in m.group(1) or "," in m.group(1).split(
            "windowspec"
        )[0], f"unpartitioned window in auto-increment plan: {m.group(0)[:200]}"
