"""MySQL 8 JSON_TABLE(...) at the front door (reference corpus:
TestJSONTableQueries main_test.go:430-446; the GMS enginetest shapes).
Rewritten to Spark LATERAL derived tables over explode(from_json) —
semantic twin of the gate-green f_json_table_explode."""

from __future__ import annotations

import pytest

from myduckserver_spark.engine import Engine
from myduckserver_spark.functions.mysql_compat import (
    rewrite_json_table,
    translate_mysql,
)


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def test_literal_source_basic(eng):
    rows = eng.execute(
        """SELECT * FROM JSON_TABLE('[{"x":1,"y":"a"},{"x":2,"y":"b"}]',
           '$[*]' COLUMNS (x INT PATH '$.x', y VARCHAR(10) PATH '$.y')) AS t"""
    ).collect()
    assert [tuple(r) for r in rows] == [(1, "a"), (2, "b")]


def test_for_ordinality(eng):
    rows = eng.execute(
        """SELECT i, x FROM JSON_TABLE('[{"x":10},{"x":20}]', '$[*]'
           COLUMNS (i FOR ORDINALITY, x INT PATH '$.x')) t ORDER BY i"""
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 10), (2, 20)]


def test_correlated_lateral_over_table(eng):
    eng.execute("CREATE TABLE jt_src (id INT, payload TEXT)")
    eng.execute("""INSERT INTO jt_src VALUES (1, '[{"v":100},{"v":200}]')""")
    eng.execute("""INSERT INTO jt_src VALUES (2, '[{"v":300}]')""")
    rows = eng.execute(
        """SELECT id, v FROM jt_src, JSON_TABLE(payload, '$[*]'
           COLUMNS (v INT PATH '$.v')) AS jt ORDER BY id, v"""
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 100), (1, 200), (2, 300)]


def test_column_name_differs_from_json_key(eng):
    rows = eng.execute(
        """SELECT renamed FROM JSON_TABLE('[{"k":7}]', '$[*]'
           COLUMNS (renamed INT PATH '$.k')) AS t"""
    ).collect()
    assert rows[0].renamed == 7


def test_expression_over_json_table_column(eng):
    rows = eng.execute(
        """SELECT t.x + 1 AS x1 FROM JSON_TABLE('[{"x":5}]', '$[*]'
           COLUMNS (x INT PATH '$.x')) AS t"""
    ).collect()
    assert rows[0].x1 == 6


def test_rewrite_leaves_non_from_json_table_strings_alone():
    # JSON_TABLE inside a string literal must not be rewritten
    q = "SELECT 'JSON_TABLE(x)' AS s"
    assert rewrite_json_table(q) == q


def test_json_table_nested_row_path(spark):
    # row path '$.items[*]': rows come from a sub-array of the document
    sql = translate_mysql(
        "SELECT jt.a FROM JSON_TABLE("
        "'{\"items\":[{\"a\":1},{\"a\":2},{\"a\":3}]}', "
        "'$.items[*]' COLUMNS (a INT PATH '$.a')) jt ORDER BY a"
    )
    assert [r.a for r in spark.sql(sql).collect()] == [1, 2, 3]


def test_json_table_multilevel_column_path(spark):
    sql = translate_mysql(
        "SELECT jt.city, jt.zip FROM JSON_TABLE("
        "'[{\"addr\":{\"city\":\"x\",\"zip\":7}},"
        "{\"addr\":{\"city\":\"y\",\"zip\":9}}]', "
        "'$[*]' COLUMNS (city VARCHAR(20) PATH '$.addr.city', "
        "zip INT PATH '$.addr.zip')) jt ORDER BY zip"
    )
    rows = spark.sql(sql).collect()
    assert [(r.city, r.zip) for r in rows] == [("x", 7), ("y", 9)]


def test_json_table_nested_path_columns(spark):
    # MySQL NESTED PATH: parent row x nested element, NULL-filled row
    # when the nested array is empty/missing
    sql = translate_mysql(
        "SELECT jt.nm, jt.tag, jt.tn FROM JSON_TABLE('"
        '[{"nm":"a","tags":[{"t":"x"},{"t":"y"}]},{"nm":"b","tags":[]}]'
        "', '$[*]' COLUMNS ("
        "nm VARCHAR(10) PATH '$.nm', "
        "NESTED PATH '$.tags[*]' COLUMNS ("
        "tag VARCHAR(10) PATH '$.t', tn FOR ORDINALITY))) jt "
        "ORDER BY nm, tn"
    )
    rows = spark.sql(sql).collect()
    assert [(r.nm, r.tag, r.tn) for r in rows] == [
        ("a", "x", 1), ("a", "y", 2), ("b", None, None),
    ]


def test_json_table_nested_with_outer_ordinality(spark):
    sql = translate_mysql(
        "SELECT jt.* FROM JSON_TABLE('"
        '[{"v":"p","kids":[{"k":1}]},{"v":"q","kids":[{"k":2},{"k":3}]}]'
        "', '$[*]' COLUMNS ("
        "rn FOR ORDINALITY, v VARCHAR(5) PATH '$.v', "
        "NESTED PATH '$.kids[*]' COLUMNS (k INT PATH '$.k'))) jt "
        "ORDER BY rn, k"
    )
    rows = spark.sql(sql).collect()
    assert [(r.rn, r.v, r.k) for r in rows] == [
        (1, "p", 1), (2, "q", 2), (2, "q", 3),
    ]
