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


def test_sibling_nested_paths_union_null(spark):
    # MySQL manual 14.17.6 canonical sibling example: while one nested
    # path produces rows the sibling's columns are NULL
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"a": 1, "b": [11,111]}, {"a": 2, "b": [22,222]}]'
        "', '$[*]' COLUMNS ("
        "a INT PATH '$.a', "
        "NESTED PATH '$.b[*]' COLUMNS (b1 INT PATH '$'), "
        "NESTED PATH '$.b[*]' COLUMNS (b2 INT PATH '$'))) AS jt"
    )
    rows = [(r.a, r.b1, r.b2) for r in spark.sql(sql).collect()]
    assert rows == [
        (1, 11, None), (1, 111, None), (1, None, 11), (1, None, 111),
        (2, 22, None), (2, 222, None), (2, None, 22), (2, None, 222),
    ]


def test_sibling_nested_paths_empty_cases(spark):
    # all-empty union -> ONE NULL-complemented row keeps the parent;
    # one-empty -> only the producing sibling emits rows
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"a":3},{"a":4,"c":[5]}]'
        "', '$[*]' COLUMNS ("
        "a INT PATH '$.a', "
        "NESTED PATH '$.b[*]' COLUMNS (b1 INT PATH '$'), "
        "NESTED PATH '$.c[*]' COLUMNS (c1 INT PATH '$'))) AS jt "
        "ORDER BY a"
    )
    rows = [(r.a, r.b1, r.c1) for r in spark.sql(sql).collect()]
    assert rows == [(3, None, None), (4, None, 5)]


def test_nested_under_nested(spark):
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"a":1,"kids":[{"k":10,"gs":[100,101]},{"k":20}]}]'
        "', '$[*]' COLUMNS ("
        "a INT PATH '$.a', "
        "NESTED PATH '$.kids[*]' COLUMNS ("
        "k INT PATH '$.k', "
        "NESTED PATH '$.gs[*]' COLUMNS (g INT PATH '$')))) AS jt "
        "ORDER BY k, g"
    )
    rows = [(r.a, r.k, r.g) for r in spark.sql(sql).collect()]
    assert rows == [(1, 10, 100), (1, 10, 101), (1, 20, None)]


def test_sibling_nested_ordinality(spark):
    # FOR ORDINALITY counts within its own sibling; NULL while the
    # other sibling is the active path
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"b":[7,8],"c":[9]}]'
        "', '$[*]' COLUMNS ("
        "NESTED PATH '$.b[*]' COLUMNS (bi FOR ORDINALITY, b1 INT PATH '$'), "
        "NESTED PATH '$.c[*]' COLUMNS (ci FOR ORDINALITY, c1 INT PATH '$'))) jt "
        "ORDER BY bi, ci"
    )
    rows = [(r.bi, r.b1, r.ci, r.c1) for r in spark.sql(sql).collect()]
    assert rows == [(None, None, 1, 9), (1, 7, None, None), (2, 8, None, None)]


def test_default_on_empty(spark):
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"a":1},{"b":2}]'
        "', '$[*]' COLUMNS ("
        "a INT PATH '$.a' DEFAULT '0' ON EMPTY, "
        "b INT PATH '$.b' DEFAULT '-1' ON EMPTY DEFAULT '-2' ON ERROR)) t"
    )
    assert [tuple(r) for r in spark.sql(sql).collect()] == [
        (1, -1), (0, 2),
    ]


def test_default_string_and_null_clauses(spark):
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"x":"hi"},{}]'
        "', '$[*]' COLUMNS ("
        "x VARCHAR(10) PATH '$.x' DEFAULT '\"none\"' ON EMPTY)) t"
    )
    assert [r.x for r in spark.sql(sql).collect()] == ["hi", "none"]
    sql2 = translate_mysql(
        "SELECT * FROM JSON_TABLE('[{}]', '$[*]' COLUMNS ("
        "y INT PATH '$.y' NULL ON EMPTY NULL ON ERROR)) t"
    )
    assert [r.y for r in spark.sql(sql2).collect()] == [None]


def test_error_on_empty_raises_only_when_empty(spark):
    # ERROR ON EMPTY: runtime raise for a MISSING path, silent otherwise
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('[{\"z\":5}]', '$[*]' COLUMNS ("
        "z INT PATH '$.z' ERROR ON EMPTY)) t"
    )
    assert [r.z for r in spark.sql(sql).collect()] == [5]
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('[{}]', '$[*]' COLUMNS ("
        "z INT PATH '$.z' ERROR ON EMPTY)) t"
    )
    with pytest.raises(Exception, match="ERROR ON EMPTY"):
        spark.sql(sql).collect()


def test_error_on_error_raises_only_on_uncoercible(spark):
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('[{\"z\":3},{}]', '$[*]' COLUMNS ("
        "z INT PATH '$.z' ERROR ON ERROR)) t"
    )
    assert sorted(r.z for r in spark.sql(sql).collect()
                  if r.z is not None) == [3]
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('[{\"z\":\"xx\"}]', '$[*]' COLUMNS ("
        "z INT PATH '$.z' ERROR ON ERROR)) t"
    )
    with pytest.raises(Exception):
        spark.sql(sql).collect()


def test_exists_path(spark):
    # MySQL: 1 when the path locates data — an explicit JSON null IS
    # data (1); only a missing path gives 0
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"a":1},{"a":null},{}]'
        "', '$[*]' COLUMNS (e INT EXISTS PATH '$.a'))"
        " t"
    )
    assert [r.e for r in spark.sql(sql).collect()] == [1, 1, 0]


def test_default_not_applied_to_explicit_json_null(spark):
    # exact ON EMPTY semantics: json null is present data -> SQL NULL,
    # NOT the DEFAULT (the variant-leaf distinction)
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"a":1},{"a":null},{}]'
        "', '$[*]' COLUMNS (a INT PATH '$.a' DEFAULT '7' ON EMPTY)) t"
    )
    assert [r.a for r in spark.sql(sql).collect()] == [1, None, 7]


def test_default_on_error_uncoercible(spark):
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"a":"zz"},{"a":3},{}]'
        "', '$[*]' COLUMNS (a INT PATH '$.a' DEFAULT '-2' ON ERROR)) t"
    )
    assert [r.a for r in spark.sql(sql).collect()] == [-2, 3, None]


def test_default_inside_nested_path(spark):
    sql = translate_mysql(
        "SELECT * FROM JSON_TABLE('"
        '[{"k":[{"v":5},{}]}]'
        "', '$[*]' COLUMNS ("
        "NESTED PATH '$.k[*]' COLUMNS ("
        "v INT PATH '$.v' DEFAULT '9' ON EMPTY))) t"
    )
    assert [r.v for r in spark.sql(sql).collect()] == [5, 9]
