"""MySQL JSON mutation/inspection family (JSON_SET/INSERT/REPLACE/
REMOVE, CONTAINS[_PATH], OVERLAPS, SEARCH, DEPTH, TYPE, VALID, QUOTE,
PRETTY, MERGE_*, STORAGE_SIZE, MEMBER OF, JSON_VALUE) — Arrow-batched
pandas-UDF bases (functions/json_udfs.py) behind the dialect shims.
JSON_STORAGE_SIZE is byte-faithful to the binlog binary-JSON format
(streaming/mysql_json.py encoder)."""

from __future__ import annotations

import pytest

from myduckserver_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def q1(eng, sql):
    return eng.sql(sql, dialect="mysql").collect()[0][0]


def test_json_mutation_family(eng):
    assert q1(eng, "SELECT JSON_SET('{\"a\":1}', '$.b', 2) AS x") \
        == '{"a": 1, "b": 2}'
    # multi-pair nests; values keep their types (2 number, 'z' string)
    assert q1(eng, "SELECT JSON_SET('{\"a\":1}', '$.a', 9, '$.c', 'z')"
                   " AS x") == '{"a": 9, "c": "z"}'
    # INSERT only writes absent keys, REPLACE only present ones
    assert q1(eng, "SELECT JSON_INSERT('{\"a\":1}', '$.a', 9) AS x") \
        == '{"a": 1}'
    assert q1(eng, "SELECT JSON_REPLACE('{\"a\":1}', '$.b', 9) AS x") \
        == '{"a": 1}'
    assert q1(eng, "SELECT JSON_REMOVE('{\"a\":1,\"b\":2}', '$.b') AS x") \
        == '{"a": 1}'
    # array index paths; past-the-end SET appends (MySQL rule)
    assert q1(eng, "SELECT JSON_SET('[1,2]', '$[5]', 3) AS x") \
        == '[1, 2, 3]'


def test_json_predicates(eng):
    assert q1(eng, "SELECT JSON_CONTAINS('[1,2,3]', '2') AS x") == 1
    assert q1(eng, "SELECT JSON_CONTAINS('{\"a\":{\"b\":1}}', "
                   "'{\"b\":1}', '$.a') AS x") == 1
    # MySQL returns 1/0 integers for the path predicates (round 7:
    # previously surfaced as booleans)
    assert q1(eng, "SELECT JSON_CONTAINS_PATH('{\"a\":1}', 'one', "
                   "'$.a', '$.z') AS x") == 1
    assert q1(eng, "SELECT JSON_CONTAINS_PATH('{\"a\":1}', 'all', "
                   "'$.a', '$.z') AS x") == 0
    # 3-arg string-scalar path: get_json_object would unquote the
    # target and the candidate '"x"' could never match (ADVICE r5)
    assert q1(eng, "SELECT JSON_CONTAINS('{\"a\":\"x\"}', "
                   "'\"x\"', '$.a') AS x") == 1
    assert q1(eng, "SELECT JSON_CONTAINS('{\"a\":\"x\"}', "
                   "'\"y\"', '$.a') AS x") == 0
    # missing path → NULL (MySQL), not 0
    assert q1(eng, "SELECT JSON_CONTAINS('{\"a\":1}', '1', '$.z') AS x") \
        is None
    # numeric scalar at a path still works through the real walk
    assert q1(eng, "SELECT JSON_CONTAINS('{\"a\":[1,2]}', "
                   "'2', '$.a') AS x") == 1
    assert q1(eng, "SELECT JSON_OVERLAPS('[1,2]', '[2,3]') AS x") == 1
    assert q1(eng, "SELECT JSON_OVERLAPS('[1]', '[9]') AS x") == 0
    assert q1(eng, "SELECT 2 MEMBER OF('[1,2]') AS x") is True
    assert q1(eng, "SELECT 5 MEMBER OF('[1,2]') AS x") is False
    assert q1(eng, "SELECT 'b' MEMBER OF('[\"a\",\"b\"]') AS x") is True


def test_json_inspection(eng):
    assert q1(eng, "SELECT JSON_SEARCH('[\"abc\",\"abd\"]', 'one', "
                   "'ab%') AS x") == '"$[0]"'
    assert q1(eng, "SELECT JSON_DEPTH('{\"a\":[1]}') AS x") == 3
    assert q1(eng, "SELECT JSON_TYPE('[1]') AS x") == "ARRAY"
    assert q1(eng, "SELECT JSON_TYPE('{\"a\":1}') AS x") == "OBJECT"
    assert q1(eng, "SELECT JSON_TYPE('3') AS x") == "INTEGER"
    assert q1(eng, "SELECT JSON_VALID('{\"a\":1}') AS x") == 1
    assert q1(eng, "SELECT JSON_VALID('{bad') AS x") == 0
    assert q1(eng, "SELECT JSON_QUOTE('a\"b') AS x") == '"a\\"b"'
    assert q1(eng, "SELECT JSON_VALUE('{\"a\": 7}', '$.a') AS x") == "7"
    # byte-faithful to the binlog binary-JSON encoding
    assert q1(eng, "SELECT JSON_STORAGE_SIZE('{\"a\":1}') AS x") == 13


def test_json_merges(eng):
    assert q1(eng, "SELECT JSON_MERGE_PATCH('{\"a\":1,\"b\":2}', "
                   "'{\"b\":null,\"c\":3}') AS x") == '{"a": 1, "c": 3}'
    assert q1(eng, "SELECT JSON_MERGE_PRESERVE('{\"a\":1}', "
                   "'{\"a\":2}') AS x") == '{"a": [1, 2]}'
    # 3-doc variadic nests
    assert q1(eng, "SELECT JSON_MERGE_PATCH('{\"a\":1}', '{\"b\":2}', "
                   "'{\"c\":3}') AS x") == '{"a": 1, "b": 2, "c": 3}'


def test_json_udfs_null_and_table_rows(eng):
    eng.execute("CREATE TABLE jd (id INT PRIMARY KEY, doc TEXT)")
    eng.execute("""INSERT INTO jd VALUES
        (1, '{"tags": ["a", "b"]}'), (2, '{"tags": []}'), (3, NULL)""")
    rows = {r.id: r.x for r in eng.sql(
        "SELECT id, JSON_CONTAINS(doc, '\"a\"', '$.tags') AS x FROM jd",
        dialect="mysql",
    ).collect()}
    assert rows == {1: 1, 2: 0, 3: None}


def test_values_row_statement(eng):
    rows = eng.execute("VALUES ROW(1, 'a'), ROW(2, 'b')").collect()
    assert [tuple(r) for r in rows] == [(1, "a"), (2, "b")]


def test_json_contains_scalar_typing(eng):
    # numbers compare across int/float; booleans only match booleans
    assert q1(eng, "SELECT JSON_CONTAINS('[1]', '1.0') AS x") == 1
    assert q1(eng, "SELECT JSON_CONTAINS('[true]', '1') AS x") == 0
    assert q1(eng, "SELECT JSON_CONTAINS('[true]', 'true') AS x") == 1
    assert q1(eng, "SELECT JSON_CONTAINS('[\"1\"]', '1') AS x") == 0


def test_json_wildcards_arrays_and_path_length(spark, tmp_path):
    """Round-8 JSON family growth, MySQL-manual-verified values:
    JSON_ARRAY_INSERT/APPEND (scalar targets wrap, pair chains),
    multi-path and wildcard (.* / [*] / **) JSON_EXTRACT returning the
    array of matches, JSON_LENGTH with a path argument."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    one = lambda q: e.execute(q).collect()[0][0]  # noqa: E731
    norm = lambda s: s.replace(" ", "") if s else s  # noqa: E731
    assert norm(one(
        "SELECT JSON_ARRAY_INSERT('[1,3]', '$[1]', 2) AS j")) == "[1,2,3]"
    assert norm(one(
        "SELECT JSON_ARRAY_APPEND('[1]', '$', 2, '$', 3) AS j")) \
        == "[1,2,3]"
    assert norm(one(
        'SELECT JSON_ARRAY_APPEND(\'{"a":1}\', \'$.a\', 2) AS j')) \
        == '{"a":[1,2]}'
    assert norm(one(
        'SELECT JSON_EXTRACT(\'{"a":1,"b":2}\', \'$.a\', \'$.b\') '
        "AS j")) == "[1,2]"
    assert norm(one(
        'SELECT JSON_EXTRACT(\'{"a":{"b":1}}\', \'$.a.*\') AS j')) \
        == "[1]"
    assert norm(one(
        'SELECT JSON_EXTRACT(\'[{"x":1},{"x":2}]\', \'$[*].x\') '
        "AS j")) == "[1,2]"
    assert norm(one(
        'SELECT JSON_EXTRACT(\'{"a":{"b":1},"b":9}\', \'$**.b\') '
        "AS j")) == "[9,1]"
    # single plain path keeps the JVM-side get_json_object
    assert one('SELECT JSON_EXTRACT(\'{"a":5}\', \'$.a\') AS j') == "5"
    assert one(
        'SELECT JSON_LENGTH(\'{"a":[1,2]}\', \'$.a\') AS j') == 2
    assert one(
        'SELECT JSON_LENGTH(\'{"a":{"x":1,"y":2}}\', \'$.a\') AS j') == 2
    assert one('SELECT JSON_LENGTH(\'{"a":5}\', \'$.a\') AS j') == 1
    assert one("SELECT JSON_LENGTH('{}', '$.a') AS j") is None


def test_round9_json_batch(spark, tmp_path):
    """last/ranges in paths ($[last], $[1 to 2], $[1 to last],
    $[last-1]), 2-arg JSON_KEYS, heterogeneous JSON_ARRAY/JSON_OBJECT
    (per-value types survive), JSON_VALUE RETURNING casts,
    JSON_STORAGE_FREE (probe battery round 9; MySQL-manual values)."""
    from decimal import Decimal

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))

    def v(q):
        return tuple(e.execute(q).collect()[0])

    assert v("SELECT JSON_EXTRACT('{\"a\": [1, 2]}', '$.a[last]') AS x"
             ) == ("2",)
    assert v("SELECT JSON_EXTRACT('[1,2,3,4]', '$[1 to 2]') AS x") \
        == ("[2, 3]",)
    assert v("SELECT JSON_EXTRACT('[1,2,3,4]', '$[1 to last]') AS x") \
        == ("[2, 3, 4]",)
    assert v("SELECT JSON_EXTRACT('[5,6]', '$[last-1]') AS x") == ("5",)
    assert v("SELECT JSON_KEYS('{\"a\":1,\"b\":{\"c\":2}}', '$.b') AS x"
             ) == ('["c"]',)
    assert v("SELECT JSON_ARRAY(1, 'two', NULL, TRUE) AS x") \
        == ('[1, "two", null, true]',)
    assert v("SELECT JSON_OBJECT('k', 1, 'l', 'x', 'm', NULL) AS x") \
        == ('{"k": 1, "l": "x", "m": null}',)
    # homogeneous-literal fast path keeps the pinned compact form
    assert v("SELECT JSON_ARRAY(1, 2, 3) AS x") == ("[1,2,3]",)
    r = v("SELECT JSON_VALUE('{\"a\": 3.2}', '$.a' "
          "RETURNING DECIMAL(5,2)) AS x")
    assert r == (Decimal("3.20"),)
    assert v("SELECT JSON_STORAGE_FREE('{}') AS x") == (0,)
