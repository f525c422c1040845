"""Charset metadata + wire-output re-encoding (reference:
backend/iter.go:176-182 output re-encode; charset/charset.go:18-31
supported set)."""

from __future__ import annotations

import pytest

from myduckserver_spark.engine import Engine
from myduckserver_spark.functions.charset import encode_column, wire_encode
from myduckserver_spark.types import mysql_to_spark


def test_charset_metadata_parsed():
    dtype, meta = mysql_to_spark("VARCHAR(40) CHARACTER SET latin1")
    assert meta["charset"] == "latin1"
    dtype, meta = mysql_to_spark("TEXT CHARSET gbk")
    assert meta["charset"] == "gbk"
    dtype, meta = mysql_to_spark("VARCHAR(10) CHARACTER SET utf8mb4 COLLATE utf8mb4_bin")
    assert meta["charset"] == "utf8mb4" and meta["collation"] == "utf8mb4_bin"


def test_wire_encode_latin1_and_gbk(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE msg (id INT PRIMARY KEY, "
        "l VARCHAR(40) CHARACTER SET latin1, "
        "g VARCHAR(40) CHARACTER SET gbk, "
        "u VARCHAR(40) CHARACTER SET utf8mb4)"
    )
    e.execute("INSERT INTO msg (id, l, g, u) VALUES (1, 'café', '中文字', 'both')")
    df = e.catalog.table("msg").read()
    out = wire_encode(df).collect()[0]
    assert bytes(out.l) == "café".encode("latin-1")
    assert bytes(out.g) == "中文字".encode("gbk")
    assert out.u == "both"  # utf8 column passes through as a string
    assert out.id == 1  # non-string columns untouched


def test_encode_column_null_and_replace(spark):
    df = spark.createDataFrame([("ok",), (None,), ("中",)], "s string")
    rows = df.select(encode_column("s", "latin1").alias("b")).collect()
    assert bytes(rows[0].b) == b"ok"
    assert rows[1].b is None
    assert bytes(rows[2].b) == b"?"  # unmappable → replacement, not error


def test_unsupported_charset_raises(spark):
    with pytest.raises(ValueError, match="unsupported charset"):
        encode_column("s", "klingon")


def test_ci_collation_order_by(spark, tmp_path):
    """ORDER BY on a column declared COLLATE ..._ci sorts
    case-insensitively (reference: GMS TestCharsetCollationEngine);
    undeclared columns keep binary order."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_ci"))
    e.execute(
        "CREATE TABLE ci_t (id INT PRIMARY KEY, "
        "name VARCHAR(20) COLLATE utf8mb4_general_ci, "
        "tag VARCHAR(20))"
    )
    e.execute(
        "INSERT INTO ci_t VALUES (1, 'banana', 'banana'), "
        "(2, 'Apple', 'Apple'), (3, 'cherry', 'cherry')"
    )
    ci = [r.name for r in e.execute(
        "SELECT name FROM ci_t ORDER BY name"
    ).collect()]
    assert ci == ["Apple", "banana", "cherry"]  # case-insensitive
    e.execute("INSERT INTO ci_t VALUES (4, 'apple', 'apple')")
    ci2 = [r.name for r in e.execute(
        "SELECT name FROM ci_t ORDER BY name, id"
    ).collect()]
    assert ci2 == ["Apple", "apple", "banana", "cherry"]
    bin2 = [r.tag for r in e.execute(
        "SELECT tag FROM ci_t ORDER BY tag"
    ).collect()]
    assert bin2 == ["Apple", "apple", "banana", "cherry"]
