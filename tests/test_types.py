"""MySQL↔Spark type mapping (SURVEY.md §1.2 table; FIXTURES.md §3 alltypes)."""

import pytest
from pyspark.sql import types as T

from myduckserver_spark.types import mysql_to_spark, schema_from_mysql, spark_to_mysql

CASES = [
    ("TINYINT", T.ByteType()),
    ("TINYINT UNSIGNED", T.ShortType()),
    ("SMALLINT", T.ShortType()),
    ("SMALLINT UNSIGNED", T.IntegerType()),
    ("MEDIUMINT", T.IntegerType()),
    ("MEDIUMINT UNSIGNED", T.IntegerType()),
    ("INT", T.IntegerType()),
    ("INT UNSIGNED", T.LongType()),
    ("BIGINT", T.LongType()),
    ("BIGINT UNSIGNED", T.DecimalType(20, 0)),  # no unsigned 64-bit in Spark
    ("BIT(64)", T.LongType()),
    ("BOOL", T.BooleanType()),
    ("FLOAT", T.FloatType()),
    ("DOUBLE", T.DoubleType()),
    ("DECIMAL(15,4)", T.DecimalType(15, 4)),
    ("DECIMAL(38,10)", T.DecimalType(38, 10)),
    ("DATE", T.DateType()),
    ("DATETIME(6)", T.TimestampNTZType()),
    ("TIMESTAMP(3)", T.TimestampType()),
    ("TIME(6)", T.DayTimeIntervalType()),
    ("YEAR", T.ShortType()),
    ("CHAR(10)", T.StringType()),
    ("VARCHAR(255)", T.StringType()),
    ("TEXT", T.StringType()),
    ("BINARY(8)", T.BinaryType()),
    ("VARBINARY(255)", T.BinaryType()),
    ("BLOB", T.BinaryType()),
    ("JSON", T.StringType()),
    ("ENUM('small','medium','large')", T.StringType()),
    ("SET('a','b','c')", T.StringType()),
]


@pytest.mark.parametrize("mysql,expected", CASES)
def test_mapping(mysql, expected):
    got, meta = mysql_to_spark(mysql)
    assert got == expected
    assert meta["mysql_type"] == mysql


def test_decimal_precision_capped_at_38():
    # reference truncates precision to 38 (type_mapping.go:163-169)
    got, _ = mysql_to_spark("DECIMAL(65,30)")
    assert got == T.DecimalType(38, 3)


def test_enum_values_preserved_in_metadata():
    _, meta = mysql_to_spark("ENUM('small','medium','large')")
    assert meta["enum_values"] == ["small", "medium", "large"]


def test_geometry_rejected():
    # reference rejects GEOMETRY too (type_mapping.go:194-195)
    with pytest.raises(ValueError):
        mysql_to_spark("GEOMETRY")


def test_lossless_roundtrip_via_metadata():
    schema = schema_from_mysql(
        [("a", "SET('a','b','c')"), ("b", "MEDIUMINT UNSIGNED")], not_null={"a"}
    )
    assert not schema["a"].nullable and schema["b"].nullable
    assert spark_to_mysql(schema["a"].dataType, schema["a"].metadata) == "SET('a','b','c')"
    assert spark_to_mysql(schema["b"].dataType, schema["b"].metadata) == "MEDIUMINT UNSIGNED"


def test_reverse_mapping_without_metadata():
    assert spark_to_mysql(T.DecimalType(20, 0)) == "DECIMAL(20,0)"
    assert spark_to_mysql(T.LongType()) == "BIGINT"


def test_time_negative_duration_and_zero_date(spark, tmp_path):
    """MySQL TIME is a signed duration (reference maps it to INTERVAL,
    type_mapping.go:150-153); zero dates coerce to NULL (not
    representable — SURVEY §7 risk register)."""
    import datetime as dt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_tz"))
    e.execute("CREATE TABLE tt (id INT PRIMARY KEY, d TIME)")
    e.execute("INSERT INTO tt (id, d) VALUES (1, '-02:30:00')")
    e.execute("INSERT INTO tt (id, d) VALUES (2, '838:59:59')")
    e.execute("INSERT INTO tt (id, d) VALUES (3, '01:02:03.5')")
    rows = {r.id: r.d for r in e.sql("SELECT id, d FROM tt").collect()}
    assert rows[1] == -dt.timedelta(hours=2, minutes=30)
    assert rows[2] == dt.timedelta(hours=838, minutes=59, seconds=59)
    assert rows[3] == dt.timedelta(hours=1, minutes=2, seconds=3, microseconds=500000)

    e.execute("CREATE TABLE zd (id INT PRIMARY KEY, d DATE, ts DATETIME)")
    e.execute(
        "INSERT INTO zd (id, d, ts) VALUES "
        "(1, '0000-00-00', '0000-00-00 00:00:00'), (2, '2024-02-29', NULL)"
    )
    rows = {r.id: (r.d, r.ts) for r in e.sql("SELECT * FROM zd").collect()}
    assert rows[1] == (None, None)
    assert rows[2][0] == dt.date(2024, 2, 29)


def test_sized_array_ddl_types(spark, tmp_path):
    """pg sized-array column types: a declared dimension is
    documentation in PostgreSQL — FLOAT[4] ≡ FLOAT[] (round-10
    verdict fix: the sized spelling silently created a SCALAR
    column)."""
    from myduckserver_spark.engine import Engine
    from myduckserver_spark.types import mysql_to_spark
    import pyspark.sql.types as T

    t, _ = mysql_to_spark("FLOAT[4]")
    assert t == T.ArrayType(T.FloatType())
    t, _ = mysql_to_spark("text[3]")
    assert isinstance(t, T.ArrayType)

    e = Engine(spark, str(tmp_path / "wh_sized"))
    e.execute("CREATE TABLE emb (id INT, v FLOAT[4])")
    e.execute("INSERT INTO emb VALUES (1, ARRAY(0.1, 0.2, 0.3, 0.4))")
    rows = e.execute("SELECT id, v FROM emb").collect()
    assert len(rows[0].v) == 4
    # pg-dialect spelling with a string element type
    e.execute("CREATE TABLE tags3 (id INT, tags text[3])",
              dialect="postgres")
    e.execute("INSERT INTO tags3 VALUES (1, ARRAY['a','b','c'])",
              dialect="postgres")
    rows = e.execute("SELECT tags FROM tags3",
                     dialect="postgres").collect()
    assert rows[0].tags == ["a", "b", "c"]
