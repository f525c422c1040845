"""Quote-style conversion parity with the reference transpiler.

Every case below is ported from the reference's converter tests
(transpiler/converter_test.go: TestNormalizeStrings ~:14-100,
TestDenormalizeStrings ~:115-170) — the MySQL->PG and PG->MySQL
quote normalization the reference applies around its engine.
"""

import pytest

from myduckserver_spark.functions.converter import (
    denormalize_strings,
    normalize_strings,
)

# (input, expected) ported from converter_test.go TestNormalizeStrings
NORMALIZE_CASES = [
    ('SELECT "foo" FROM `bar`', "SELECT 'foo' FROM \"bar\""),
    ('SELECT "foo"', "SELECT 'foo'"),
    ('SELECT "fo\\"o"', "SELECT 'fo\"o'"),
    ("SELECT \"fo\\'o\"", "SELECT 'fo''o'"),
    ("SELECT 'fo\\'o'", "SELECT 'fo''o'"),
    ("SELECT 'fo\\\"o'", "SELECT 'fo\"o'"),
    ("SELECT 'fo\\\\\"o'", "SELECT 'fo\\\"o'"),
    ("SELECT 'fo\\\\\\'o'", "SELECT 'fo\\''o'"),
    ("SELECT \"fo\\\\'o\"", "SELECT 'fo\\''o'"),
    ('SELECT "fo\\\\\\"o"', "SELECT 'fo\\\"o'"),
    ("SELECT 'fo''o'", "SELECT 'fo''o'"),
    ("SELECT 'fo''''o'", "SELECT 'fo''''o'"),
    ("SELECT \"fo'o\"", "SELECT 'fo''o'"),
    ("SELECT \"fo''o\"", "SELECT 'fo''''o'"),
    ('SELECT "fo""o"', "SELECT 'fo\"o'"),
    ('SELECT "fo""""o"', "SELECT 'fo\"\"o'"),
    ("SELECT 'fo\"\"o'", "SELECT 'fo\"\"o'"),
    ("SELECT `foo` FROM `bar`", 'SELECT "foo" FROM "bar"'),
    ("SELECT 'foo' FROM `bar`", "SELECT 'foo' FROM \"bar\""),
    ("SELECT `f\"o'o` FROM `ba``r`", "SELECT \"f\"o'o\" FROM \"ba`r\""),
    (
        "SELECT \"foo\" from `bar` where `bar`.`baz` = \"qux\"",
        "SELECT 'foo' from \"bar\" where \"bar\".\"baz\" = 'qux'",
    ),
]

# (input, expected) ported from converter_test.go TestDenormalizeStrings
DENORMALIZE_CASES = [
    ("SELECT 'foo' FROM \"bar\"", "SELECT 'foo' FROM `bar`"),
    ("SELECT 'foo'", "SELECT 'foo'"),
    ("SELECT 'fo\"o'", "SELECT 'fo\"o'"),
    ("SELECT 'fo''o'", "SELECT 'fo''o'"),
    ("SELECT 'fo''''o'", "SELECT 'fo''''o'"),
    ('SELECT "foo" FROM "bar"', "SELECT `foo` FROM `bar`"),
    ("SELECT 'foo' FROM \"bar\"", "SELECT 'foo' FROM `bar`"),
    (
        "SELECT 'foo' from \"bar\" where \"bar\".\"baz\" = 'qux'",
        "SELECT 'foo' from `bar` where `bar`.`baz` = 'qux'",
    ),
    ('SELECT "fo""o" FROM "bar"', "SELECT `fo\"o` FROM `bar`"),
    ('SELECT "fo`o" FROM "bar"', "SELECT `fo``o` FROM `bar`"),
    ("SELECT 'fo\"\"o' FROM \"bar\"", "SELECT 'fo\"\"o' FROM `bar`"),
]


@pytest.mark.parametrize("sql,expected", NORMALIZE_CASES)
def test_normalize_strings(sql, expected):
    assert normalize_strings(sql) == expected


@pytest.mark.parametrize("sql,expected", DENORMALIZE_CASES)
def test_denormalize_strings(sql, expected):
    assert denormalize_strings(sql) == expected


def test_normalize_preserves_comments_and_ops():
    sql = "SELECT a /* \"not a string\" */ -- `nor this`\nFROM t WHERE a <=> 'x\\'y'"
    out = normalize_strings(sql)
    assert '/* "not a string" */' in out
    assert "-- `nor this`" in out
    assert "'x''y'" in out


def test_roundtrip_identifier_and_string():
    mysql = "SELECT `we``ird`, \"s'tr\" FROM `t`"
    pg = normalize_strings(mysql)
    assert pg == "SELECT \"we`ird\", 's''tr' FROM \"t\""
    back = denormalize_strings(pg)
    # identifier round-trips; the string stays single-quoted MySQL-safe
    assert back == "SELECT `we``ird`, 's''tr' FROM `t`"
