"""PREPARE / EXECUTE USING / DEALLOCATE + user-variable interpolation
(reference: extended-protocol Parse/Bind/Execute,
pgserver/duck_handler.go:133-233 and :105-130; MySQL PREPARE via GMS)."""

import pytest

from myduckserver_spark.engine import Engine
from myduckserver_spark.statements import bind_placeholders, count_placeholders


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE items (id INT, name VARCHAR(20), price DOUBLE)"
    )
    e.execute(
        "INSERT INTO items VALUES (1,'apple',1.5),(2,'pear',2.0),(3,'fig',9.9)"
    )
    return e


def test_placeholder_scan_skips_literals():
    assert count_placeholders("SELECT * FROM t WHERE a = ? AND b = '?'") == 1
    assert (
        bind_placeholders("a = ? AND b = '?' AND c = ?", ["1", "2"])
        == "a = 1 AND b = '?' AND c = 2"
    )


def test_prepare_execute_select_positional(engine):
    engine.execute("PREPARE q FROM 'SELECT name FROM items WHERE price < ? ORDER BY id'")
    rows = engine.execute("SET @p = 2.5; EXECUTE q USING @p")[-1]
    assert [r.name for r in rows.collect()] == ["apple", "pear"]
    # rebind with a different value — same plan text, new parameter
    engine.execute("SET @p = 1.9")
    assert [r.name for r in engine.execute("EXECUTE q USING @p").collect()] == ["apple"]


def test_prepare_execute_no_params(engine):
    engine.execute("PREPARE c FROM 'SELECT COUNT(*) AS n FROM items'")
    assert engine.execute("EXECUTE c").collect()[0].n == 3


def test_prepare_from_user_variable(engine):
    engine.execute("SET @stmt = 'SELECT MAX(price) AS m FROM items'")
    engine.execute("PREPARE s FROM @stmt")
    assert engine.execute("EXECUTE s").collect()[0].m == 9.9


def test_prepared_dml_binds_literals(engine):
    engine.execute("PREPARE ins FROM 'INSERT INTO items VALUES (?, ?, ?)'")
    engine.execute("SET @i = 4; SET @n = \"o'brien\"; SET @v = 0.5")
    ok = engine.execute("EXECUTE ins USING @i, @n, @v")
    assert ok.affected_rows == 1
    rows = engine.execute("SELECT name FROM items WHERE id = 4").collect()
    assert rows[0].name == "o'brien"  # quote-escaped round trip


def test_param_count_mismatch_and_deallocate(engine):
    engine.execute("PREPARE q FROM 'SELECT * FROM items WHERE id = ?'")
    with pytest.raises(ValueError, match="needs 1 parameters, got 0"):
        engine.execute("EXECUTE q")
    engine.execute("DEALLOCATE PREPARE q")
    with pytest.raises(ValueError, match="unknown prepared statement"):
        engine.execute("EXECUTE q")


def test_user_vars_in_plain_select(engine):
    engine.execute("SET @cutoff = 2")
    rows = engine.execute(
        "SELECT name, @cutoff AS c FROM items WHERE id <= @cutoff ORDER BY id"
    ).collect()
    assert [(r.name, r.c) for r in rows] == [("apple", 2), ("pear", 2)]
    # unset variables fold to NULL, as in MySQL
    assert engine.execute("SELECT @nope AS x").collect()[0].x is None
    # '@' inside a string literal is untouched
    got = engine.execute("SELECT '@cutoff' AS s").collect()[0].s
    assert got == "@cutoff"
