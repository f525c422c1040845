"""User-variable assignment in expressions (SELECT @x := ...).

MySQL evaluates @x := per row; after the statement the variable holds
its last-row value, and the running-total idiom @x := @x + e is the
classic pre-window-function cumulative sum (the reference routes these
through GMS's user-variable support; transpiler keeps @ tokens
intact). The engine translates the additive self-reference to a
partition-parallel window SUM — scale-correct — and pins value parity
with MySQL semantics here.
"""

import pytest

from myduckserver_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.create_table(
        "uv_t",
        [("id", "INT"), ("v", "INT")],
        rows=[(1, 10), (2, 20), (3, 30), (4, 40)],
    )
    return e


def test_simple_assignment_returns_and_sets(engine):
    rows = engine.execute("SELECT @x := 41 + 1").collect()
    assert rows[0][0] == 42
    assert engine.variables["x"] == 42
    # subsequent statements read the assigned value
    rows = engine.execute("SELECT @x + 1 AS n").collect()
    assert rows[0]["n"] == 43


def test_assignment_from_table_last_row(engine):
    rows = engine.execute(
        "SELECT @last := v FROM uv_t ORDER BY id"
    ).collect()
    assert [r[0] for r in rows] == [10, 20, 30, 40]
    assert engine.variables["last"] == 40  # last row in result order
    # descending order flips the final value
    engine.execute("SELECT @last := v FROM uv_t ORDER BY id DESC").collect()
    assert engine.variables["last"] == 10


def test_running_total_idiom(engine):
    engine.execute("SET @s = 0")
    rows = engine.execute(
        "SELECT id, @s := @s + v AS rt FROM uv_t ORDER BY id"
    ).collect()
    assert [(r.id, r.rt) for r in rows] == [
        (1, 10),
        (2, 30),
        (3, 60),
        (4, 100),
    ]
    assert engine.variables["s"] == 100


def test_row_counter_idiom(engine):
    engine.execute("SET @rn = 0")
    rows = engine.execute(
        "SELECT @rn := @rn + 1 AS rn, v FROM uv_t ORDER BY v DESC"
    ).collect()
    assert [(r.rn, r.v) for r in rows] == [(1, 40), (2, 30), (3, 20), (4, 10)]
    assert engine.variables["rn"] == 4


def test_unset_variable_is_null_faithful(engine):
    # MySQL: unset @u is NULL, NULL + v stays NULL on every row
    rows = engine.execute(
        "SELECT @u := @u + v FROM uv_t ORDER BY id"
    ).collect()
    assert all(r[0] is None for r in rows)


def test_assignment_zero_rows_leaves_var(engine):
    engine.execute("SET @z = 7")
    engine.execute("SELECT @z := v FROM uv_t WHERE v > 999").collect()
    assert engine.variables["z"] == 7


def test_multiple_assignments_one_select(engine):
    rows = engine.execute("SELECT @a := 1, @b := 'two'").collect()
    assert tuple(rows[0]) == (1, "two")
    assert engine.variables["a"] == 1
    assert engine.variables["b"] == "two"


def test_string_literal_with_assign_text_untouched(engine):
    rows = engine.execute("SELECT '@x := 5' AS s").collect()
    assert rows[0]["s"] == "@x := 5"
    assert "x" not in engine.variables


def test_non_select_list_assignment_raises(engine):
    with pytest.raises(NotImplementedError):
        engine.execute("SELECT v FROM uv_t WHERE (@w := v) > 0")


def test_non_additive_self_reference_raises(engine):
    engine.execute("SET @m = 1")
    with pytest.raises(NotImplementedError):
        engine.execute("SELECT @m := @m * 2 FROM uv_t")


def test_ordinal_order_by_resolves_to_select_item(engine):
    # ORDER BY 1 must mean "first select item" inside the running-total
    # window, not the constant 1 (which MySQL-silently breaks totals).
    engine.execute("SET @s = 0")
    rows = engine.execute(
        "SELECT v, @s := @s + v AS rt FROM uv_t ORDER BY 1 DESC"
    ).collect()
    assert [(r.v, r.rt) for r in rows] == [
        (40, 40),
        (30, 70),
        (20, 90),
        (10, 100),
    ]
    assert engine.variables["s"] == 100  # MySQL's value, not 80


def test_alias_order_by_resolves_to_expression(engine):
    engine.execute("SET @s = 0")
    rows = engine.execute(
        "SELECT v * 2 AS d, @s := @s + v AS rt FROM uv_t ORDER BY d DESC"
    ).collect()
    assert [(r.d, r.rt) for r in rows] == [
        (80, 40),
        (60, 70),
        (40, 90),
        (20, 100),
    ]
    assert engine.variables["s"] == 100


def test_order_by_assignment_alias_raises(engine):
    engine.execute("SET @s = 0")
    with pytest.raises(NotImplementedError):
        engine.execute(
            "SELECT @s := @s + v AS rt FROM uv_t ORDER BY rt"
        )


def test_order_by_assignment_ordinal_raises(engine):
    engine.execute("SET @s = 0")
    with pytest.raises(NotImplementedError):
        engine.execute("SELECT @s := @s + v FROM uv_t ORDER BY 1")


def test_implicit_alias_after_assignment(engine):
    # MySQL implicit alias: SELECT @x := v total  ->  column "total"
    rows = engine.execute(
        "SELECT @x := v total FROM uv_t ORDER BY id"
    ).collect()
    assert rows[0].__fields__ == ["total"]
    assert [r.total for r in rows] == [10, 20, 30, 40]
    assert engine.variables["x"] == 40


def test_assignment_with_set_operation_raises(engine):
    with pytest.raises(NotImplementedError):
        engine.execute("SELECT 1 UNION ALL SELECT @u := 2")
    assert "u" not in engine.variables


def test_assignment_returns_rows_consistent_with_var(engine):
    # the returned DataFrame is a local relation over the SAME rows the
    # variable was set from (no second execution on client collect)
    df = engine.execute("SELECT @last2 := v FROM uv_t ORDER BY id")
    assert engine.variables["last2"] == 40  # set before client collect
    rows = df.collect()
    assert [r[0] for r in rows] == [10, 20, 30, 40]
