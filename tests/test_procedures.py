"""MySQL stored procedures (straight-line bodies, IN params
substituted at CALL) and stored SQL FUNCTIONs (mapped onto the macro
mechanism). Reference runs these GMS-side (main_test.go:1071);
control flow is rejected at CREATE, honestly."""

from __future__ import annotations

import pytest

from myduckserver_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE acct (id INT PRIMARY KEY, bal INT)")
    e.execute("INSERT INTO acct VALUES (1, 100), (2, 50)")
    return e


def test_procedure_create_call_drop(eng):
    eng.execute(
        "CREATE PROCEDURE transfer(IN src INT, IN dst INT, IN amt INT) "
        "BEGIN "
        "UPDATE acct SET bal = bal - amt WHERE id = src; "
        "UPDATE acct SET bal = bal + amt WHERE id = dst; "
        "SELECT id, bal FROM acct ORDER BY id; "
        "END"
    )
    out = eng.execute("CALL transfer(1, 2, 30)")
    assert [(r.id, r.bal) for r in out.collect()] == [(1, 70), (2, 80)]
    # wrong arity errors
    with pytest.raises(ValueError, match="arguments"):
        eng.execute("CALL transfer(1, 2)")
    eng.execute("DROP PROCEDURE transfer")
    with pytest.raises(ValueError):
        eng.execute("CALL transfer(1, 2, 30)")
    eng.execute("DROP PROCEDURE IF EXISTS transfer")


def test_procedure_param_substitution_is_string_safe(eng):
    eng.execute("CREATE TABLE logs (msg VARCHAR(60))")
    eng.execute(
        "CREATE PROCEDURE logit(IN msg TEXT) "
        "INSERT INTO logs VALUES (CONCAT('got: ', msg))"
    )
    # the literal word 'msg' inside the string must NOT be substituted
    eng.execute("CALL logit('hello')")
    assert [r.msg for r in
            eng.execute("SELECT * FROM logs").collect()] == ["got: hello"]


def test_procedure_persistence_and_show(eng, spark):
    eng.execute("CREATE PROCEDURE noop(IN x INT) SELECT (x) AS v")
    rows = eng.execute("SHOW PROCEDURE STATUS").collect()
    assert [(r.Name, r.Type) for r in rows] == [("noop", "PROCEDURE")]
    e2 = Engine(spark, eng._warehouse)
    assert e2.execute("CALL noop(7)").collect()[0].v == 7
    ddl = eng.execute("SHOW CREATE PROCEDURE noop").collect()[0][2]
    assert "CREATE PROCEDURE" in ddl and "SELECT (x) AS v" in ddl


def test_procedure_rejects_control_flow_and_out_params(eng):
    with pytest.raises(NotImplementedError, match="control flow"):
        eng.execute(
            "CREATE PROCEDURE cf(IN x INT) BEGIN "
            "IF x > 0 THEN SELECT 1; END IF; END"
        )
    with pytest.raises(NotImplementedError, match="OUT"):
        eng.execute("CREATE PROCEDURE op(OUT y INT) SELECT 1")


def test_stored_function_maps_to_macro(eng):
    eng.execute(
        "CREATE FUNCTION add_tax(amount INT) RETURNS DOUBLE "
        "DETERMINISTIC RETURN amount * 1.2"
    )
    assert eng.execute(
        "SELECT add_tax(bal) AS t FROM acct WHERE id = 2"
    ).collect()[0].t == 60.0
    rows = eng.execute("SHOW FUNCTION STATUS").collect()
    assert ("add_tax", "FUNCTION") in [(r.Name, r.Type) for r in rows]
    ddl = eng.execute("SHOW CREATE FUNCTION add_tax").collect()[0][2]
    assert "RETURN amount * 1.2" in ddl
    eng.execute("DROP FUNCTION add_tax")
    with pytest.raises(Exception):
        eng.execute("SELECT add_tax(1)").collect()


def test_function_begin_return_end_form(eng):
    eng.execute(
        "CREATE FUNCTION dbl(x INT) RETURNS INT BEGIN RETURN x * 2; END"
    )
    assert eng.execute("SELECT dbl(21) AS v").collect()[0].v == 42
