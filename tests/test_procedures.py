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


def test_procedure_rejects_loops(eng):
    with pytest.raises(NotImplementedError):
        eng.execute(
            "CREATE PROCEDURE lp(IN x INT) BEGIN "
            "LOOP SELECT 1; END LOOP; END"
        )


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


def test_procedure_if_elseif_else(eng):
    eng.execute("CREATE TABLE cls (label VARCHAR(10))")
    eng.execute(
        "CREATE PROCEDURE classify(IN x INT) BEGIN "
        "IF x > 100 THEN INSERT INTO cls VALUES ('big'); "
        "ELSEIF x > 10 THEN INSERT INTO cls VALUES ('mid'); "
        "ELSE INSERT INTO cls VALUES ('small'); "
        "END IF; END"
    )
    eng.execute("CALL classify(500)")
    eng.execute("CALL classify(50)")
    eng.execute("CALL classify(5)")
    assert sorted(r.label for r in
                  eng.execute("SELECT * FROM cls").collect()) == \
        ["big", "mid", "small"]


def test_procedure_while_and_locals(eng):
    eng.execute("CREATE TABLE seq (n INT)")
    eng.execute(
        "CREATE PROCEDURE fill_seq(IN k INT) BEGIN "
        "DECLARE i INT DEFAULT 1; "
        "WHILE i <= k DO "
        "INSERT INTO seq VALUES (i); "
        "SET i = i + 1; "
        "END WHILE; END"
    )
    eng.execute("CALL fill_seq(4)")
    assert sorted(r.n for r in
                  eng.execute("SELECT * FROM seq").collect()) == \
        [1, 2, 3, 4]


def test_procedure_nested_if_in_while(eng):
    eng.execute("CREATE TABLE fizz (n INT, tag VARCHAR(8))")
    eng.execute(
        "CREATE PROCEDURE fz(IN k INT) BEGIN "
        "DECLARE i INT DEFAULT 1; "
        "WHILE i <= k DO "
        "IF i % 3 = 0 THEN INSERT INTO fizz VALUES (i, 'fizz'); "
        "ELSE INSERT INTO fizz VALUES (i, 'n'); "
        "END IF; "
        "SET i = i + 1; "
        "END WHILE; END"
    )
    eng.execute("CALL fz(6)")
    got = {r.n: r.tag for r in eng.execute("SELECT * FROM fizz").collect()}
    assert got == {1: "n", 2: "n", 3: "fizz", 4: "n", 5: "n", 6: "fizz"}


def test_procedure_still_rejects_cursors(eng):
    with pytest.raises(NotImplementedError):
        eng.execute(
            "CREATE PROCEDURE cur(IN x INT) BEGIN "
            "OPEN c1; FETCH c1 INTO y; CLOSE c1; END"
        )


def test_out_and_inout_params(eng):
    eng.execute(
        "CREATE PROCEDURE stats(IN lo INT, OUT total INT, INOUT runs INT) "
        "BEGIN "
        "SET total = (SELECT SUM(bal) FROM acct WHERE bal >= lo); "
        "SET runs = runs + 1; "
        "END"
    )
    eng.execute("SET @r = 10")
    eng.execute("CALL stats(60, @t, @r)")
    row = eng.execute("SELECT @t AS t, @r AS r").collect()[0]
    assert (row.t, row.r) == (100, 11)
    with pytest.raises(ValueError, match="@variable"):
        eng.execute("CALL stats(0, 5, @r)")
