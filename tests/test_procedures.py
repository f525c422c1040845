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


def test_resignal_in_handler(eng):
    """RESIGNAL re-raises the handled condition — bare form passes the
    original through, SQLSTATE/MESSAGE_TEXT form relabels it."""
    from myduckserver_spark.engine import SignalError

    eng.execute(
        "CREATE PROCEDURE rs1() BEGIN "
        "DECLARE EXIT HANDLER FOR SQLSTATE '45000' RESIGNAL; "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'original'; "
        "END"
    )
    with pytest.raises(SignalError, match="original") as ei:
        eng.execute("CALL rs1()")
    assert ei.value.sqlstate == "45000"
    eng.execute(
        "CREATE PROCEDURE rs2() BEGIN "
        "DECLARE EXIT HANDLER FOR SQLEXCEPTION "
        "RESIGNAL SQLSTATE '45001' SET MESSAGE_TEXT = 'wrapped'; "
        "INSERT INTO missing_tbl VALUES (1); "
        "END"
    )
    with pytest.raises(SignalError, match="wrapped") as ei2:
        eng.execute("CALL rs2()")
    assert ei2.value.sqlstate == "45001"
    # GET DIAGNOSTICS in a handler body is supported (round 7) — the
    # CREATE must be accepted; behavior is covered by
    # test_get_diagnostics_condition_in_handler
    eng.execute(
        "CREATE PROCEDURE gd() BEGIN "
        "DECLARE EXIT HANDLER FOR SQLEXCEPTION "
        "GET DIAGNOSTICS CONDITION 1 @e = MESSAGE_TEXT; "
        "SELECT 1; END"
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


def test_cursor_loop_canonical(eng):
    """MySQL's canonical cursor pattern: DECLARE CURSOR + NOT FOUND
    CONTINUE handler + labeled LOOP with FETCH INTO / LEAVE. Iteration
    is driver-side (cursors are row-at-a-time by definition), capped
    so data-proportional work fails loudly."""
    eng.execute("CREATE TABLE tot (s INT)")
    eng.execute(
        "CREATE PROCEDURE sum_bal(OUT total INT) BEGIN "
        "DECLARE done INT DEFAULT FALSE; "
        "DECLARE b INT DEFAULT 0; "
        "DECLARE cur CURSOR FOR SELECT bal FROM acct ORDER BY id; "
        "DECLARE CONTINUE HANDLER FOR NOT FOUND SET done = TRUE; "
        "SET total = 0; "
        "OPEN cur; "
        "read_loop: LOOP "
        "  FETCH cur INTO b; "
        "  IF done THEN LEAVE read_loop; END IF; "
        "  SET total = total + b; "
        "END LOOP; "
        "CLOSE cur; "
        "END"
    )
    eng.execute("CALL sum_bal(@t)")
    assert eng.execute("SELECT @t AS t").collect()[0].t == 150


def test_cursor_multi_column_fetch_and_reopen(eng):
    eng.execute(
        "CREATE PROCEDURE first_acct(OUT i INT, OUT b INT) BEGIN "
        "DECLARE c CURSOR FOR SELECT id, bal FROM acct ORDER BY id; "
        "OPEN c; "
        "FETCH c INTO i, b; "
        "CLOSE c; "
        "END"
    )
    eng.execute("CALL first_acct(@i, @b)")
    row = eng.execute("SELECT @i AS i, @b AS b").collect()[0]
    assert (row.i, row.b) == (1, 100)
    # FETCH on a closed/unopened cursor is an error (no NOT FOUND)
    eng.execute(
        "CREATE PROCEDURE bad_fetch() BEGIN "
        "DECLARE c2 CURSOR FOR SELECT id FROM acct; "
        "FETCH c2 INTO @x; "
        "END"
    )
    with pytest.raises(ValueError, match="not open"):
        eng.execute("CALL bad_fetch()")


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


def test_labeled_loop_with_iterate_and_leave(eng):
    """Labeled LOOP with ITERATE (skip odd ids) and LEAVE (stop at 10)
    — MySQL's canonical loop pattern (reference corpus
    main_test.go:1071 exercises stored-procedure control flow)."""
    eng.execute("CREATE TABLE evens (n INT)")
    eng.execute(
        "CREATE PROCEDURE fill_evens() BEGIN "
        "DECLARE i INT DEFAULT 0; "
        "lp: LOOP "
        "  SET i = i + 1; "
        "  IF i > 10 THEN LEAVE lp; END IF; "
        "  IF i % 2 <> 0 THEN ITERATE lp; END IF; "
        "  INSERT INTO evens VALUES (i); "
        "END LOOP lp; "
        "SELECT COUNT(*) AS n FROM evens; "
        "END"
    )
    out = eng.execute("CALL fill_evens()")
    assert out.collect()[0].n == 5
    got = sorted(r.n for r in eng.execute("SELECT * FROM evens").collect())
    assert got == [2, 4, 6, 8, 10]


def test_repeat_until(eng):
    eng.execute(
        "CREATE PROCEDURE countdown(IN start INT, OUT steps INT) BEGIN "
        "DECLARE i INT DEFAULT start; "
        "SET steps = 0; "
        "REPEAT "
        "  SET i = i - 1; "
        "  SET steps = steps + 1; "
        "UNTIL i <= 0 END REPEAT; "
        "END"
    )
    eng.execute("CALL countdown(4, @s)")
    assert eng.execute("SELECT @s AS s").collect()[0].s == 4
    # REPEAT runs the body at least once even when already satisfied
    eng.execute("CALL countdown(0, @s0)")
    assert eng.execute("SELECT @s0 AS s").collect()[0].s == 1


def test_nested_loops_labels_target_outer(eng):
    eng.execute(
        "CREATE PROCEDURE nest(OUT total INT) BEGIN "
        "DECLARE i INT DEFAULT 0; "
        "SET total = 0; "
        "outer_lp: WHILE i < 5 DO "
        "  SET i = i + 1; "
        "  inner_lp: LOOP "
        "    SET total = total + 1; "
        "    IF total >= 7 THEN LEAVE outer_lp; END IF; "
        "  END LOOP inner_lp; "
        "END WHILE; "
        "END"
    )
    eng.execute("CALL nest(@t)")
    # the inner LOOP spins until the OUTER label's LEAVE fires at 7 —
    # proving a labeled LEAVE propagates past the inner loop
    assert eng.execute("SELECT @t AS t").collect()[0].t == 7


def test_leave_without_matching_label_errors(eng):
    eng.execute(
        "CREATE PROCEDURE bad() BEGIN LEAVE nowhere; END"
    )
    with pytest.raises(ValueError, match="no matching loop label"):
        eng.execute("CALL bad()")


def test_loop_runaway_guard(eng):
    eng.execute("CREATE PROCEDURE spin() BEGIN lp: LOOP SET @x = 1; "
                "END LOOP lp; END")
    with pytest.raises(ValueError, match="LOOP exceeded"):
        eng.execute("CALL spin()")


def test_locals_only_while_runs_zero_spark_jobs(eng, monkeypatch):
    """A WHILE whose condition and body touch only locals must execute
    entirely driver-side: zero Spark queries. Engine.sql is the single
    funnel for Spark evaluation, so counting its calls counts jobs."""
    eng.execute(
        "CREATE PROCEDURE gauss(IN n INT, OUT total INT) BEGIN "
        "DECLARE i INT DEFAULT 0; "
        "SET total = 0; "
        "WHILE i < n DO "
        "  SET i = i + 1; "
        "  SET total = total + i; "
        "END WHILE; "
        "END"
    )
    calls = {"n": 0}
    orig = Engine.sql

    def counting_sql(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(Engine, "sql", counting_sql)
    eng.execute("CALL gauss(100, @g)")
    monkeypatch.undo()
    assert calls["n"] == 0, f"locals-only WHILE launched {calls['n']} jobs"
    assert eng.execute("SELECT @g AS g").collect()[0].g == 5050


def test_signal_in_procedure(eng):
    from myduckserver_spark.engine import SignalError

    eng.execute(
        "CREATE PROCEDURE withdraw(IN acct_id INT, IN amt INT) BEGIN "
        "DECLARE cur INT DEFAULT (SELECT bal FROM acct WHERE id = acct_id); "
        "IF cur < amt THEN "
        "  SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'insufficient funds'; "
        "END IF; "
        "UPDATE acct SET bal = bal - amt WHERE id = acct_id; "
        "END"
    )
    eng.execute("CALL withdraw(1, 30)")
    assert eng.execute("SELECT bal FROM acct WHERE id = 1") \
        .collect()[0].bal == 70
    with pytest.raises(SignalError, match="insufficient funds"):
        eng.execute("CALL withdraw(2, 999)")
    # the failed call left the balance untouched
    assert eng.execute("SELECT bal FROM acct WHERE id = 2") \
        .collect()[0].bal == 50


def test_case_statement_searched_and_subject_forms(eng):
    """CASE statements lower onto the IF machinery; a CASE with no
    matching branch and no ELSE raises MySQL's 'Case not found'
    (error 1339 / SQLSTATE 20000) instead of silently no-opping."""
    from myduckserver_spark.engine import SignalError

    eng.execute("CREATE TABLE cls2 (label VARCHAR(12))")
    eng.execute(
        "CREATE PROCEDURE classify2(IN x INT) BEGIN "
        "CASE WHEN x > 100 THEN INSERT INTO cls2 VALUES ('big'); "
        "WHEN x > 10 THEN INSERT INTO cls2 VALUES ('mid'); "
        "ELSE INSERT INTO cls2 VALUES ('small'); "
        "END CASE; END"
    )
    for v in (500, 50, 5):
        eng.execute(f"CALL classify2({v})")
    assert sorted(r.label for r in
                  eng.execute("SELECT * FROM cls2").collect()) == \
        ["big", "mid", "small"]
    # subject form: CASE subj WHEN v THEN
    eng.execute(
        "CREATE PROCEDURE tag(IN code INT, OUT t VARCHAR(8)) BEGIN "
        "CASE code "
        "WHEN 1 THEN SET t = 'one'; "
        "WHEN 2 THEN SET t = 'two'; "
        "END CASE; END"
    )
    eng.execute("CALL tag(2, @t)")
    assert eng.execute("SELECT @t AS t").collect()[0].t == "two"
    # no branch, no ELSE -> Case not found (MySQL 1339)
    with pytest.raises(SignalError, match="Case not found"):
        eng.execute("CALL tag(9, @t)")


def test_continue_and_exit_handlers(eng):
    """DECLARE CONTINUE/EXIT HANDLER: CONTINUE rescues the failing
    statement and resumes; EXIT runs the handler then leaves the
    declaring block. SQLSTATE handlers beat class handlers."""
    from myduckserver_spark.engine import SignalError

    eng.execute("CREATE TABLE hlog (step VARCHAR(16))")
    eng.execute(
        "CREATE PROCEDURE resilient() BEGIN "
        "DECLARE CONTINUE HANDLER FOR SQLEXCEPTION "
        "  INSERT INTO hlog VALUES ('rescued'); "
        "INSERT INTO hlog VALUES ('before'); "
        "INSERT INTO missing_table VALUES (1); "
        "INSERT INTO hlog VALUES ('after'); "
        "END"
    )
    eng.execute("CALL resilient()")
    # snapshot storage doesn't preserve insertion order; compare sets
    assert sorted(r.step for r in
                  eng.execute("SELECT * FROM hlog").collect()) \
        == ["after", "before", "rescued"]
    eng.execute("DELETE FROM hlog")
    eng.execute(
        "CREATE PROCEDURE bail() BEGIN "
        "DECLARE EXIT HANDLER FOR SQLSTATE '45000' "
        "  INSERT INTO hlog VALUES ('caught45'); "
        "INSERT INTO hlog VALUES ('start'); "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'boom'; "
        "INSERT INTO hlog VALUES ('unreached'); "
        "END"
    )
    eng.execute("CALL bail()")
    assert sorted(r.step for r in
                  eng.execute("SELECT * FROM hlog").collect()) \
        == ["caught45", "start"]
    # a handler declared for a DIFFERENT sqlstate does not rescue
    eng.execute(
        "CREATE PROCEDURE misses() BEGIN "
        "DECLARE EXIT HANDLER FOR SQLSTATE '22000' SET @never = 1; "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'through'; "
        "END"
    )
    with pytest.raises(SignalError, match="through"):
        eng.execute("CALL misses()")


def test_get_diagnostics_row_count(eng):
    """GET DIAGNOSTICS v = ROW_COUNT reads the previous statement's
    affected count (reference procedure corpus, main_test.go:1071)."""
    eng.execute(
        "CREATE PROCEDURE bump(IN amt INT) BEGIN "
        "DECLARE rc INT DEFAULT -1; "
        "UPDATE acct SET bal = bal + amt; "
        "GET DIAGNOSTICS rc = ROW_COUNT; "
        "SET @rows_touched = rc; "
        "END"
    )
    eng.execute("CALL bump(5)")
    assert eng.execute(
        "SELECT @rows_touched AS n"
    ).collect()[0].n == 2  # both acct rows updated


def test_get_diagnostics_condition_in_handler(eng):
    """A handler body can read the caught condition via GET
    DIAGNOSTICS CONDITION 1 … RETURNED_SQLSTATE / MESSAGE_TEXT."""
    eng.execute(
        "CREATE PROCEDURE probe() BEGIN "
        "DECLARE CONTINUE HANDLER FOR SQLEXCEPTION "
        "  GET DIAGNOSTICS CONDITION 1 "
        "    @caught_state = RETURNED_SQLSTATE, "
        "    @caught_msg = MESSAGE_TEXT; "
        "SIGNAL SQLSTATE '45022' SET MESSAGE_TEXT = 'custom boom'; "
        "SET @after = 'resumed'; "
        "END"
    )
    eng.execute("CALL probe()")
    assert eng.execute(
        "SELECT @caught_state AS s"
    ).collect()[0].s == "45022"
    assert eng.execute(
        "SELECT @caught_msg AS m"
    ).collect()[0].m == "custom boom"
    assert eng.execute(
        "SELECT @after AS a"
    ).collect()[0].a == "resumed"


def test_inner_class_handler_beats_outer_exact_handler(eng):
    """MySQL handler selection resolves from the INNERMOST block out:
    an inner SQLEXCEPTION handler wins over an outer exact-SQLSTATE
    handler (advisor finding: exact-any-scope used to shadow it)."""
    eng.execute("CREATE TABLE hsc (who VARCHAR(8))")
    eng.execute(
        "CREATE PROCEDURE scoped() BEGIN "
        "DECLARE CONTINUE HANDLER FOR SQLSTATE '45000' "
        "  INSERT INTO hsc VALUES ('outer'); "
        "BEGIN "
        "  DECLARE CONTINUE HANDLER FOR SQLEXCEPTION "
        "    INSERT INTO hsc VALUES ('inner'); "
        "  SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'x'; "
        "END; "
        "END"
    )
    eng.execute("CALL scoped()")
    assert [r.who for r in eng.execute("SELECT * FROM hsc").collect()] \
        == ["inner"]
    # within ONE frame, exact SQLSTATE still beats the class handler
    eng.execute("DELETE FROM hsc")
    eng.execute(
        "CREATE PROCEDURE sameframe() BEGIN "
        "DECLARE CONTINUE HANDLER FOR SQLEXCEPTION "
        "  INSERT INTO hsc VALUES ('class'); "
        "DECLARE CONTINUE HANDLER FOR SQLSTATE '45000' "
        "  INSERT INTO hsc VALUES ('exact'); "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'y'; "
        "END"
    )
    eng.execute("CALL sameframe()")
    assert [r.who for r in eng.execute("SELECT * FROM hsc").collect()] \
        == ["exact"]


def test_condition_semantics_match_sql_not_python(eng):
    """Procedure IF conditions mixing string locals with numbers, or
    NULL under NOT, must take the SQL branch, not Python's ('5' = 5 is
    TRUE under SQL coercion; NOT (NULL = 1) is NULL → falsy)."""
    eng.execute(
        "CREATE PROCEDURE coerce(IN s VARCHAR(4)) BEGIN "
        "IF s = 5 THEN SET @branch = 'sql'; "
        "ELSE SET @branch = 'py'; END IF; "
        "END"
    )
    eng.execute("CALL coerce('5')")
    assert eng.execute("SELECT @branch AS b").collect()[0].b == "sql"
    eng.execute(
        "CREATE PROCEDURE nullnot() BEGIN "
        "IF NOT (NULL = 1) THEN SET @nb = 'true_branch'; "
        "ELSE SET @nb = 'else_branch'; END IF; "
        "END"
    )
    eng.execute("SET @nb = 'untouched'")
    eng.execute("CALL nullnot()")
    # SQL: NOT(NULL) is NULL → condition falsy → ELSE branch
    assert eng.execute("SELECT @nb AS b").collect()[0].b == "else_branch"


def test_handler_covers_nested_loop_statement(eng):
    """A handler declared at body level rescues a failure INSIDE a
    loop and the loop CONTINUES (MySQL scoping — the handler covers
    nested blocks; resume point = after the failed statement)."""
    eng.execute("CREATE TABLE hseq (n INT)")
    eng.execute(
        "CREATE PROCEDURE tolerant(IN k INT) BEGIN "
        "DECLARE i INT DEFAULT 0; "
        "DECLARE CONTINUE HANDLER FOR SQLEXCEPTION SET @err = 1; "
        "WHILE i < k DO "
        "  SET i = i + 1; "
        "  IF i = 2 THEN "
        "    INSERT INTO nope VALUES (1); "
        "  END IF; "
        "  INSERT INTO hseq VALUES (i); "
        "END WHILE; "
        "END"
    )
    eng.execute("SET @err = 0")
    eng.execute("CALL tolerant(4)")
    assert sorted(r.n for r in eng.execute("SELECT * FROM hseq").collect()) \
        == [1, 2, 3, 4]
    assert eng.execute("SELECT @err AS e").collect()[0].e == 1


def test_handler_for_mysql_errno(eng):
    """DECLARE ... HANDLER FOR <errno> maps the common MySQL error
    codes onto their SQLSTATEs — 1329 (no data) is the classic
    cursor-loop done-flag pattern in dump corpora."""
    eng.execute(
        "CREATE PROCEDURE sum_bal(OUT total INT) BEGIN "
        "DECLARE done INT DEFAULT 0; "
        "DECLARE b INT; "
        "DECLARE cur CURSOR FOR SELECT bal FROM acct ORDER BY id; "
        "DECLARE CONTINUE HANDLER FOR 1329 SET done = 1; "
        "SET total = 0; "
        "OPEN cur; "
        "read_loop: LOOP "
        "  FETCH cur INTO b; "
        "  IF done = 1 THEN LEAVE read_loop; END IF; "
        "  SET total = total + b; "
        "END LOOP; "
        "CLOSE cur; "
        "END"
    )
    eng.execute("CALL sum_bal(@t)")
    assert eng.execute("SELECT @t AS t").collect()[0].t == 150
    # 1644 catches user SIGNALs (ER_SIGNAL_EXCEPTION -> 45000)
    eng.execute(
        "CREATE PROCEDURE sig_catch() BEGIN "
        "DECLARE EXIT HANDLER FOR 1644 SET @sig = 'caught'; "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'x'; "
        "END"
    )
    eng.execute("CALL sig_catch()")
    assert eng.execute("SELECT @sig AS s").collect()[0].s == "caught"
    # unmapped codes keep the honest rejection
    with pytest.raises(NotImplementedError, match="unmapped MySQL"):
        eng.execute(
            "CREATE PROCEDURE nope() BEGIN "
            "DECLARE EXIT HANDLER FOR 9999 SET @x = 1; "
            "SELECT 1; END"
        )


def test_compound_handler_body(eng):
    """DECLARE … HANDLER FOR … BEGIN … END — the handler body is a
    block of statements with its own scope (MySQL 15.6.7.2; reference
    corpus main_test.go:1071 exercises compound handler bodies)."""
    eng.execute("CREATE TABLE errlog (src VARCHAR(30), n INT)")
    eng.execute(
        "CREATE PROCEDURE ch1() BEGIN "
        "DECLARE CONTINUE HANDLER FOR SQLEXCEPTION BEGIN "
        "  SET @msg = 'handled'; "
        "  INSERT INTO errlog VALUES ('ch1', 1); "
        "END; "
        "INSERT INTO missing_tbl VALUES (1); "
        "SET @after = 'yes'; "
        "END"
    )
    eng.execute("CALL ch1()")
    r = eng.execute(
        "SELECT @msg AS m, @after AS a").collect()[0]
    assert (r.m, r.a) == ("handled", "yes")
    assert eng.execute(
        "SELECT COUNT(*) AS n FROM errlog").collect()[0].n == 1


def test_compound_exit_handler_with_control_flow(eng):
    """EXIT handler block may use IF / GET DIAGNOSTICS / RESIGNAL;
    EXIT unwinds the declaring block after the body runs."""
    from myduckserver_spark.engine import SignalError

    eng.execute(
        "CREATE PROCEDURE ch2(IN relabel INT) BEGIN "
        "DECLARE EXIT HANDLER FOR SQLEXCEPTION BEGIN "
        "  GET DIAGNOSTICS CONDITION 1 @st = RETURNED_SQLSTATE; "
        "  IF relabel = 1 THEN "
        "    RESIGNAL SQLSTATE '45009' SET MESSAGE_TEXT = 'relabeled'; "
        "  END IF; "
        "  SET @quiet = 'swallowed'; "
        "END; "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'boom'; "
        "SET @unreached = 1; "
        "END"
    )
    # relabel path: RESIGNAL inside the block re-raises re-labeled
    with pytest.raises(SignalError, match="relabeled") as ei:
        eng.execute("CALL ch2(1)")
    assert ei.value.sqlstate == "45009"
    assert eng.execute("SELECT @st AS s").collect()[0].s == "45000"
    # quiet path: the block completes, EXIT unwinds, CALL succeeds
    eng.execute("CALL ch2(0)")
    r = eng.execute(
        "SELECT @quiet AS q, @unreached AS u").collect()[0]
    assert (r.q, r.u) == ("swallowed", None)


def test_resignal_outside_handler_errors(eng):
    from myduckserver_spark.engine import SignalError

    eng.execute(
        "CREATE PROCEDURE bad_rs() BEGIN RESIGNAL; END")
    with pytest.raises(SignalError, match="handler not active") as ei:
        eng.execute("CALL bad_rs()")
    assert ei.value.sqlstate == "0K000"


def test_select_into_locals_and_out_params(spark, tmp_path):
    """SELECT ... INTO <local/OUT param>: the names are assignment
    targets, bound from the single result row — MySQL 1172 on more
    than one row, the NOT FOUND condition (02000) on zero rows; mixed
    lists with @user variables work; pure @-lists keep their path."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
    e.execute("CREATE PROCEDURE po(OUT r INT) "
              "BEGIN SELECT MAX(v) INTO r FROM t; END")
    e.execute("CALL po(@m)")
    assert e.execute("SELECT @m AS m").collect()[0].m == 20
    e.execute(
        "CREATE PROCEDURE pm(IN lo INT, OUT s INT, OUT c INT) BEGIN "
        "DECLARE tot INT; "
        "SELECT SUM(v), COUNT(*) INTO tot, c FROM t WHERE v > lo; "
        "SET s = tot * 2; END"
    )
    e.execute("CALL pm(5, @s, @c)")
    r = e.execute("SELECT @s AS s, @c AS c").collect()[0]
    assert (r.s, r.c) == (60, 2)
    # zero rows fires NOT FOUND handlers
    e.execute(
        "CREATE PROCEDURE pz(OUT r INT) BEGIN "
        "DECLARE CONTINUE HANDLER FOR NOT FOUND SET r = -7; "
        "SELECT v INTO r FROM t WHERE id = 999; END"
    )
    e.execute("CALL pz(@z)")
    assert e.execute("SELECT @z AS z").collect()[0].z == -7
    # more than one row errors (MySQL 1172)
    e.execute("CREATE PROCEDURE pe(OUT r INT) "
              "BEGIN SELECT v INTO r FROM t; END")
    with pytest.raises(Exception, match="more than one row"):
        e.execute("CALL pe(@y)")
    # pure user-variable INTO keeps the SelectIntoVars path
    e.execute("CREATE PROCEDURE pu() "
              "BEGIN SELECT MIN(v) INTO @mn FROM t; END")
    e.execute("CALL pu()")
    assert e.execute("SELECT @mn AS mn").collect()[0].mn == 10
    # ALTER PROCEDURE/FUNCTION characteristics: accepted no-ops
    e.execute("ALTER PROCEDURE po COMMENT 'x' SQL SECURITY INVOKER")


def test_signal_set_list_and_compound_functions(spark, tmp_path):
    """SIGNAL with a full SET list (MESSAGE_TEXT + MYSQL_ERRNO, any
    order) in bodies AND standalone; stored FUNCTIONs with compound
    BEGIN...END bodies run through the procedure interpreter and
    constant-argument calls fold driver-side; per-row (column
    argument) calls reject toward macros (probe battery round 9)."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, b INT)")
    e.execute("INSERT INTO t VALUES (1, 10)")
    e.execute("CREATE PROCEDURE p_sig() BEGIN SIGNAL SQLSTATE '45000' "
              "SET MESSAGE_TEXT = 'custom error', MYSQL_ERRNO = 1644; "
              "END")
    with pytest.raises(Exception, match="custom error"):
        e.execute("CALL p_sig()")
    with pytest.raises(Exception, match="top level"):
        e.execute("SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = "
                  "'top level'")
    e.execute("CREATE FUNCTION f_fact(n INT) RETURNS INT DETERMINISTIC "
              "BEGIN DECLARE r INT DEFAULT 1; WHILE n > 1 DO "
              "SET r = r * n; SET n = n - 1; END WHILE; RETURN r; END")
    row = e.execute("SELECT f_fact(5) AS f, f_fact(3) + 1 AS g"
                    ).collect()[0]
    assert (row.f, row.g) == (120, 7)
    assert e.execute("SELECT a FROM t WHERE b < f_fact(4)"
                     ).collect()[0].a == 1
    with pytest.raises(NotImplementedError, match="macro"):
        e.execute("SELECT f_fact(b) FROM t")
    # ended-without-RETURN: MySQL 1321
    e.execute("CREATE FUNCTION f_bad(n INT) RETURNS INT DETERMINISTIC "
              "BEGIN SET n = n + 1; END")
    with pytest.raises(ValueError, match="1321"):
        e.execute("SELECT f_bad(1)")
    # function survives restart (persisted with its RETURNS type)
    e2 = Engine(spark, str(tmp_path / "wh"))
    assert e2.execute("SELECT f_fact(4) AS f").collect()[0].f == 24


def test_stored_function_name_inside_string_literal(spark, tmp_path):
    """A stored-function name appearing inside a string literal is
    text, not a call site — it must be neither executed nor spliced
    (round-10 ADVICE)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_fnlit"))
    e.execute("CREATE FUNCTION fln(x INT) RETURNS INT "
              "BEGIN DECLARE y INT; SET y = x * 2; RETURN y; END")
    assert e.execute("SELECT fln(21) AS v").collect()[0].v == 42
    rows = e.execute("SELECT 'call fln(9) later' AS s").collect()
    assert rows[0].s == "call fln(9) later"
    rows = e.execute("SELECT fln(3) AS v, 'fln(x)' AS s").collect()
    assert rows[0].v == 6 and rows[0].s == "fln(x)"
