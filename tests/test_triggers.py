"""MySQL triggers, executed SET-BASED (reference exercises triggers on
its MySQL surface, main_test.go:1053-1083; here FOR EACH ROW bodies run
as one vectorized pass over the affected row set — the Spark-native
realization, since a per-row loop would serialize large DML)."""

from __future__ import annotations

import pytest

from myduckserver_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE items (id INT PRIMARY KEY, name VARCHAR(40), "
              "qty INT, norm VARCHAR(40))")
    e.execute("CREATE TABLE audit (tbl VARCHAR(20), op VARCHAR(10), "
              "item_id INT, detail VARCHAR(60))")
    return e


def test_before_insert_set_new(eng):
    eng.execute(
        "CREATE TRIGGER norm_name BEFORE INSERT ON items "
        "FOR EACH ROW SET NEW.norm = LOWER(NEW.name), "
        "NEW.qty = COALESCE(NEW.qty, 0)"
    )
    eng.execute("INSERT INTO items (id, name, qty) VALUES "
                "(1, 'Widget', 5), (2, 'GADGET', NULL)")
    rows = {r.id: (r.norm, r.qty) for r in
            eng.execute("SELECT id, norm, qty FROM items").collect()}
    assert rows == {1: ("widget", 5), 2: ("gadget", 0)}


def test_after_insert_audit(eng):
    eng.execute(
        "CREATE TRIGGER ai AFTER INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'ins', NEW.id, NEW.name)"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    got = sorted((r.op, r.item_id, r.detail) for r in
                 eng.execute("SELECT * FROM audit").collect())
    assert got == [("ins", 1, "a"), ("ins", 2, "b")]


def test_after_update_old_and_new(eng):
    eng.execute(
        "CREATE TRIGGER au AFTER UPDATE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'upd', OLD.id, "
        "CONCAT(OLD.name, '->', NEW.name))"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    eng.execute("UPDATE items SET name = 'z' WHERE id = 2")
    got = [(r.op, r.item_id, r.detail) for r in
           eng.execute("SELECT * FROM audit").collect()]
    assert got == [("upd", 2, "b->z")]


def test_after_delete_old(eng):
    eng.execute(
        "CREATE TRIGGER ad AFTER DELETE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'del', OLD.id, OLD.name)"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    eng.execute("DELETE FROM items WHERE qty >= 2")
    got = [(r.op, r.item_id) for r in
           eng.execute("SELECT * FROM audit").collect()]
    assert got == [("del", 2)]
    assert eng.execute(
        "SELECT COUNT(*) AS n FROM items"
    ).collect()[0].n == 1


def test_begin_end_body_and_batch_statement(eng):
    eng.execute("CREATE TABLE counters (k VARCHAR(10), n INT)")
    eng.execute("INSERT INTO counters VALUES ('ins', 0)")
    # BEGIN...END with one NEW-referencing insert and one ADDITIVE
    # counter update (no NEW/OLD refs): MySQL runs it once per row;
    # the set-based rewrite multiplies the addend by the affected-row
    # count — exactly equivalent for additive updates
    eng.execute(
        "CREATE TRIGGER multi AFTER INSERT ON items FOR EACH ROW BEGIN "
        "INSERT INTO audit VALUES ('items', 'ins', NEW.id, NULL); "
        "UPDATE counters SET n = n + 1 WHERE k = 'ins'; END"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    assert eng.execute(
        "SELECT COUNT(*) AS n FROM audit"
    ).collect()[0].n == 2
    assert eng.execute(
        "SELECT n FROM counters WHERE k = 'ins'"
    ).collect()[0].n == 2  # once per affected ROW (MySQL semantics)


def test_batch_update_multi_assignment_runs_per_row(eng):
    """A multi-assignment SET list cannot enter the additive rewrite
    (each assignment sees the previous one's per-row result); under
    the per-row cap (round 8) it replays once per affected row —
    MySQL-exact, no warning."""
    eng.execute("CREATE TABLE counters (k VARCHAR(10), a INT, b INT)")
    eng.execute("INSERT INTO counters VALUES ('x', 0, 0)")
    eng.execute(
        "CREATE TRIGGER ma AFTER INSERT ON items FOR EACH ROW "
        "UPDATE counters SET a = a + 1, b = b + 2"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    notes = eng.execute("SHOW WARNINGS").collect()
    assert not any("batch semantics" in w.Message for w in notes)
    r = eng.execute("SELECT a, b FROM counters").collect()[0]
    assert (r.a, r.b) == (2, 4)  # once per ROW (MySQL)


def test_batch_update_qualified_self_ref_runs_per_row(eng):
    """`SET n = n + counters.n` reads the target column through a
    table qualifier — multiplying the addend by N is WRONG (MySQL's
    per-row result is n·2^N); the per-row replay (round 8) gets the
    sequential doubling exactly."""
    eng.execute("CREATE TABLE counters (k VARCHAR(10), n INT)")
    eng.execute("INSERT INTO counters VALUES ('x', 3)")
    eng.execute(
        "CREATE TRIGGER qs AFTER INSERT ON items FOR EACH ROW "
        "UPDATE counters SET n = n + counters.n"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    notes = eng.execute("SHOW WARNINGS").collect()
    assert not any("batch semantics" in w.Message for w in notes)
    # two sequential doublings: 3 -> 6 -> 12 (MySQL per-row), never
    # the wrong algebraic fold 3 + 3*2 = 9
    assert eng.execute(
        "SELECT n FROM counters"
    ).collect()[0].n == 12


def test_batch_update_multiplicative_exact(eng):
    """`SET c = c * k` run once per row ≡ `c * k^N` — the second
    algebraically-exact batch shape, recovered like the additive one."""
    eng.execute("CREATE TABLE counters (k VARCHAR(10), n INT)")
    eng.execute("INSERT INTO counters VALUES ('x', 3)")
    eng.execute(
        "CREATE TRIGGER mul AFTER INSERT ON items FOR EACH ROW "
        "UPDATE counters SET n = n * 2"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL), (3, 'c', 3, NULL)")
    assert eng.execute(
        "SELECT n FROM counters"
    ).collect()[0].n == 24  # 3 * 2^3
    # exact shapes leave NO batch-semantics note
    notes = eng.execute("SHOW WARNINGS").collect()
    assert not any("batch semantics" in w.Message for w in notes)


def test_batch_insert_body_runs_per_row(eng):
    """A NEW/OLD-free INSERT body runs once per affected row under
    the per-row cap (round 8) — MySQL-exact, no warning."""
    eng.execute(
        "CREATE TRIGGER bi AFTER INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'batch', 0, NULL)"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    notes = eng.execute("SHOW WARNINGS").collect()
    assert not any("batch semantics" in w.Message for w in notes)
    assert eng.execute(
        "SELECT COUNT(*) AS n FROM audit"
    ).collect()[0].n == 2  # once per ROW (MySQL)
    # and the diagnostics area resets at the next ordinary statement
    eng.execute("SELECT 1")


def test_batch_body_above_cap_keeps_batch_with_warning(eng, monkeypatch):
    """Above the per-row cap the body keeps once-per-statement batch
    semantics with a SHOW WARNINGS note (bounded driver work)."""
    from myduckserver_spark.engine import Engine

    monkeypatch.setattr(Engine, "_TRIGGER_PERROW_CAP", 1)
    eng.execute(
        "CREATE TRIGGER bi AFTER INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'batch', 0, NULL)"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    notes = eng.execute("SHOW WARNINGS").collect()
    assert any("batch semantics" in w.Message for w in notes)
    assert eng.execute(
        "SELECT COUNT(*) AS n FROM audit"
    ).collect()[0].n == 1  # once per STATEMENT (documented fallback)


def test_self_reading_subquery_body_per_row_exact(eng):
    """Verdict r7 #5 done-criterion: a self-reading non-algebraic
    body (`SET n = n + (SELECT …)` where the subquery reads the same
    table) matches MySQL's per-row sequential result for a multi-row
    batch."""
    eng.execute("CREATE TABLE counters (k VARCHAR(10), n INT)")
    eng.execute("INSERT INTO counters VALUES ('x', 1)")
    eng.execute(
        "CREATE TRIGGER sr AFTER INSERT ON items FOR EACH ROW "
        "UPDATE counters SET n = n + (SELECT MAX(n) FROM counters c)"
    )
    rows = ", ".join(f"({i}, 'r{i}', 1, NULL)" for i in range(1, 6))
    eng.execute(f"INSERT INTO items VALUES {rows}")
    # sequential doubling via the self-reading subquery: 1 -> 2 -> 4
    # -> 8 -> 16 -> 32 (5 affected rows)
    assert eng.execute(
        "SELECT n FROM counters"
    ).collect()[0].n == 32
    assert eng.execute("SHOW WARNINGS").collect() == []


def test_show_triggers_drop_and_persistence(eng, spark, tmp_path):
    eng.execute(
        "CREATE TRIGGER t1 AFTER INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'i', NEW.id, NULL)"
    )
    rows = eng.execute("SHOW TRIGGERS").collect()
    assert [(r.Trigger, r.Event, r.Timing) for r in rows] == \
        [("t1", "INSERT", "AFTER")]
    # persists across engine instances (same warehouse)
    e2 = Engine(spark, eng.catalog.root
                if hasattr(eng.catalog, "root") else eng._warehouse)
    assert [r.Trigger for r in e2.execute("SHOW TRIGGERS").collect()] \
        == ["t1"]
    eng.execute("DROP TRIGGER t1")
    assert eng.execute("SHOW TRIGGERS").collect() == []
    with pytest.raises(ValueError):
        eng.execute("DROP TRIGGER t1")
    eng.execute("DROP TRIGGER IF EXISTS t1")


def test_trigger_validation_rejections(eng):
    # BEFORE DELETE has no NEW row to SET (guards only, see
    # test_before_delete_signal_blocks)
    with pytest.raises(ValueError, match="no NEW row"):
        eng.execute("CREATE TRIGGER bad1 BEFORE DELETE ON items "
                    "FOR EACH ROW SET NEW.qty = 0")
    with pytest.raises(ValueError, match="no OLD row"):
        eng.execute("CREATE TRIGGER bad2 AFTER INSERT ON items "
                    "FOR EACH ROW INSERT INTO audit VALUES "
                    "('x', 'i', OLD.id, NULL)")
    with pytest.raises(ValueError, match="no NEW row"):
        eng.execute("CREATE TRIGGER bad3 AFTER DELETE ON items "
                    "FOR EACH ROW INSERT INTO audit VALUES "
                    "('x', 'd', NEW.id, NULL)")
    # round 8: NEW-referencing DML bodies beyond INSERT…VALUES are now
    # ACCEPTED (per-row replay); only non-DML NEW/OLD refs are rejected
    eng.execute("CREATE TRIGGER ok4 AFTER UPDATE ON items "
                "FOR EACH ROW DELETE FROM audit WHERE "
                "item_id = NEW.id")
    eng.execute("DROP TRIGGER ok4")
    with pytest.raises(NotImplementedError):
        eng.execute("CREATE TRIGGER bad4 AFTER UPDATE ON items "
                    "FOR EACH ROW CALL audit_proc(NEW.id)")


def test_drop_table_drops_triggers(eng):
    eng.execute(
        "CREATE TRIGGER tt AFTER INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'i', NEW.id, NULL)"
    )
    eng.execute("DROP TABLE items")
    assert eng.execute("SHOW TRIGGERS").collect() == []


def test_trigger_cascade(eng):
    # a trigger's INSERT fires the audit table's own trigger
    eng.execute("CREATE TABLE audit2 (item_id INT)")
    eng.execute(
        "CREATE TRIGGER c1 AFTER INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'i', NEW.id, NULL)"
    )
    eng.execute(
        "CREATE TRIGGER c2 AFTER INSERT ON audit FOR EACH ROW "
        "INSERT INTO audit2 VALUES (NEW.item_id)"
    )
    eng.execute("INSERT INTO items VALUES (9, 'x', 1, NULL)")
    assert [r.item_id for r in
            eng.execute("SELECT * FROM audit2").collect()] == [9]


def test_before_update_set_new(eng):
    eng.execute(
        "CREATE TRIGGER bu BEFORE UPDATE ON items FOR EACH ROW "
        "SET NEW.norm = LOWER(NEW.name), NEW.qty = OLD.qty + NEW.qty"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 10, 'a'), "
                "(2, 'b', 5, 'b')")
    eng.execute("UPDATE items SET name = 'ZED', qty = 7 WHERE id = 2")
    rows = {r.id: (r.name, r.qty, r.norm) for r in
            eng.execute("SELECT * FROM items").collect()}
    # NEW.qty in the trigger sees the statement's assignment (7),
    # OLD.qty the stored value (5); untouched row unchanged
    assert rows == {1: ("a", 10, "a"), 2: ("ZED", 12, "zed")}


def test_after_insert_sees_auto_increment_id(eng):
    """NEW.<auto_col> in an AFTER INSERT body resolves to the
    ASSIGNED id when the column was auto-filled (MySQL exposes the
    assigned value in NEW)."""
    eng.execute("CREATE TABLE seqd (id INT PRIMARY KEY AUTO_INCREMENT, "
                "name VARCHAR(20))")
    eng.execute(
        "CREATE TRIGGER ai_seq AFTER INSERT ON seqd FOR EACH ROW "
        "INSERT INTO audit VALUES ('seqd', 'ins', NEW.id, NEW.name)"
    )
    eng.execute("INSERT INTO seqd (name) VALUES ('a'), ('b')")
    got = sorted((r.item_id, r.detail) for r in
                 eng.execute("SELECT * FROM audit").collect())
    assert got == [(1, "a"), (2, "b")]
    # ids in the audit match the table's assigned ids
    tbl = sorted((r.id, r.name) for r in
                 eng.execute("SELECT id, name FROM seqd").collect())
    assert tbl == [(1, "a"), (2, "b")]


def test_before_insert_signal_rejects_batch(eng):
    """SIGNAL guard in a BEFORE INSERT body: one vectorized ANY over
    the incoming batch; any bad row rejects the WHOLE statement
    (MySQL's statement rollback on trigger error —
    reference corpus main_test.go:1053)."""
    from myduckserver_spark.engine import SignalError

    eng.execute(
        "CREATE TRIGGER no_neg BEFORE INSERT ON items FOR EACH ROW "
        "BEGIN "
        "IF NEW.qty < 0 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'negative qty'; "
        "END IF; "
        "END"
    )
    eng.execute("INSERT INTO items VALUES (1, 'ok', 5, NULL)")
    with pytest.raises(SignalError, match="negative qty") as ei:
        eng.execute("INSERT INTO items VALUES (2, 'fine', 1, NULL), "
                    "(3, 'bad', -4, NULL)")
    assert ei.value.sqlstate == "45000"
    # the good row of the failed batch was NOT inserted
    got = [r.id for r in eng.execute("SELECT id FROM items").collect()]
    assert got == [1]


def test_before_insert_set_then_signal_order(eng):
    """A body mixing SET NEW.* and a guard applies in order: the guard
    sees the assigned value."""
    eng.execute(
        "CREATE TRIGGER norm_guard BEFORE INSERT ON items FOR EACH ROW "
        "BEGIN "
        "SET NEW.qty = COALESCE(NEW.qty, 0); "
        "IF NEW.qty > 100 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'too many'; "
        "END IF; "
        "END"
    )
    # NULL qty is defaulted by the SET before the guard runs
    eng.execute("INSERT INTO items (id, name) VALUES (1, 'a')")
    assert eng.execute("SELECT qty FROM items").collect()[0].qty == 0
    from myduckserver_spark.engine import SignalError

    with pytest.raises(SignalError, match="too many"):
        eng.execute("INSERT INTO items VALUES (2, 'b', 500, NULL)")


def test_before_update_signal_new_and_old(eng):
    from myduckserver_spark.engine import SignalError

    eng.execute("INSERT INTO items VALUES (1, 'a', 10, NULL)")
    eng.execute(
        "CREATE TRIGGER no_shrink BEFORE UPDATE ON items FOR EACH ROW "
        "IF NEW.qty < OLD.qty THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'qty may not shrink'; "
        "END IF"
    )
    eng.execute("UPDATE items SET qty = 15 WHERE id = 1")
    assert eng.execute("SELECT qty FROM items").collect()[0].qty == 15
    with pytest.raises(SignalError, match="may not shrink"):
        eng.execute("UPDATE items SET qty = 3 WHERE id = 1")
    assert eng.execute("SELECT qty FROM items").collect()[0].qty == 15


def test_before_update_guard_sees_statement_order(eng):
    """A guard must read NEW.x as assigned UP TO its position in the
    body — a later `SET NEW.x = 0` must not retroactively silence it
    (advisor finding: the guard saw the FINAL assignment map, letting
    `UPDATE ... SET x=100` bypass an early validation)."""
    from myduckserver_spark.engine import SignalError

    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL)")
    eng.execute(
        "CREATE TRIGGER cap_qty BEFORE UPDATE ON items FOR EACH ROW BEGIN "
        "IF NEW.qty > 5 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'too big'; END IF; "
        "SET NEW.qty = 0; END"
    )
    with pytest.raises(SignalError, match="too big"):
        eng.execute("UPDATE items SET qty = 100 WHERE id = 1")
    assert eng.execute("SELECT qty FROM items").collect()[0].qty == 1
    # converse order: the SET runs first, so the guard sees 0 — passes
    eng.execute("DROP TRIGGER cap_qty")
    eng.execute(
        "CREATE TRIGGER cap_qty2 BEFORE UPDATE ON items FOR EACH ROW BEGIN "
        "SET NEW.qty = 0; "
        "IF NEW.qty > 5 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'too big'; END IF; END"
    )
    eng.execute("UPDATE items SET qty = 100 WHERE id = 1")
    assert eng.execute("SELECT qty FROM items").collect()[0].qty == 0


def test_before_delete_signal_blocks(eng):
    """BEFORE DELETE SIGNAL guard blocks the delete — the round-5
    rejection is lifted (MySQL's validation pattern now supported)."""
    from myduckserver_spark.engine import SignalError

    eng.execute("INSERT INTO items VALUES (1, 'keep', 5, NULL), "
                "(2, 'temp', 0, NULL)")
    eng.execute(
        "CREATE TRIGGER keep_stock BEFORE DELETE ON items FOR EACH ROW "
        "IF OLD.qty > 0 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'still stocked'; "
        "END IF"
    )
    # deleting the zero-qty row passes the guard
    eng.execute("DELETE FROM items WHERE id = 2")
    with pytest.raises(SignalError, match="still stocked"):
        eng.execute("DELETE FROM items WHERE id = 1")
    got = [r.id for r in eng.execute("SELECT id FROM items").collect()]
    assert got == [1]


def test_unconditional_signal_trigger(eng):
    """A bare SIGNAL body makes the table effectively immutable for
    that event."""
    from myduckserver_spark.engine import SignalError

    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL)")
    eng.execute(
        "CREATE TRIGGER frozen BEFORE DELETE ON items FOR EACH ROW "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'table is frozen'"
    )
    with pytest.raises(SignalError, match="frozen"):
        eng.execute("DELETE FROM items WHERE id = 1")
    # a delete that matches no rows raises nothing (no affected row)
    eng.execute("DELETE FROM items WHERE id = 99")


def test_multi_table_update_fires_triggers(eng):
    """UPDATE t1 JOIN t2 SET … fires t1's BEFORE and AFTER UPDATE
    triggers with MySQL row images (reference executes triggers under
    multi-table DML via GMS, main_test.go:1053) — replaces the round-6
    honest rejection."""
    eng.execute("CREATE TABLE side (id INT PRIMARY KEY, v INT)")
    eng.execute("INSERT INTO side VALUES (1, 10), (2, 20)")
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL), (3, 'c', 3, NULL)")
    eng.execute(
        "CREATE TRIGGER bu_norm BEFORE UPDATE ON items FOR EACH ROW "
        "SET NEW.norm = CONCAT('q', NEW.qty)"
    )
    eng.execute(
        "CREATE TRIGGER au_log AFTER UPDATE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'upd', OLD.id, "
        "CONCAT(OLD.qty, '->', NEW.qty))"
    )
    eng.execute(
        "UPDATE items JOIN side ON items.id = side.id "
        "SET items.qty = side.v"
    )
    rows = {r.id: (r.qty, r.norm) for r in
            eng.execute("SELECT id, qty, norm FROM items").collect()}
    # BEFORE trigger folded over the JOINED post-image (NEW.qty = side.v)
    assert rows == {1: (10, "q10"), 2: (20, "q20"), 3: (3, None)}
    got = sorted((r.item_id, r.detail) for r in
                 eng.execute("SELECT * FROM audit").collect())
    assert got == [(1, "1->10"), (2, "2->20")]


def test_multi_table_update_before_guard_blocks(eng):
    """A BEFORE UPDATE SIGNAL guard on the target blocks the whole
    multi-table statement before any write."""
    from myduckserver_spark.engine import SignalError

    eng.execute("CREATE TABLE side (id INT PRIMARY KEY, v INT)")
    eng.execute("INSERT INTO side VALUES (1, 999)")
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL)")
    eng.execute(
        "CREATE TRIGGER bu_cap BEFORE UPDATE ON items FOR EACH ROW "
        "IF NEW.qty > 100 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'qty cap'; END IF"
    )
    with pytest.raises(SignalError, match="qty cap"):
        eng.execute("UPDATE items JOIN side ON items.id = side.id "
                    "SET items.qty = side.v")
    assert eng.execute("SELECT qty FROM items").collect()[0].qty == 1


def test_multi_table_delete_fires_triggers(eng):
    """DELETE t1 FROM t1 JOIN t2 fires t1's AFTER DELETE triggers with
    OLD images, and BEFORE DELETE guards block pre-write."""
    from myduckserver_spark.engine import SignalError

    eng.execute("CREATE TABLE side (id INT PRIMARY KEY, v INT)")
    eng.execute("INSERT INTO side VALUES (2, 0), (3, 0)")
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL), (3, 'c', 3, NULL)")
    eng.execute(
        "CREATE TRIGGER ad_log AFTER DELETE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'del', OLD.id, OLD.name)"
    )
    eng.execute("DELETE items FROM items JOIN side ON items.id = side.id")
    assert sorted((r.item_id, r.detail) for r in
                  eng.execute("SELECT * FROM audit").collect()) \
        == [(2, "b"), (3, "c")]
    assert [r.id for r in eng.execute("SELECT id FROM items").collect()] \
        == [1]
    # BEFORE DELETE guard: re-insert and protect row 1
    eng.execute("INSERT INTO side VALUES (1, 0)")
    eng.execute(
        "CREATE TRIGGER bd_guard BEFORE DELETE ON items FOR EACH ROW "
        "IF OLD.id = 1 THEN "
        "SIGNAL SQLSTATE '45000' SET MESSAGE_TEXT = 'protected'; END IF"
    )
    with pytest.raises(SignalError, match="protected"):
        eng.execute("DELETE items FROM items JOIN side "
                    "ON items.id = side.id")
    assert [r.id for r in eng.execute("SELECT id FROM items").collect()] \
        == [1]


def test_before_trigger_full_bodies_side_dml(eng):
    """BEFORE triggers accept full bodies (round 8): side DML like
    audit INSERTs runs set-based over the row image alongside SET /
    SIGNAL-guard ops (reference fires these via GMS,
    main_test.go:1053)."""
    eng.execute(
        "CREATE TRIGGER bi BEFORE INSERT ON items FOR EACH ROW BEGIN "
        "SET NEW.norm = LOWER(NEW.name); "
        "INSERT INTO audit VALUES ('items', 'pre-ins', NEW.id, NEW.norm); "
        "END"
    )
    eng.execute("INSERT INTO items (id, name) VALUES (1, 'Foo'), (2, 'BAR')")
    got = sorted((r.op, r.item_id, r.detail) for r in
                 eng.execute("SELECT * FROM audit").collect())
    # the audit sees the folded NEW image (norm already lowered)
    assert got == [("pre-ins", 1, "foo"), ("pre-ins", 2, "bar")]

    eng.execute(
        "CREATE TRIGGER bu BEFORE UPDATE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'pre-upd', OLD.id, "
        "CONCAT(OLD.name, '->', NEW.name))"
    )
    eng.execute("UPDATE items SET name = 'baz' WHERE id = 2")
    assert ("pre-upd", 2, "BAR->baz") in {
        (r.op, r.item_id, r.detail)
        for r in eng.execute("SELECT * FROM audit").collect()
    }

    eng.execute(
        "CREATE TRIGGER bd BEFORE DELETE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'pre-del', OLD.id, OLD.name)"
    )
    eng.execute("DELETE FROM items WHERE id = 1")
    assert ("pre-del", 1, "Foo") in {
        (r.op, r.item_id, r.detail)
        for r in eng.execute("SELECT * FROM audit").collect()
    }


def test_before_trigger_side_dml_statement_atomic(eng):
    """A failing gate (CHECK / duplicate key) must leave NO side
    effect from a BEFORE trigger body — MySQL statement atomicity."""
    from myduckserver_spark.engine import DuplicateKeyError

    eng.execute(
        "CREATE TRIGGER bi BEFORE INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'pre-ins', NEW.id, NEW.name)"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL)")
    with pytest.raises(DuplicateKeyError):
        eng.execute("INSERT INTO items VALUES (1, 'dup', 2, NULL)")
    got = [(r.op, r.item_id) for r in
           eng.execute("SELECT * FROM audit").collect()]
    assert got == [("pre-ins", 1)]  # nothing from the failed statement


def test_multi_table_update_before_trigger_full_body(eng):
    """Verdict r7 #4: multi-table UPDATE fires BEFORE UPDATE triggers
    whose bodies go beyond SET/guard — here an audit INSERT over the
    joined old/new image."""
    eng.execute("CREATE TABLE refs (id INT PRIMARY KEY, k INT)")
    eng.execute("INSERT INTO refs VALUES (1, 100), (2, 200)")
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL), (3, 'c', 3, NULL)")
    eng.execute(
        "CREATE TRIGGER bu BEFORE UPDATE ON items FOR EACH ROW BEGIN "
        "SET NEW.norm = 'touched'; "
        "INSERT INTO audit VALUES ('items', 'mt-upd', OLD.id, "
        "CONCAT(OLD.qty, '->', NEW.qty)); "
        "END"
    )
    eng.execute(
        "UPDATE items JOIN refs ON items.id = refs.id "
        "SET items.qty = refs.k"
    )
    rows = {r.id: (r.qty, r.norm) for r in
            eng.execute("SELECT id, qty, norm FROM items").collect()}
    assert rows == {1: (100, "touched"), 2: (200, "touched"),
                    3: (3, None)}
    got = sorted((r.op, r.item_id, r.detail) for r in
                 eng.execute("SELECT * FROM audit").collect())
    assert got == [("mt-upd", 1, "1->100"), ("mt-upd", 2, "2->200")]


def test_multi_table_delete_before_trigger_side_dml(eng):
    eng.execute("CREATE TABLE refs (id INT PRIMARY KEY, k INT)")
    eng.execute("INSERT INTO refs VALUES (2, 0)")
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL), "
                "(2, 'b', 2, NULL)")
    eng.execute(
        "CREATE TRIGGER bd BEFORE DELETE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'mt-del', OLD.id, OLD.name)"
    )
    eng.execute("DELETE items FROM items JOIN refs ON items.id = refs.id")
    assert [r.id for r in eng.execute(
        "SELECT id FROM items").collect()] == [1]
    got = [(r.op, r.item_id, r.detail) for r in
           eng.execute("SELECT * FROM audit").collect()]
    assert got == [("mt-del", 2, "b")]


def test_trigger_body_rejects_own_table_dml(eng):
    """MySQL 1442: a trigger body may not modify the table the
    trigger is attached to."""
    with pytest.raises(ValueError, match="1442"):
        eng.execute(
            "CREATE TRIGGER bad BEFORE INSERT ON items FOR EACH ROW "
            "DELETE FROM items WHERE qty < 0"
        )
    with pytest.raises(ValueError, match="1442"):
        eng.execute(
            "CREATE TRIGGER bad2 AFTER UPDATE ON items FOR EACH ROW "
            "UPDATE items SET qty = 0"
        )


def test_new_referencing_update_body_per_row(eng):
    """Trigger body DML that READS the row image beyond INSERT…VALUES
    (round 8): `UPDATE counters SET n = n + NEW.qty WHERE k = NEW.name`
    — the classic aggregate-maintenance shape — replays once per
    affected row with the image values bound as literals."""
    eng.execute("CREATE TABLE counters (k VARCHAR(40) PRIMARY KEY, n INT)")
    eng.execute("INSERT INTO counters VALUES ('a', 0), ('b', 100)")
    eng.execute(
        "CREATE TRIGGER agg AFTER INSERT ON items FOR EACH ROW "
        "UPDATE counters SET n = n + NEW.qty WHERE k = NEW.name"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 5, NULL), "
                "(2, 'b', 7, NULL), (3, 'a', 3, NULL), "
                "(4, 'zz', 9, NULL)")  # 'zz' matches no counter row
    rows = {r.k: r.n for r in
            eng.execute("SELECT * FROM counters").collect()}
    assert rows == {"a": 8, "b": 107}

    # OLD-referencing keyed DELETE on the delete path
    eng.execute(
        "CREATE TRIGGER cleanup AFTER DELETE ON items FOR EACH ROW "
        "DELETE FROM counters WHERE k = OLD.name"
    )
    eng.execute("DELETE FROM items WHERE name = 'b'")
    assert sorted(r.k for r in
                  eng.execute("SELECT k FROM counters").collect()) == ["a"]


def test_new_referencing_body_above_cap_raises(eng, monkeypatch):
    from myduckserver_spark.engine import Engine

    monkeypatch.setattr(Engine, "_TRIGGER_PERROW_CAP", 1)
    eng.execute("CREATE TABLE counters (k VARCHAR(40) PRIMARY KEY, n INT)")
    eng.execute("INSERT INTO counters VALUES ('a', 0)")
    eng.execute(
        "CREATE TRIGGER agg AFTER INSERT ON items FOR EACH ROW "
        "UPDATE counters SET n = n + NEW.qty WHERE k = NEW.name"
    )
    with pytest.raises(NotImplementedError, match="per-row replay"):
        eng.execute("INSERT INTO items VALUES (1, 'a', 5, NULL), "
                    "(2, 'a', 7, NULL)")


def test_on_duplicate_fires_insert_and_update_arms(eng):
    """Under INSERT … ON DUPLICATE KEY UPDATE, AFTER INSERT fires only
    for rows that actually inserted and AFTER UPDATE fires for the
    duplicate arm with its own old/new pair (MySQL event model)."""
    eng.execute(
        "CREATE TRIGGER ai AFTER INSERT ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'ins', NEW.id, NEW.name)"
    )
    eng.execute(
        "CREATE TRIGGER au AFTER UPDATE ON items FOR EACH ROW "
        "INSERT INTO audit VALUES ('items', 'upd', OLD.id, "
        "CONCAT(OLD.name, '->', NEW.name))"
    )
    eng.execute("INSERT INTO items VALUES (1, 'a', 1, NULL)")
    eng.execute("DELETE FROM audit")
    # one duplicate (update arm), one fresh row (insert arm)
    eng.execute(
        "INSERT INTO items (id, name) VALUES (1, 'z'), (2, 'b') "
        "ON DUPLICATE KEY UPDATE name = VALUES(name)"
    )
    got = sorted((r.op, r.item_id, r.detail) for r in
                 eng.execute("SELECT * FROM audit").collect())
    assert got == [("ins", 2, "b"), ("upd", 1, "a->z")]
    # sequential tier (intra-batch duplicate): insert arm fires with
    # the ORIGINAL inserted values; each duplicate occurrence fires
    # the update arm once
    eng.execute("DELETE FROM audit")
    eng.execute(
        "INSERT INTO items (id, name) VALUES (7, 'p'), (7, 'q') "
        "ON DUPLICATE KEY UPDATE name = VALUES(name)"
    )
    got = sorted((r.op, r.item_id, r.detail) for r in
                 eng.execute("SELECT * FROM audit").collect())
    assert got == [("ins", 7, "p"), ("upd", 7, "p->q")]


def test_trigger_body_rejects_ddl_and_txn_control(spark, tmp_path):
    """DDL and transaction control imply a commit and are forbidden in
    trigger bodies (MySQL 1422, reference main_test.go's
    CREATE-TABLE-in-trigger error cases); EVENTs may run DDL."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    e.execute("CREATE TABLE aud (id INT)")
    for body in (
        "BEGIN CREATE TABLE bar AS SELECT 1; END",
        "BEGIN DROP TABLE aud; END",
        "BEGIN COMMIT; END",
        "BEGIN TRUNCATE aud; END",
    ):
        with pytest.raises(ValueError, match="1422"):
            e.execute(f"CREATE TRIGGER bad AFTER INSERT ON t "
                      f"FOR EACH ROW {body}")
    # plain audit DML is fine; events MAY run DDL
    e.execute("CREATE TRIGGER ok1 AFTER INSERT ON t FOR EACH ROW "
              "INSERT INTO aud VALUES (NEW.id)")
    e.execute("CREATE EVENT ev ON SCHEDULE EVERY 1 YEAR "
              "DO CREATE VIEW evv AS SELECT 1")
    e.execute("INSERT INTO t VALUES (1, 1)")
    assert e.execute("SELECT * FROM aud").collect()[0].id == 1
