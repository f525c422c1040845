"""Delta-style change data feed over the versioned catalog:
engine.table_changes / SELECT * FROM TABLE_CHANGES('t', v1[, v2]) —
the batch analog of the CDC stream the reference tails from binlog."""

import pytest

from myduckserver_spark.engine import Engine


@pytest.fixture()
def ceng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE kv (k INT PRIMARY KEY, v VARCHAR(10))")
    e.execute("INSERT INTO kv VALUES (1, 'a'), (2, 'b'), (3, 'c')")  # v1
    e.execute("UPDATE kv SET v = 'B' WHERE k = 2")                   # v2
    e.execute("DELETE FROM kv WHERE k = 3")                          # v3
    e.execute("INSERT INTO kv VALUES (4, 'd')")                      # v4
    return e


def test_full_span_diff(ceng):
    ch = {
        (r.k, r._change_type): r.v
        for r in ceng.table_changes("kv", 1).collect()
    }
    assert ch == {
        (2, "update_preimage"): "b",
        (2, "update_postimage"): "B",
        (3, "delete"): "c",
        (4, "insert"): "d",
    }


def test_single_step_diff(ceng):
    ch = [
        (r.k, r._change_type)
        for r in ceng.table_changes("kv", 2, 3).collect()
    ]
    assert ch == [(3, "delete")]


def test_sql_front_door(ceng):
    rows = ceng.execute(
        "SELECT k, _change_type FROM TABLE_CHANGES('kv', 3, 4) ORDER BY k"
    ).collect()
    assert [(r.k, r._change_type) for r in rows] == [(4, "insert")]


def test_no_changes_is_empty(ceng):
    assert ceng.table_changes("kv", 4, 4).count() == 0


def test_composite_pk_diff(spark, tmp_path):
    """TABLE_CHANGES keys the full-outer diff on every PK column for
    composite-PK tables; RETURNING rides the same diff."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE ckv (a INT, b INT, v TEXT, "
              "PRIMARY KEY (a, b))")
    e.execute("INSERT INTO ckv VALUES (1,1,'x'), (1,2,'y'), (2,1,'z')")
    v1 = e.catalog.table("ckv").version
    e.execute("UPDATE ckv SET v = 'Y' WHERE a = 1 AND b = 2")
    e.execute("DELETE FROM ckv WHERE a = 2")
    e.execute("INSERT INTO ckv VALUES (3, 3, 'w')")
    ch = {
        (r.a, r.b, r._change_type): r.v
        for r in e.table_changes("ckv", v1).collect()
    }
    assert ch == {
        (1, 2, "update_preimage"): "y",
        (1, 2, "update_postimage"): "Y",
        (2, 1, "delete"): "z",
        (3, 3, "insert"): "w",
    }
    # RETURNING on a composite-PK table uses the same diff
    rows = e.execute(
        "DELETE FROM ckv WHERE a = 3 RETURNING a, b, v"
    ).collect()
    assert [(r.a, r.b, r.v) for r in rows] == [(3, 3, "w")]
