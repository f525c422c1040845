"""MERGE INTO statement (SQL:2003 / Postgres 15 / DuckDB 1.4 surface).

The reference reaches the same semantics through REPLACE / ON
DUPLICATE KEY (backend/loaddata.go:131-143) and the CDC upsert path
(delta/controller.go); here MERGE is first-class: one join pass
classifies each target row, a NOT EXISTS pass selects inserts, and
the snapshot store is rewritten once — the same physical shape Delta
Lake's MERGE uses, which is the scale-correct strategy (shuffle on
the ON keys, single rewrite pass).
"""

import pytest

from myduckserver_spark.engine import Engine, OkResult
from myduckserver_spark.statements import parse_merge, parse_statement, MergeStmt


# ------------------------------------------------------------------ parser


def test_parse_merge_basic():
    s = parse_statement(
        "MERGE INTO tgt t USING src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)"
    )
    assert isinstance(s, MergeStmt)
    assert s.target == "tgt" and s.target_alias == "t"
    assert s.source_text == "src" and s.source_alias == "s"
    assert s.on == "t.id = s.id"
    assert [w.kind for w in s.whens] == ["matched", "not_matched"]
    assert s.whens[0].assignments == {"v": "s.v"}
    assert s.whens[1].insert_cols == ["id", "v"]
    assert s.whens[1].insert_vals == ["s.id", "s.v"]


def test_parse_merge_subquery_source_and_conds():
    s = parse_merge(
        "MERGE INTO tgt USING (SELECT id, v FROM src WHERE v > 0) AS s "
        "ON tgt.id = s.id "
        "WHEN MATCHED AND s.v > 100 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = tgt.v + s.v "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT VALUES (s.id, s.v)"
    )
    assert s.target_alias == "tgt"  # defaults to table name
    assert s.source_text.startswith("(SELECT")
    kinds = [(w.kind, w.action) for w in s.whens]
    assert kinds == [
        ("matched", "delete"),
        ("matched", "update"),
        ("not_matched_by_source", "delete"),
        ("not_matched", "insert"),
    ]
    assert s.whens[0].cond == "s.v > 100"
    assert s.whens[3].insert_cols is None  # positional


def test_parse_merge_keyword_in_string_literal():
    # ON / WHEN / THEN inside string literals must not confuse the parser
    s = parse_merge(
        "MERGE INTO tgt USING src ON tgt.id = src.id AND src.tag <> "
        "' ON WHEN THEN MATCHED ' "
        "WHEN MATCHED THEN UPDATE SET v = ' THEN WHEN '"
    )
    assert "' ON WHEN THEN MATCHED '" in s.on
    assert s.whens[0].assignments == {"v": "' THEN WHEN '"}


def test_parse_merge_rejects_invalid_combinations():
    with pytest.raises(ValueError):
        parse_merge("MERGE INTO t USING s ON t.id = s.id "
                    "WHEN NOT MATCHED THEN UPDATE SET v = 1")
    with pytest.raises(ValueError):
        parse_merge("MERGE INTO t USING s ON t.id = s.id "
                    "WHEN MATCHED THEN INSERT (id) VALUES (1)")
    with pytest.raises(ValueError):
        parse_merge("MERGE INTO t USING (SELECT 1) ON t.id = 1 "
                    "WHEN MATCHED THEN DELETE")  # subquery needs alias


# ------------------------------------------------------------------ engine


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE accounts (id INT PRIMARY KEY, name VARCHAR(40), bal DOUBLE)")
    e.execute(
        "INSERT INTO accounts VALUES (1, 'ann', 100.0), (2, 'bob', 50.0), "
        "(3, 'cyd', 0.0)"
    )
    e.execute("CREATE TABLE feed (id INT, name VARCHAR(40), amount DOUBLE)")
    e.execute(
        "INSERT INTO feed VALUES (2, 'bob', 25.0), (3, 'cyd', -10.0), "
        "(4, 'dee', 75.0)"
    )
    return e


def _rows(engine, sql="SELECT * FROM accounts ORDER BY id"):
    return [tuple(r) for r in engine.execute(sql).collect()]


def test_merge_update_insert(engine):
    r = engine.execute(
        "MERGE INTO accounts a USING feed f ON a.id = f.id "
        "WHEN MATCHED THEN UPDATE SET bal = a.bal + f.amount "
        "WHEN NOT MATCHED THEN INSERT (id, name, bal) "
        "VALUES (f.id, f.name, f.amount)"
    )
    assert isinstance(r, OkResult) and r.affected_rows == 3
    assert _rows(engine) == [
        (1, "ann", 100.0),
        (2, "bob", 75.0),
        (3, "cyd", -10.0),
        (4, "dee", 75.0),
    ]


def test_merge_conditional_delete_first_match_wins(engine):
    engine.execute(
        "MERGE INTO accounts a USING feed f ON a.id = f.id "
        "WHEN MATCHED AND f.amount < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET bal = a.bal + f.amount"
    )
    # id=3 hit the DELETE (amount -10); id=2 the UPDATE; id=1 untouched
    assert _rows(engine) == [(1, "ann", 100.0), (2, "bob", 75.0)]


def test_merge_not_matched_by_source(engine):
    engine.execute(
        "MERGE INTO accounts a USING feed f ON a.id = f.id "
        "WHEN MATCHED THEN UPDATE SET bal = f.amount "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    # id=1 has no feed row -> deleted; 2,3 updated to feed amounts
    assert _rows(engine) == [(2, "bob", 25.0), (3, "cyd", -10.0)]


def test_merge_subquery_source_and_insert_condition(engine):
    engine.execute(
        "MERGE INTO accounts a "
        "USING (SELECT id, name, amount FROM feed WHERE amount > 0) AS f "
        "ON a.id = f.id "
        "WHEN MATCHED THEN UPDATE SET bal = a.bal + f.amount "
        "WHEN NOT MATCHED AND f.amount >= 50 THEN "
        "INSERT (id, name, bal) VALUES (f.id, f.name, f.amount)"
    )
    # feed row 3 filtered out by the subquery; 4 inserted (75 >= 50)
    assert _rows(engine) == [
        (1, "ann", 100.0),
        (2, "bob", 75.0),
        (3, "cyd", 0.0),
        (4, "dee", 75.0),
    ]


def test_merge_duplicate_source_match_raises(engine):
    engine.execute("INSERT INTO feed VALUES (2, 'bob2', 1.0)")
    with pytest.raises(Exception, match="second time"):
        engine.execute(
            "MERGE INTO accounts a USING feed f ON a.id = f.id "
            "WHEN MATCHED THEN UPDATE SET bal = f.amount"
        )


def test_merge_insert_only_no_dup_error(engine):
    # INSERT-only MERGE: duplicate matches are irrelevant (no matched clause)
    r = engine.execute(
        "MERGE INTO accounts a USING feed f ON a.id = f.id "
        "WHEN NOT MATCHED THEN INSERT (id, name, bal) VALUES (f.id, f.name, f.amount)"
    )
    assert r.affected_rows == 1  # only id=4
    assert len(_rows(engine)) == 4


def test_merge_update_star_by_name(engine):
    engine.execute("CREATE TABLE acct2 (id INT, name VARCHAR(40), bal DOUBLE)")
    engine.execute("INSERT INTO acct2 VALUES (1, 'x', 0.0)")
    engine.execute("CREATE TABLE feed2 (id INT, name VARCHAR(40), bal DOUBLE)")
    engine.execute("INSERT INTO feed2 VALUES (1, 'y', 9.0), (5, 'z', 5.0)")
    engine.execute(
        "MERGE INTO acct2 t USING feed2 s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert _rows(engine, "SELECT * FROM acct2 ORDER BY id") == [
        (1, "y", 9.0),
        (5, "z", 5.0),
    ]


def test_merge_in_transaction_rollback(engine):
    engine.execute("BEGIN")
    engine.execute(
        "MERGE INTO accounts a USING feed f ON a.id = f.id "
        "WHEN MATCHED THEN DELETE"
    )
    assert len(_rows(engine)) == 1
    engine.execute("ROLLBACK")
    assert len(_rows(engine)) == 3
