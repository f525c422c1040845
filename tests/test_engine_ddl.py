"""ALTER TABLE family, defaults, auto-increment, check constraints
(reference: TestAlterTable :2116, TestColumnDefaults :1977,
auto-increment sequences catalog/database.go:159-210, checks
backend/executor.go:110-116)."""

import pytest
from pyspark.sql import functions as F

from myduckserver_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.create_table(
        "t",
        [("id", "INT"), ("v", "DOUBLE")],
        rows=[(1, 1.5), (2, 2.5)],
    )
    return e


def test_alter_add_drop_rename_modify(engine):
    engine.alter_add_column("t", "tag", "VARCHAR(10)", default="x")
    rows = {r.id: r.tag for r in engine.sql("SELECT * FROM t").collect()}
    assert rows == {1: "x", 2: "x"}

    engine.alter_rename_column("t", "tag", "label")
    assert "label" in engine.catalog.table("t").read().columns

    engine.alter_modify_column("t", "id", "BIGINT")
    assert dict(engine.catalog.table("t").read().dtypes)["id"] == "bigint"

    engine.alter_drop_column("t", "label")
    assert "label" not in engine.catalog.table("t").read().columns


def test_rename_table(engine):
    engine.rename_table("t", "t2")
    assert engine.catalog.list_tables() == ["t2"]
    assert engine.sql("SELECT COUNT(*) AS n FROM t2").collect()[0].n == 2


def test_insert_with_defaults(engine, spark):
    engine.alter_add_column("t", "status", "VARCHAR(10)", default=None)
    engine.insert_with_defaults(
        "t",
        spark.createDataFrame([(3, 3.5)], "id int, v double"),
        defaults={"status": "NEW"},
    )
    rows = {r.id: r.status for r in engine.sql("SELECT * FROM t").collect()}
    assert rows[3] == "NEW" and rows[1] is None


def test_auto_increment_dense_ids(engine, spark):
    engine.insert_auto_increment(
        "t", spark.createDataFrame([(10.5,), (11.5,)], "v double"), "id"
    )
    ids = sorted(r.id for r in engine.sql("SELECT id FROM t").collect())
    assert ids == [1, 2, 3, 4]  # continues after max, dense
    engine.insert_auto_increment(
        "t", spark.createDataFrame([(12.5,)], "v double"), "id"
    )
    assert sorted(
        r.id for r in engine.sql("SELECT id FROM t").collect()
    ) == [1, 2, 3, 4, 5]


def test_check_constraint_rejects_and_allows(engine, spark):
    ok = spark.createDataFrame([(5, 9.9)], "id int, v double")
    engine.insert_checked("t", ok, {"v_positive": F.col("v") > 0})
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3

    bad = spark.createDataFrame([(6, -1.0)], "id int, v double")
    with pytest.raises(ValueError, match="v_positive"):
        engine.insert_checked("t", bad, {"v_positive": F.col("v") > 0})
    # rejected batch must not be partially applied
    assert engine.sql("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3

def test_optimize_statement(spark, tmp_path):
    """OPTIMIZE t ZORDER BY (a, b) through the SQL front door."""
    from myduckserver_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_opt"))
    eng.execute("CREATE TABLE ot (a INT, b INT, PRIMARY KEY (a))")
    # a must be unique: it is the PRIMARY KEY (plain INSERT now
    # enforces ER_DUP_ENTRY like MySQL)
    eng.execute(
        "INSERT INTO ot VALUES " +
        ", ".join(f"({i}, {i * 13 % 40})" for i in range(400))
    )
    r = eng.execute("OPTIMIZE ot ZORDER BY (a, b)")
    assert "optimized on (a, b)" in r.info
    assert eng.sql("SELECT COUNT(*) AS n FROM ot").first().n == 400

    # no ZORDER clause: falls back to the primary key
    r2 = eng.execute("OPTIMIZE ot")
    assert "optimized on (a)" in r2.info


def test_add_column_first_and_after(spark, tmp_path):
    """ALTER TABLE ADD COLUMN ... FIRST / AFTER col honors MySQL
    column ordering (the reference drops the position; we keep it)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_pos"))
    e.execute("CREATE TABLE p (a INT PRIMARY KEY, b INT)")
    e.execute("INSERT INTO p VALUES (1, 2)")
    e.execute("ALTER TABLE p ADD COLUMN z INT DEFAULT 0 FIRST")
    assert e.sql("SELECT * FROM p").columns == ["z", "a", "b"]
    e.execute("ALTER TABLE p ADD COLUMN m INT AFTER a")
    assert e.sql("SELECT * FROM p").columns == ["z", "a", "m", "b"]
    e.execute("ALTER TABLE p ADD COLUMN t INT")  # default: append
    assert e.sql("SELECT * FROM p").columns == ["z", "a", "m", "b", "t"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="AFTER column not found"):
        e.execute("ALTER TABLE p ADD COLUMN q INT AFTER nope")


def test_create_table_like(spark, tmp_path):
    """CREATE TABLE t2 LIKE t1 clones schema + constraints + layout,
    never data (GMS TestCreateTable surface)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_like"))
    # hive-style PARTITIONED BY keeps the value layout (MySQL
    # KEY/HASH partitioning is a dropped distribution hint since
    # round 10 — one directory per key value does not scale)
    e.execute(
        "CREATE TABLE src (id INT AUTO_INCREMENT PRIMARY KEY, "
        "name VARCHAR(20) NOT NULL, v DOUBLE DEFAULT 1.5) "
        "PARTITIONED BY (name)"
    )
    e.execute("INSERT INTO src (name) VALUES ('a'), ('b')")
    e.execute("CREATE TABLE dst LIKE src")
    assert e.execute("SELECT * FROM dst").count() == 0  # no data copied
    meta = e.table_meta("dst")
    assert meta.primary_key == ["id"]
    assert meta.auto_increment == "id"
    assert meta.defaults.get("v") == 1.5
    assert meta.partition_by == ["name"]
    # constraints actually enforce on the clone
    e.execute("INSERT INTO dst (name) VALUES ('x')")
    row = e.execute("SELECT * FROM dst").collect()[0]
    assert (row.id, row.v) == (1, 1.5)
    e.execute("CREATE TABLE IF NOT EXISTS dst LIKE src")  # no error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="table exists"):
        e.execute("CREATE TABLE dst LIKE src")


def test_alter_index_check_default_surface(spark, tmp_path):
    """ALTER TABLE ADD [UNIQUE] INDEX / ADD CHECK (validates existing
    rows, MySQL rule) / DROP CHECK|CONSTRAINT / ALTER COLUMN SET|DROP
    DEFAULT."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE at (id INT PRIMARY KEY, a INT, b INT)")
    e.execute("INSERT INTO at VALUES (1, 5, 1)")

    e.execute("ALTER TABLE at ADD INDEX ix_ab (a, b)")
    e.execute("ALTER TABLE at ADD UNIQUE INDEX ux_a (a)")
    idx = {
        r.Key_name: r.Non_unique
        for r in e.execute("SHOW INDEXES FROM at").collect()
    }
    assert idx.get("ix_ab") == 1 and idx.get("ux_a") == 0
    with pytest.raises(ValueError):
        e.execute("ALTER TABLE at ADD INDEX bad (nope)")

    # ADD CHECK validates existing rows first
    with pytest.raises(ValueError):
        e.execute("ALTER TABLE at ADD CONSTRAINT big CHECK (a > 100)")
    e.execute("ALTER TABLE at ADD CONSTRAINT pos CHECK (a > 0)")
    with pytest.raises(ValueError):  # now enforced on DML
        e.execute("INSERT INTO at VALUES (2, -1, 0)")
    e.execute("ALTER TABLE at DROP CHECK pos")
    e.execute("INSERT INTO at VALUES (2, -1, 0)")  # check gone

    # DROP CONSTRAINT resolves across kinds (here: the unique index)
    e.execute("ALTER TABLE at DROP CONSTRAINT ux_a")
    assert "ux_a" not in {
        r.Key_name for r in e.execute("SHOW INDEXES FROM at").collect()
    }

    e.execute("ALTER TABLE at ALTER COLUMN b SET DEFAULT 42")
    e.execute("INSERT INTO at (id, a) VALUES (3, 9)")
    assert e.sql("SELECT b FROM at WHERE id = 3").collect()[0][0] == 42
    e.execute("ALTER TABLE at ALTER b DROP DEFAULT")
    e.execute("INSERT INTO at (id, a) VALUES (4, 9)")
    assert e.sql("SELECT b FROM at WHERE id = 4").collect()[0][0] is None


def test_show_create_table_renders_indexes(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE sct (id INT PRIMARY KEY, a INT, b TEXT)")
    e.execute("ALTER TABLE sct ADD INDEX ix_a (a)")
    e.execute("ALTER TABLE sct ADD UNIQUE INDEX ux_ab (a, b)")
    ddl = e.execute("SHOW CREATE TABLE sct").collect()[0][1]
    assert "KEY `ix_a` (`a`)" in ddl
    assert "UNIQUE KEY `ux_ab` (`a`, `b`)" in ddl
    assert "PRIMARY KEY (`id`)" in ddl


def test_updatable_view_dml(spark, tmp_path):
    """MySQL updatable views: single-table SELECT views accept
    INSERT/UPDATE/DELETE retargeted onto the base table — the view's
    WHERE narrows UPDATE/DELETE (no CHECK OPTION: INSERT passes
    through), aliases map back to base columns (GMS executes DML
    through views the same way)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
    e.execute("CREATE VIEW big AS SELECT id, v AS val FROM t WHERE v > 15")
    # UPDATE through the view, alias mapped, view-WHERE respected
    e.execute("UPDATE big SET val = 99 WHERE id = 2")
    assert sorted((r.id, r.v) for r in
                  e.execute("SELECT * FROM t").collect()) \
        == [(1, 10), (2, 99)]
    # INSERT through the view (positional: view column order)
    e.execute("INSERT INTO big VALUES (3, 30)")
    assert e.execute("SELECT v FROM t WHERE id = 3").collect()[0].v == 30
    # DELETE only reaches rows INSIDE the view
    assert e.execute("DELETE FROM big WHERE id = 1").affected_rows == 0
    assert e.execute("DELETE FROM big WHERE id = 3").affected_rows == 1
    # named-column INSERT maps through the alias
    e.execute("INSERT INTO big (id, val) VALUES (4, 40)")
    assert e.execute("SELECT v FROM t WHERE id = 4").collect()[0].v == 40
    # a column outside the view is an error
    with pytest.raises(ValueError, match="not part of view"):
        e.execute("UPDATE big SET nope = 1")
    # non-updatable shapes are rejected with a clear error
    e.execute("CREATE VIEW agg AS SELECT id, COUNT(*) AS c FROM t "
              "GROUP BY id")
    with pytest.raises(ValueError, match="not updatable"):
        e.execute("DELETE FROM agg WHERE id = 1")
    e.execute("CREATE VIEW vv AS SELECT id, val FROM big")
    with pytest.raises(ValueError, match="view-on-view"):
        e.execute("DELETE FROM vv WHERE id = 2")


def test_view_with_check_option(spark, tmp_path):
    """WITH CHECK OPTION: DML through the view must keep rows visible
    in it — out-of-view INSERTs and UPDATEs fail BEFORE any write
    (MySQL error 1369); without the option they pass through."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO t VALUES (1, 20)")
    e.execute("CREATE VIEW pos AS SELECT id, v FROM t WHERE v > 0 "
              "WITH CHECK OPTION")
    e.execute("INSERT INTO pos VALUES (2, 5)")  # visible: ok
    with pytest.raises(ValueError, match="CHECK OPTION failed"):
        e.execute("INSERT INTO pos VALUES (3, -1)")
    with pytest.raises(ValueError, match="CHECK OPTION failed"):
        e.execute("UPDATE pos SET v = -9 WHERE id = 1")
    # nothing was written by the failed statements
    assert sorted((r.id, r.v) for r in
                  e.execute("SELECT * FROM t").collect()) \
        == [(1, 20), (2, 5)]
    # in-view update passes
    e.execute("UPDATE pos SET v = 1 WHERE id = 1")
    assert e.execute("SELECT v FROM t WHERE id = 1").collect()[0].v == 1
    # OR REPLACE without the option drops enforcement
    e.execute("CREATE OR REPLACE VIEW pos AS SELECT id, v FROM t "
              "WHERE v > 0")
    e.execute("INSERT INTO pos VALUES (4, -4)")
    assert e.execute("SELECT v FROM t WHERE id = 4").collect()[0].v == -4


def test_view_check_option_folds_defaults(spark, tmp_path):
    """WITH CHECK OPTION over an INSERT that omits predicate columns:
    the omitted columns take their declared DEFAULT (NULL when none)
    and generated columns their expressions before the check runs —
    MySQL evaluates the option against the post-default row image."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, st VARCHAR(10) "
              "DEFAULT 'open', v INT)")
    e.execute("CREATE VIEW openv AS SELECT id, st, v FROM t "
              "WHERE st = 'open' WITH CHECK OPTION")
    # st omitted → default 'open' satisfies the predicate
    e.execute("INSERT INTO openv (id, v) VALUES (1, 10)")
    assert e.execute(
        "SELECT st FROM t WHERE id = 1").collect()[0].st == "open"
    # explicit out-of-view value still fails
    with pytest.raises(ValueError, match="CHECK OPTION failed"):
        e.execute("INSERT INTO openv (id, st, v) VALUES (2, 'done', 1)")
    # no-default column folds as NULL → predicate not satisfied
    e.execute("CREATE TABLE t2 (id INT PRIMARY KEY, v INT)")
    e.execute("CREATE VIEW posv AS SELECT id, v FROM t2 WHERE v > 0 "
              "WITH CHECK OPTION")
    with pytest.raises(ValueError, match="CHECK OPTION failed"):
        e.execute("INSERT INTO posv (id) VALUES (1)")
    # generated column folds as its expression
    e.execute("CREATE TABLE t3 (id INT PRIMARY KEY, a INT, "
              "b INT AS (a * 2))")
    e.execute("CREATE VIEW bigb AS SELECT id, a, b FROM t3 "
              "WHERE b >= 10 WITH CHECK OPTION")
    e.execute("INSERT INTO bigb (id, a) VALUES (1, 5)")
    with pytest.raises(ValueError, match="CHECK OPTION failed"):
        e.execute("INSERT INTO bigb (id, a) VALUES (2, 4)")
    # predicate over an unprovided AUTO_INCREMENT id: honest rejection
    e.execute("CREATE TABLE t4 (id INT PRIMARY KEY AUTO_INCREMENT, "
              "v INT)")
    e.execute("CREATE VIEW lowid AS SELECT id, v FROM t4 "
              "WHERE id < 100 WITH CHECK OPTION")
    with pytest.raises(NotImplementedError, match="AUTO_INCREMENT"):
        e.execute("INSERT INTO lowid (v) VALUES (1)")


def test_inline_index_clauses_recorded(spark, tmp_path):
    """CREATE TABLE inline KEY/INDEX/UNIQUE clauses (with optional
    column prefixes, as mysqldump emits) land in table metadata:
    SHOW CREATE TABLE and information_schema.statistics render them,
    so dump round-trips keep index definitions."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a VARCHAR(100), b INT, "
              "INDEX ix (a(10)), KEY k2 (b), UNIQUE uq (a, b))")
    ddl = e.execute("SHOW CREATE TABLE t").collect()[0][1]
    assert "KEY `k2` (`b`)" in ddl
    assert "UNIQUE KEY `uq` (`a`, `b`)" in ddl
    rows = {(r[0], r[1]) for r in e.sql(
        "SELECT INDEX_NAME, COLUMN_NAME FROM "
        "information_schema.statistics WHERE table_name = 't'"
    ).collect()}
    assert {("ix", "a"), ("k2", "b"), ("uq", "a"), ("uq", "b")} <= rows
    # round-trip: replaying the rendered DDL keeps the indexes
    e2 = Engine(spark, str(tmp_path / "wh2"))
    e2.execute(ddl)
    assert "k2" in e2.table_meta("t").indexes


def test_alter_table_multi_action(spark, tmp_path):
    """ALTER TABLE with a comma-separated action list (the form every
    migration tool emits) applies in order; a failing action rolls the
    table back to the statement start (MySQL 8 atomic DDL)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE m (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO m VALUES (1, 5)")
    e.execute(
        "ALTER TABLE m ADD COLUMN w INT DEFAULT 7, "
        "ADD INDEX ix_v (v), RENAME COLUMN v TO vv"
    )
    row = e.execute("SELECT * FROM m").collect()[0]
    assert (row.id, row.vv, row.w) == (1, 5, 7)
    assert "ix_v" in e.table_meta("m").indexes
    # mid-list failure: nothing from the statement sticks
    with pytest.raises(Exception):
        e.execute(
            "ALTER TABLE m ADD COLUMN x INT, DROP COLUMN nosuch"
        )
    assert "x" not in e.execute("SELECT * FROM m").columns
    # CHECK validation failure after a successful action also restores
    with pytest.raises(Exception):
        e.execute(
            "ALTER TABLE m ADD COLUMN y INT, ADD CHECK (vv > 100)"
        )
    assert "y" not in e.execute("SELECT * FROM m").columns
    assert not e.table_meta("m").checks
    # commas inside type/index parens don't split the list
    e.execute(
        "ALTER TABLE m ADD COLUMN d DECIMAL(10,2) DEFAULT 1.5, "
        "ADD UNIQUE INDEX uq (id, vv)"
    )
    assert "uq" in e.table_meta("m").indexes


def test_alter_column_full_definitions(spark, tmp_path):
    """ALTER ADD/MODIFY/CHANGE COLUMN accept full column definitions
    (NOT NULL / COMMENT / AUTO_INCREMENT / DEFAULT / GENERATED /
    FIRST|AFTER); MODIFY REPLACES the column's attributes (MySQL —
    an omitted NOT NULL or DEFAULT drops it) and validates NOT NULL
    against existing rows (1138). Reference corpus:
    main_test.go TestAlterTable ADD/MODIFY-with-attributes cases."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (i BIGINT NOT NULL, s VARCHAR(20))")
    e.execute("INSERT INTO t VALUES (1, 'a')")
    e.execute("ALTER TABLE t ADD COLUMN c2 INT NOT NULL DEFAULT 7")
    e.execute("ALTER TABLE t ADD COLUMN c3 INT COMMENT 'hello' AFTER i")
    assert e.execute("SELECT * FROM t").columns == ["i", "c3", "s", "c2"]
    assert e.execute("SELECT c2 FROM t").collect()[0].c2 == 7
    meta = e.table_meta("t")
    assert "c2" in meta.not_null and meta.defaults["c2"] == 7
    # MODIFY drops unmentioned attributes and can reposition
    e.execute("ALTER TABLE t MODIFY COLUMN c2 BIGINT FIRST")
    meta = e.table_meta("t")
    assert "c2" not in meta.not_null and "c2" not in meta.defaults
    assert e.execute("SELECT * FROM t").columns[0] == "c2"
    # CHANGE to NOT NULL with an existing NULL row → MySQL 1138
    with pytest.raises(ValueError, match="NULL"):
        e.execute(
            "ALTER TABLE t CHANGE COLUMN c3 c3x INT NOT NULL DEFAULT 3")
    # NULL-free redefinition via CHANGE succeeds (rename + default)
    e.execute("ALTER TABLE t CHANGE COLUMN c3 c3x INT DEFAULT 3")
    assert "c3x" in e.execute("SELECT * FROM t").columns
    assert e.table_meta("t").defaults["c3x"] == 3
    # a NULL-free column CAN become NOT NULL
    e.execute("ALTER TABLE t MODIFY COLUMN i BIGINT NOT NULL COMMENT 'k'")
    assert "i" in e.table_meta("t").not_null
    # generated column backfills existing rows
    e.execute("ALTER TABLE t ADD COLUMN dbl BIGINT AS (i * 2)")
    assert e.execute("SELECT dbl FROM t").collect()[0].dbl == 2
    # AUTO_INCREMENT via ADD COLUMN
    e.execute("CREATE TABLE t2 (a INT PRIMARY KEY)")
    e.execute("INSERT INTO t2 VALUES (5)")
    e.execute("ALTER TABLE t2 ADD COLUMN id BIGINT AUTO_INCREMENT")
    e.execute("INSERT INTO t2 (a) VALUES (6)")
    assert e.table_meta("t2").auto_increment == "id"


def test_alter_modify_not_null_with_nulls_rejected(spark, tmp_path):
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (i INT NOT NULL, x INT)")
    e.execute("INSERT INTO t VALUES (1, NULL)")
    with pytest.raises(ValueError, match="NULL"):
        e.execute("ALTER TABLE t MODIFY COLUMN x INT NOT NULL")
    assert "x" not in e.table_meta("t").not_null


def test_show_create_roundtrip_generated_onupdate_counter(spark, tmp_path):
    """SHOW CREATE TABLE round-trips generated columns, the
    DEFAULT/ON UPDATE CURRENT_TIMESTAMP pair, and the LIVE
    AUTO_INCREMENT counter (a restored dump must not reuse issued
    ids); generated expressions over the auto column reject at CREATE
    (MySQL 3109)."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="3109"):
        e.execute("CREATE TABLE bad (id INT PRIMARY KEY AUTO_INCREMENT, "
                  "d BIGINT AS (id * 2))")
    e.execute(
        "CREATE TABLE rt (id BIGINT NOT NULL AUTO_INCREMENT, "
        "v INT, created TIMESTAMP DEFAULT CURRENT_TIMESTAMP "
        "ON UPDATE CURRENT_TIMESTAMP, doubled BIGINT AS (v * 2), "
        "PRIMARY KEY (id)) AUTO_INCREMENT=10"
    )
    e.execute("INSERT INTO rt (v) VALUES (3)")
    ddl = e.execute("SHOW CREATE TABLE rt").collect()[0][1]
    assert "GENERATED ALWAYS AS (v * 2)" in ddl
    assert "DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP" in ddl
    assert "AUTO_INCREMENT=11" in ddl
    e2 = Engine(spark, str(tmp_path / "wh2"))
    e2.execute(ddl)
    e2.execute("INSERT INTO rt (v) VALUES (4)")
    row = e2.execute("SELECT id, doubled FROM rt").collect()[0]
    assert (row.id, row.doubled) == (11, 8)  # counter + expr survive


def test_alter_generated_backfill_translated_and_atomic(spark, tmp_path):
    """ADD COLUMN ... GENERATED backfills through the MySQL translator
    (DATE_FORMAT '%Y' would throw or silently diverge under raw
    F.expr) and a bad expression fails BEFORE any mutation — no
    half-applied DDL. Reference parity: generated expressions run
    through the same dialect translation as DML
    (catalog/table.go generated-column DDL passthrough)."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (d DATE, v INT)")
    e.execute("INSERT INTO t VALUES ('2024-03-05', 10)")
    e.execute("ALTER TABLE t ADD COLUMN y VARCHAR(10) "
              "GENERATED ALWAYS AS (DATE_FORMAT(d,'%Y')) STORED")
    assert e.execute("SELECT y FROM t").collect()[0].y == "2024"
    e.execute("INSERT INTO t (d, v) VALUES ('2025-06-07', 20)")
    assert sorted(r.y for r in e.execute("SELECT y FROM t").collect()) \
        == ["2024", "2025"]
    # unresolvable expression: statement fails atomically
    with pytest.raises(Exception):
        e.execute("ALTER TABLE t ADD COLUMN z INT "
                  "GENERATED ALWAYS AS (no_such_col + 1) STORED")
    assert e.execute("SELECT * FROM t").columns == ["d", "v", "y"]
    assert "z" not in e.table_meta("t").generated


def test_alter_modify_generated_status_3106(spark, tmp_path):
    """MODIFY/CHANGE cannot flip a column between plain and STORED
    generated (MySQL error 3106); changing the EXPRESSION of an
    already-generated column is allowed and re-materializes rows."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t2 (a INT, c INT)")
    e.execute("INSERT INTO t2 VALUES (10, 999)")
    with pytest.raises(ValueError, match="3106"):
        e.execute("ALTER TABLE t2 MODIFY c INT "
                  "GENERATED ALWAYS AS (a+1) STORED")
    assert e.execute("SELECT c FROM t2").collect()[0].c == 999
    e.execute("CREATE TABLE t3 (a INT, "
              "g INT GENERATED ALWAYS AS (a+1) STORED)")
    e.execute("INSERT INTO t3 (a) VALUES (5)")
    # generated -> plain also rejected
    with pytest.raises(ValueError, match="3106"):
        e.execute("ALTER TABLE t3 MODIFY g INT")
    e.execute("ALTER TABLE t3 MODIFY g INT "
              "GENERATED ALWAYS AS (a*10) STORED")
    assert e.execute("SELECT g FROM t3").collect()[0].g == 50


def test_round9_migration_ddl_shapes(spark, tmp_path):
    """ORM/migration statement shapes (probe battery round 9): ALTER
    DROP INDEX, ADD [CONSTRAINT] UNIQUE (named and unnamed), ADD
    PRIMARY KEY with row validation, multi-pair RENAME TABLE (the swap
    idiom), multi-name DROP TABLE/VIEW, pg ADD/DROP COLUMN IF [NOT]
    EXISTS idempotency, pg ALTER COLUMN TYPE (attributes survive,
    unlike MySQL MODIFY), SET/DROP NOT NULL, OWNER TO no-op, CREATE
    INDEX CONCURRENTLY, COMMENT ON, TRUNCATE RESTART IDENTITY."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, b INT, s VARCHAR(20))")
    e.execute("INSERT INTO t VALUES (1, 10, 'x'), (2, 20, 'y')")
    e.execute("ALTER TABLE t ADD INDEX idx2 (b)")
    e.execute("ALTER TABLE t DROP INDEX idx2")
    assert "idx2" not in e.table_meta("t").indexes
    e.execute("ALTER TABLE t ADD CONSTRAINT uq_b UNIQUE (b)")
    assert e.table_meta("t").indexes["uq_b"]["unique"]
    with pytest.raises(Exception, match="Duplicate"):
        e.execute("INSERT INTO t VALUES (3, 10, 'z')")  # enforced
    e.execute("ALTER TABLE t DROP CONSTRAINT uq_b")
    e.execute("ALTER TABLE t ADD UNIQUE (s)")  # unnamed form
    assert any(p["columns"] == ["s"]
               for p in e.table_meta("t").indexes.values())
    # ADD PRIMARY KEY validates rows
    e.execute("CREATE TABLE npk (x INT, y INT)")
    e.execute("INSERT INTO npk VALUES (1, 2), (2, 3)")
    e.execute("ALTER TABLE npk ADD PRIMARY KEY (x)")
    assert e.table_meta("npk").primary_key == ["x"]
    with pytest.raises(Exception, match="Duplicate"):
        e.execute("INSERT INTO npk VALUES (1, 9)")
    with pytest.raises(ValueError, match="1068"):
        e.execute("ALTER TABLE npk ADD PRIMARY KEY (y)")
    # multi-pair RENAME (swap idiom) and multi-name drops
    e.execute("RENAME TABLE t TO t1, t1 TO t")
    assert "t" in e.catalog.list_tables()
    e.execute("CREATE TABLE d1 (x INT)")
    e.execute("DROP TABLE IF EXISTS d1, d2")
    assert "d1" not in e.catalog.list_tables()
    e.execute("CREATE VIEW v1 AS SELECT a FROM t")
    e.execute("DROP VIEW IF EXISTS v1, v2")
    # pg idempotent column DDL
    e.execute("ALTER TABLE t ADD COLUMN IF NOT EXISTS pgc INT",
              dialect="postgres")
    e.execute("ALTER TABLE t ADD COLUMN IF NOT EXISTS pgc INT",
              dialect="postgres")
    assert e.execute("SELECT * FROM t").columns.count("pgc") == 1
    e.execute("ALTER TABLE t DROP COLUMN IF EXISTS pgc",
              dialect="postgres")
    e.execute("ALTER TABLE t DROP COLUMN IF EXISTS pgc",
              dialect="postgres")
    # pg TYPE change keeps NOT NULL (no MODIFY replace semantics)
    e.execute("ALTER TABLE t ALTER COLUMN s SET NOT NULL",
              dialect="postgres")
    e.execute("ALTER TABLE t ALTER COLUMN s TYPE VARCHAR(100)",
              dialect="postgres")
    assert "s" in e.table_meta("t").not_null
    e.execute("ALTER TABLE t ALTER COLUMN s DROP NOT NULL",
              dialect="postgres")
    assert "s" not in e.table_meta("t").not_null
    for q in ("ALTER TABLE t OWNER TO app",
              "COMMENT ON TABLE t IS 'docs'",
              "CREATE UNIQUE INDEX CONCURRENTLY ic ON t (s)",
              "TRUNCATE t RESTART IDENTITY"):
        e.execute(q, dialect="postgres")
    assert e.execute("SELECT COUNT(*) AS n FROM t").collect()[0].n == 0


def test_default_fn_with_embedded_quote(spark, tmp_path):
    """DEFAULT(col) and SHOW CREATE render string defaults as proper
    SQL literals — a default containing a quote must not leak
    Python repr() escaping (round-10 ADVICE)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_defq"))
    e.execute("CREATE TABLE dq (id INT, nm VARCHAR(40) "
              "DEFAULT 'O''Brien')")
    e.execute("INSERT INTO dq (id) VALUES (1)")
    rows = e.execute("SELECT id, nm, DEFAULT(nm) AS d FROM dq").collect()
    assert rows[0].nm == "O'Brien" and rows[0].d == "O'Brien"
    ddl = e.execute("SHOW CREATE TABLE dq").collect()[0][1]
    assert "DEFAULT 'O''Brien'" in ddl


def test_hash_partition_ddl_and_failed_create_cleanup(spark, tmp_path):
    """PARTITION BY HASH/KEY is a physical-distribution hint — it
    must NOT map onto hive value partitioning (one directory per id
    value at scale; and Spark rejects all-column partitioning
    outright). Also: a CREATE whose write fails must not leave a
    half-created directory that poisons every other table's queries."""
    import pytest as _pt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_hashpart"))
    e.execute("CREATE TABLE ph (id INT PRIMARY KEY) "
              "PARTITION BY HASH(id) PARTITIONS 4")
    e.execute("INSERT INTO ph VALUES (1), (2)")
    assert e.sql("SELECT COUNT(*) FROM ph").collect()[0][0] == 2
    assert not e.table_meta("ph").partition_by  # hint dropped
    # RANGE partitioning with per-partition defs keeps the hive layout
    e.execute(
        "CREATE TABLE pr (id INT PRIMARY KEY, d DATE) "
        "PARTITION BY RANGE (YEAR(d)) ("
        "PARTITION p0 VALUES LESS THAN (2020), "
        "PARTITION p1 VALUES LESS THAN MAXVALUE)")
    assert e.table_meta("pr").partition_by == ["d"]
    # all-column hive partitioning fails IN SPARK — the directory must
    # be cleaned up and later statements unaffected
    with _pt.raises(Exception):
        e.execute("CREATE TABLE bad1 (x INT PRIMARY KEY) "
                  "PARTITIONED BY (x)")
    assert "bad1" not in e.catalog.list_tables()
    assert e.sql("SELECT COUNT(*) FROM ph").collect()[0][0] == 2
