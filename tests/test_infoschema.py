"""information_schema / __sys__ catalog views through the SQL front door
(reference: GMS information_schema, main_test.go:127-128;
pg introspection views catalog/internal_views.go:16,51)."""

import pytest

from myduckserver_spark.engine import Engine
from myduckserver_spark.infoschema import rewrite


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE users ("
        " id INT NOT NULL AUTO_INCREMENT,"
        " name VARCHAR(20) NOT NULL,"
        " age INT DEFAULT 18,"
        " PRIMARY KEY (id),"
        " CONSTRAINT chk_age CHECK (age >= 0))"
    )
    e.execute("CREATE TABLE orders (oid INT, uid INT, amount DECIMAL(10,2))")
    e.execute("CREATE UNIQUE INDEX idx_name ON users (name)")
    e.execute("CREATE VIEW adults AS SELECT id, name FROM users WHERE age >= 18")
    return e


def test_rewrite_is_case_insensitive_and_leaves_unknown():
    q, needed = rewrite("SELECT * FROM information_schema.TABLES t")
    assert "information_schema__tables" in q
    assert needed == {("information_schema", "tables")}
    q2, needed2 = rewrite("SELECT * FROM information_schema.nonsense")
    assert needed2 == set() and "information_schema.nonsense" in q2


def test_tables_lists_base_tables_and_views(engine):
    rows = engine.execute(
        "SELECT TABLE_NAME, TABLE_TYPE FROM information_schema.tables "
        "WHERE TABLE_SCHEMA = 'main' ORDER BY TABLE_NAME"
    ).collect()
    got = [(r.TABLE_NAME, r.TABLE_TYPE) for r in rows]
    assert ("users", "BASE TABLE") in got
    assert ("orders", "BASE TABLE") in got
    assert ("adults", "VIEW") in got


def test_columns_metadata(engine):
    rows = engine.execute(
        "SELECT COLUMN_NAME, ORDINAL_POSITION, IS_NULLABLE, COLUMN_KEY,"
        " EXTRA, COLUMN_DEFAULT"
        " FROM information_schema.columns WHERE TABLE_NAME = 'users'"
        " ORDER BY ORDINAL_POSITION"
    ).collect()
    assert [r.COLUMN_NAME for r in rows] == ["id", "name", "age"]
    by = {r.COLUMN_NAME: r for r in rows}
    assert by["id"].COLUMN_KEY == "PRI"
    assert by["id"].EXTRA == "auto_increment"
    assert by["id"].IS_NULLABLE == "NO"
    assert by["age"].COLUMN_DEFAULT == "18"
    assert by["age"].IS_NULLABLE == "YES"


def test_views_and_schemata(engine):
    rows = engine.execute(
        "SELECT TABLE_NAME, VIEW_DEFINITION FROM information_schema.views"
    ).collect()
    assert rows[0].TABLE_NAME == "adults"
    assert "age >= 18" in rows[0].VIEW_DEFINITION

    schemata = engine.execute(
        "SELECT SCHEMA_NAME FROM information_schema.SCHEMATA"
    ).collect()
    assert [r.SCHEMA_NAME for r in schemata] == ["main"]


def test_statistics_and_constraints(engine):
    stats = engine.execute(
        "SELECT INDEX_NAME, COLUMN_NAME, NON_UNIQUE FROM"
        " information_schema.statistics WHERE TABLE_NAME = 'users'"
        " ORDER BY INDEX_NAME"
    ).collect()
    got = {(r.INDEX_NAME, r.COLUMN_NAME, r.NON_UNIQUE) for r in stats}
    assert ("PRIMARY", "id", 0) in got
    assert ("idx_name", "name", 0) in got

    cons = engine.execute(
        "SELECT CONSTRAINT_NAME, CONSTRAINT_TYPE FROM"
        " information_schema.table_constraints WHERE TABLE_NAME = 'users'"
    ).collect()
    types = {r.CONSTRAINT_NAME: r.CONSTRAINT_TYPE for r in cons}
    assert types["PRIMARY"] == "PRIMARY KEY"
    assert types["chk_age"] == "CHECK"
    assert types["idx_name"] == "UNIQUE"

    kcu = engine.execute(
        "SELECT CONSTRAINT_NAME, COLUMN_NAME, ORDINAL_POSITION FROM"
        " information_schema.key_column_usage WHERE TABLE_NAME = 'users'"
    ).collect()
    assert {(r.CONSTRAINT_NAME, r.COLUMN_NAME) for r in kcu} == {
        ("PRIMARY", "id"), ("idx_name", "name")
    }


def test_multi_database_enumeration(engine):
    engine.execute("CREATE DATABASE db2")
    engine.execute("USE db2")
    engine.execute("CREATE TABLE t2 (x INT)")
    rows = engine.execute(
        "SELECT TABLE_SCHEMA, TABLE_NAME FROM information_schema.tables"
        " ORDER BY TABLE_SCHEMA, TABLE_NAME"
    ).collect()
    got = {(r.TABLE_SCHEMA, r.TABLE_NAME) for r in rows}
    assert ("db2", "t2") in got and ("main", "users") in got
    schemata = engine.execute(
        "SELECT SCHEMA_NAME FROM information_schema.schemata ORDER BY 1"
    ).collect()
    assert [r.SCHEMA_NAME for r in schemata] == ["db2", "main"]


def test_pg_sys_views(engine):
    rows = engine.execute(
        "SELECT relname, schemaname, n_live_tup FROM __sys__.pg_stat_user_tables"
        " ORDER BY relname"
    ).collect()
    assert [r.relname for r in rows] == ["orders", "users"]
    assert rows[0].schemaname == "main"

    idx = engine.execute(
        "SELECT indrelid, indisprimary, indisunique, indkey FROM __sys__.pg_index"
        " WHERE indrelid = 'users' ORDER BY indexrelid"
    ).collect()
    prim = [r for r in idx if r.indisprimary]
    assert len(prim) == 1 and prim[0].indkey == [1]
    uniq = [r for r in idx if not r.indisprimary]
    assert uniq and uniq[0].indisunique and uniq[0].indkey == [2]


def test_join_info_schema_with_user_table(engine):
    # catalog views compose with ordinary queries in one statement
    rows = engine.execute(
        "SELECT c.COLUMN_NAME FROM information_schema.columns c"
        " WHERE c.TABLE_NAME = 'orders' AND c.DATA_TYPE = 'decimal'"
    ).collect()
    assert [r.COLUMN_NAME for r in rows] == ["amount"]


def test_pg_catalog_namespace_class_attribute(engine):
    """pg_catalog shims (reference: pgserver/in_place_handler.go:19-26):
    the namespace→class→attribute join psql-style tools issue."""
    ns = engine.execute(
        "SELECT oid, nspname FROM pg_catalog.pg_namespace ORDER BY oid"
    ).collect()
    names = [r.nspname for r in ns]
    assert names[:2] == ["pg_catalog", "information_schema"]
    assert "main" in names
    assert ns[0].oid == 11 and ns[1].oid == 99

    rows = engine.execute(
        "SELECT c.relname, c.relkind, n.nspname"
        " FROM pg_catalog.pg_class c"
        " JOIN pg_catalog.pg_namespace n ON c.relnamespace = n.oid"
        " ORDER BY c.relname"
    ).collect()
    kinds = {r.relname: r.relkind for r in rows}
    assert kinds == {"users": "r", "orders": "r", "adults": "v"}
    assert all(r.nspname == "main" for r in rows)

    atts = engine.execute(
        "SELECT a.attname, a.attnum, a.attnotnull, a.atttypid"
        " FROM pg_catalog.pg_attribute a"
        " JOIN pg_catalog.pg_class c ON a.attrelid = c.oid"
        " WHERE c.relname = 'orders' ORDER BY a.attnum"
    ).collect()
    assert [r.attname for r in atts] == ["oid", "uid", "amount"]
    assert atts[2].atttypid == 1700  # numeric


def test_pg_catalog_pg_tables(engine):
    rows = engine.execute(
        "SELECT schemaname, tablename FROM pg_catalog.pg_tables"
        " ORDER BY tablename"
    ).collect()
    assert [(r.schemaname, r.tablename) for r in rows] == [
        ("main", "orders"), ("main", "users"),
    ]


def test_pg_catalog_stable_oids(engine):
    """oids must be stable across repeated queries (BI tools cache them)."""
    q = "SELECT oid FROM pg_catalog.pg_class WHERE relname = 'users'"
    a = engine.execute(q).collect()[0].oid
    b = engine.execute(q).collect()[0].oid
    assert a == b >= 16384


def test_foreign_key_metadata_surfaces(spark, tmp_path):
    """FOREIGN KEY clauses are recorded (metadata-only, reference FK
    policy harness/duck_harness.go:102-105) and surface through
    information_schema.referential_constraints / key_column_usage and
    SHOW CREATE TABLE — the introspection path ORM schema readers use.
    """
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE parents (id INT PRIMARY KEY, nm TEXT)")
    e.execute(
        "CREATE TABLE childs (cid INT PRIMARY KEY, pid INT, "
        "CONSTRAINT fk_parent FOREIGN KEY (pid) REFERENCES parents (id) "
        "ON DELETE CASCADE)"
    )
    rc = e.sql(
        "SELECT CONSTRAINT_NAME, TABLE_NAME, REFERENCED_TABLE_NAME, "
        "DELETE_RULE, UPDATE_RULE "
        "FROM information_schema.referential_constraints"
    ).collect()
    assert [tuple(r) for r in rc] == [
        ("fk_parent", "childs", "parents", "CASCADE", "NO ACTION")
    ]
    kcu = e.sql(
        "SELECT CONSTRAINT_NAME, COLUMN_NAME, REFERENCED_TABLE_NAME, "
        "REFERENCED_COLUMN_NAME FROM information_schema.key_column_usage "
        "WHERE TABLE_NAME = 'childs' AND REFERENCED_TABLE_NAME IS NOT NULL"
    ).collect()
    assert [tuple(r) for r in kcu] == [("fk_parent", "pid", "parents", "id")]
    tc = e.sql(
        "SELECT CONSTRAINT_TYPE FROM information_schema.table_constraints "
        "WHERE TABLE_NAME = 'childs' ORDER BY CONSTRAINT_TYPE"
    ).collect()
    assert [r[0] for r in tc] == ["FOREIGN KEY", "PRIMARY KEY"]
    ddl = e.execute("SHOW CREATE TABLE childs").collect()[0][1]
    assert "CONSTRAINT `fk_parent` FOREIGN KEY (`pid`) "
    assert "REFERENCES `parents` (`id`) ON DELETE CASCADE" in ddl
    # FKs are NOT enforced (reference parity): orphan insert succeeds
    e.execute("INSERT INTO childs VALUES (1, 999)")
    assert e.sql("SELECT COUNT(*) FROM childs").collect()[0][0] == 1


def test_alter_add_drop_foreign_key(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE p2 (id INT PRIMARY KEY)")
    e.execute("CREATE TABLE c2 (cid INT PRIMARY KEY, pid INT, qid INT)")
    e.execute(
        "ALTER TABLE c2 ADD CONSTRAINT fk_named FOREIGN KEY (pid) "
        "REFERENCES p2 (id) ON UPDATE CASCADE"
    )
    e.execute("ALTER TABLE c2 ADD FOREIGN KEY (qid) REFERENCES p2 (id)")
    rc = e.sql(
        "SELECT CONSTRAINT_NAME, UPDATE_RULE FROM "
        "information_schema.referential_constraints "
        "WHERE TABLE_NAME = 'c2' ORDER BY CONSTRAINT_NAME"
    ).collect()
    assert [tuple(r) for r in rc] == [
        ("fk_1", "NO ACTION"), ("fk_named", "CASCADE"),
    ]
    import pytest

    with pytest.raises(ValueError):  # duplicate constraint name
        e.execute(
            "ALTER TABLE c2 ADD CONSTRAINT fk_named FOREIGN KEY (pid) "
            "REFERENCES p2 (id)"
        )
    e.execute("ALTER TABLE c2 DROP FOREIGN KEY fk_named")
    rc = e.sql(
        "SELECT CONSTRAINT_NAME FROM "
        "information_schema.referential_constraints WHERE TABLE_NAME = 'c2'"
    ).collect()
    assert [r[0] for r in rc] == ["fk_1"]
    with pytest.raises(ValueError):
        e.execute("ALTER TABLE c2 DROP FOREIGN KEY nope")


def test_columns_type_facets(spark, tmp_path):
    """information_schema.columns carries the type facets ORMs read:
    CHARACTER_MAXIMUM_LENGTH, NUMERIC_PRECISION/SCALE, charset."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE facets (id INT PRIMARY KEY, nm VARCHAR(40), "
        "amt DECIMAL(12,3), big BIGINT, d DOUBLE, body TEXT)"
    )
    rows = {
        r.COLUMN_NAME: r
        for r in e.sql(
            "SELECT * FROM information_schema.columns "
            "WHERE TABLE_NAME = 'facets'"
        ).collect()
    }
    assert rows["nm"].CHARACTER_MAXIMUM_LENGTH == 40
    assert rows["nm"].CHARACTER_SET_NAME == "utf8mb4"
    assert (rows["amt"].NUMERIC_PRECISION, rows["amt"].NUMERIC_SCALE) == (
        12, 3,
    )
    assert rows["id"].NUMERIC_PRECISION == 10
    assert rows["big"].NUMERIC_PRECISION == 19
    assert rows["d"].NUMERIC_PRECISION == 22
    assert rows["d"].NUMERIC_SCALE is None
    assert rows["body"].CHARACTER_MAXIMUM_LENGTH == 65535
    assert rows["id"].CHARACTER_MAXIMUM_LENGTH is None


def test_routines_and_triggers_views(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "whrt"))
    e.execute("CREATE TABLE rt (id INT PRIMARY KEY)")
    e.execute("CREATE PROCEDURE p1(IN x INT) SELECT (x) AS v")
    e.execute("CREATE FUNCTION f1(a INT) RETURNS INT RETURN a + 1")
    e.execute("CREATE TRIGGER tg1 AFTER INSERT ON rt FOR EACH ROW "
              "INSERT INTO rt_log VALUES (NEW.id)")
    rows = e.execute(
        "SELECT ROUTINE_NAME, ROUTINE_TYPE "
        "FROM information_schema.routines ORDER BY ROUTINE_TYPE"
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [
        ("f1", "FUNCTION"), ("p1", "PROCEDURE"),
    ]
    rows = e.execute(
        "SELECT TRIGGER_NAME, EVENT_MANIPULATION, EVENT_OBJECT_TABLE, "
        "ACTION_TIMING FROM information_schema.triggers"
    ).collect()
    assert [tuple(r) for r in rows] == [("tg1", "INSERT", "rt", "AFTER")]


def test_partitions_view(spark, tmp_path):
    """information_schema.partitions: one row per table; hive-layout
    tables report a KEY partition, unpartitioned tables a NULL
    PARTITION_NAME row (MySQL's shape)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE plain (id INT PRIMARY KEY)")
    # value-layout spelling (round 10: PARTITION BY KEY/HASH became a
    # dropped distribution hint — hive layout needs an explicit
    # value-partitioning form)
    e.execute("CREATE TABLE parted (id INT PRIMARY KEY, "
              "region VARCHAR(10)) PARTITIONED BY (region)")
    rows = {
        r.TABLE_NAME: (r.PARTITION_NAME, r.PARTITION_METHOD,
                       r.PARTITION_EXPRESSION)
        for r in e.execute(
            "SELECT * FROM information_schema.partitions").collect()
    }
    assert rows["plain"] == (None, None, None)
    assert rows["parted"] == ("p0", "KEY", "region")


def test_round9_infoschema_views_and_show_filters(spark, tmp_path):
    """information_schema.character_sets/collations/engines/
    processlist/user_privileges (BI-tool probe surface), SHOW COLUMNS
    ... LIKE, SHOW KEYS ... WHERE, and MyISAM/binlog admin no-ops
    (probe battery round 9)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, b INT, "
              "UNIQUE KEY ub (b))")
    assert e.execute("SELECT COUNT(*) AS n FROM "
                     "information_schema.character_sets"
                     ).collect()[0].n > 5
    assert e.execute(
        "SELECT COLLATION_NAME FROM information_schema.collations "
        "WHERE CHARACTER_SET_NAME = 'ascii' ORDER BY 1"
    ).collect()[0][0] == "ascii_bin"
    assert e.execute("SELECT ENGINE FROM information_schema.engines"
                     ).collect()[0][0] == "parquet-spark"
    assert e.execute("SELECT COMMAND FROM "
                     "information_schema.processlist"
                     ).collect()[0][0] == "Query"
    assert e.execute(
        "SELECT PRIVILEGE_TYPE FROM information_schema.user_privileges"
    ).collect()[0][0] == "ALL PRIVILEGES"
    rows = e.execute("SHOW COLUMNS FROM t LIKE 'b%'").collect()
    assert [r.Field for r in rows] == ["b"]
    rows = e.execute(
        "SHOW KEYS FROM t WHERE Key_name = 'PRIMARY'").collect()
    assert [(r.Key_name, r.Column_name) for r in rows] == [("PRIMARY", "a")]
    for q in ("CACHE INDEX t IN default_cache",
              "PURGE BINARY LOGS TO 'mysql-bin.000001'",
              "RESET MASTER",
              "LOAD INDEX INTO CACHE t"):
        assert "no-op" in e.execute(q).info


def test_rewrite_skips_string_literals(spark, tmp_path):
    """Catalog-view names inside quoted literals must never be
    rewritten (round-10 ADVICE: the bare pg_catalog pass mutated
    `WHERE relname = 'pg_class'` and arbitrary user strings)."""
    from myduckserver_spark import infoschema
    from myduckserver_spark.engine import Engine

    out, _ = infoschema.rewrite(
        "SELECT relname FROM pg_class WHERE relname = 'pg_class'")
    assert out == ("SELECT relname FROM pg_catalog__pg_class "
                   "WHERE relname = 'pg_class'")
    out, needed = infoschema.rewrite(
        "SELECT * FROM t WHERE note = 'see pg_type docs'")
    assert out == "SELECT * FROM t WHERE note = 'see pg_type docs'"
    assert needed == set()
    # end-to-end: a user string containing pg_ survives the engine path
    e = Engine(spark, str(tmp_path / "wh_strlit"))
    e.execute("CREATE TABLE notes (id INT, note VARCHAR(40))")
    e.execute("INSERT INTO notes VALUES (1, 'see pg_type docs')")
    rows = e.execute(
        "SELECT note FROM notes WHERE note = 'see pg_type docs'"
    ).collect()
    assert [r.note for r in rows] == ["see pg_type docs"]


def test_pg_matviews_and_pg_enum(spark, tmp_path):
    """Round-10 catalog shims: pg_matviews lists materialized views
    with definitions; CREATE TYPE enums surface through pg_type
    (typtype='e') joined to pg_enum in declaration order — the
    SQLAlchemy enum-introspection shape."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_cat10"))
    e.execute("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')",
              dialect="postgres")
    e.execute("CREATE TABLE src7 (x int PRIMARY KEY)",
              dialect="postgres")
    e.execute("CREATE MATERIALIZED VIEW mv7 AS SELECT x FROM src7",
              dialect="postgres")
    rows = e.execute("SELECT matviewname, definition FROM pg_matviews",
                     dialect="postgres").collect()
    assert [r.matviewname for r in rows] == ["mv7"]
    assert "src7" in rows[0].definition
    labs = [r.enumlabel for r in e.execute(
        "SELECT e.enumlabel FROM pg_type t JOIN pg_enum e "
        "ON e.enumtypid = t.oid WHERE t.typtype = 'e' "
        "ORDER BY e.enumsortorder", dialect="postgres").collect()]
    assert labs == ["sad", "ok", "happy"]
    assert e.execute(
        "SELECT count(*) FROM pg_catalog.pg_type "
        "WHERE typname = 'mood'",
        dialect="postgres").collect()[0][0] == 1
