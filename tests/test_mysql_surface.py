"""MySQL surface extras: SELECT ... INTO OUTFILE (GMS
TestSelectIntoFile), SHOW TABLE STATUS (TestShowTableStatus), and the
ANSI_QUOTES sql_mode (TestAnsiQuotesSqlMode) — all through the engine
statement front door."""

import pytest

from myduckserver_spark.engine import Engine, OkResult


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE t (id INT PRIMARY KEY, name VARCHAR(20), v DOUBLE)"
    )
    e.execute(
        "INSERT INTO t VALUES (1, 'ann', 1.5), (2, NULL, 2.5), "
        "(3, 'cid', NULL)"
    )
    return e


def test_into_outfile_defaults(engine, tmp_path):
    out = str(tmp_path / "t.tsv")
    r = engine.execute(f"SELECT * FROM t ORDER BY id INTO OUTFILE '{out}'")
    assert isinstance(r, OkResult) and r.affected_rows == 3
    lines = open(out).read().splitlines()
    assert lines == ["1\tann\t1.5", "2\t\\N\t2.5", "3\tcid\t\\N"]


def test_into_outfile_custom_fields(engine, tmp_path):
    out = str(tmp_path / "t.csv")
    engine.execute(
        f"SELECT id, name FROM t ORDER BY id INTO OUTFILE '{out}' "
        "FIELDS TERMINATED BY ',' ENCLOSED BY '\"' "
        "LINES TERMINATED BY '\n'"
    )
    lines = open(out).read().splitlines()
    assert lines[0] == '"1","ann"'
    assert lines[1].startswith('"2",')  # NULL rendering under quoting


def test_into_outfile_existing_file_errors(engine, tmp_path):
    out = tmp_path / "exists.tsv"
    out.write_text("old")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute(f"SELECT * FROM t INTO OUTFILE '{out}'")
    assert out.read_text() == "old"  # never clobbered


def test_show_table_status(engine):
    rows = {r.Name: r for r in engine.execute("SHOW TABLE STATUS").collect()}
    assert rows["t"].Rows == 3
    assert rows["t"].Engine == "parquet"
    assert rows["t"].Data_length > 0
    like = engine.execute("SHOW TABLE STATUS LIKE 'nope%'").collect()
    assert like == []


def test_ansi_quotes_mode(engine):
    # Without the mode, double quotes are string literals.
    plain = engine.execute('SELECT "name" AS c FROM t LIMIT 1').collect()
    assert plain[0].c == "name"
    engine.execute("SET sql_mode = 'ANSI_QUOTES'")
    quoted = engine.execute(
        'SELECT "name" AS c FROM t WHERE "name" IS NOT NULL ORDER BY id'
    ).collect()
    assert [r.c for r in quoted] == ["ann", "cid"]
    # Doubled quotes inside an ANSI identifier still work as escapes.
    engine.execute("SET sql_mode = ''")
    back = engine.execute('SELECT "name" AS c FROM t LIMIT 1').collect()
    assert back[0].c == "name"


def test_show_databases_and_locks(engine):
    engine.execute("CREATE DATABASE extra")
    dbs = [r.Database for r in engine.execute("SHOW DATABASES").collect()]
    assert "main" in dbs and "extra" in dbs
    r = engine.execute("LOCK TABLES t WRITE")
    assert isinstance(r, OkResult)
    assert isinstance(engine.execute("UNLOCK TABLES"), OkResult)


def test_for_update_stripped_and_row_limit(engine):
    rows = engine.execute("SELECT * FROM t WHERE id = 1 FOR UPDATE").collect()
    assert len(rows) == 1
    engine.execute("SET sql_select_limit = 2")
    assert engine.execute("SELECT * FROM t ORDER BY id").count() == 2
    # An explicit LIMIT wins over the session cap.
    assert engine.execute("SELECT * FROM t LIMIT 3").count() == 3
    engine.execute("SET sql_select_limit = DEFAULT")
    assert engine.execute("SELECT * FROM t").count() == 3


def test_insert_set_form(engine):
    r = engine.execute("INSERT INTO t SET id = 10, name = 'dee', v = 4.5")
    assert r.affected_rows == 1
    row = engine.execute("SELECT * FROM t WHERE id = 10").collect()[0]
    assert (row.name, row.v) == ("dee", 4.5)
    # with ON DUPLICATE KEY UPDATE tail
    engine.execute(
        "INSERT INTO t SET id = 10, name = 'dee2', v = 9.0 "
        "ON DUPLICATE KEY UPDATE v = VALUES(v)"
    )
    row = engine.execute("SELECT * FROM t WHERE id = 10").collect()[0]
    assert (row.name, row.v) == ("dee", 9.0)


def test_update_delete_order_by_limit(engine):
    engine.execute(
        "INSERT INTO t VALUES (11,'x',1.0), (12,'y',2.0), (13,'z',3.0)"
    )
    r = engine.execute(
        "UPDATE t SET v = 0.0 WHERE id >= 11 ORDER BY id DESC LIMIT 2"
    )
    assert r.affected_rows == 2
    vals = {r.id: r.v for r in engine.execute(
        "SELECT id, v FROM t WHERE id >= 11").collect()}
    assert vals == {11: 1.0, 12: 0.0, 13: 0.0}
    r = engine.execute("DELETE FROM t WHERE id >= 11 ORDER BY id LIMIT 1")
    assert r.affected_rows == 1
    left = sorted(r.id for r in engine.execute(
        "SELECT id FROM t WHERE id >= 11").collect())
    assert left == [12, 13]
    # a LIMIT inside a WHERE subquery is not a row cap
    n = engine.execute(
        "DELETE FROM t WHERE id IN (SELECT id FROM t WHERE id >= 13)"
    )
    assert n.affected_rows == 1


def test_read_only_mode_blocks_writes(engine):
    engine.execute("SET GLOBAL read_only = 1")
    try:
        with pytest.raises(ValueError, match="read-only"):
            engine.execute("INSERT INTO t VALUES (99, 'x', 0.0)")
        with pytest.raises(ValueError, match="read-only"):
            engine.execute("CREATE TABLE nope (a INT)")
        # reads and session statements still work
        assert engine.execute("SELECT COUNT(*) AS n FROM t").collect()[0].n
        engine.execute("SHOW TABLES")
    finally:
        engine.execute("SET GLOBAL read_only = 0")
    engine.execute("INSERT INTO t VALUES (99, 'x', 0.0)")
    assert engine.execute(
        "SELECT COUNT(*) AS n FROM t WHERE id = 99").collect()[0].n == 1


def test_analyze_table_persists_stats(engine):
    res = engine.execute("ANALYZE TABLE t").collect()
    assert res[0].Msg_text == "OK" and res[0].Op == "analyze"
    stats = engine.table_meta("t").stats
    assert stats["rows"] == 3
    assert stats["columns"]["id"]["ndv"] >= 3
    assert stats["columns"]["name"]["nulls"] == 1
    assert stats["columns"]["id"]["min"] == "1"
    assert stats["columns"]["id"]["max"] == "3"


def test_observability_shows(engine):
    pl = engine.execute("SHOW PROCESSLIST").collect()
    assert len(pl) == 1 and pl[0].User == "spark"
    eng_rows = engine.execute("SHOW ENGINES").collect()
    assert eng_rows[0].Support == "DEFAULT"
    st = {r.Variable_name: r.Value
          for r in engine.execute("SHOW STATUS").collect()}
    assert "Open_tables" in st
    one = engine.execute("SHOW STATUS LIKE 'Open%'").collect()
    assert len(one) == 1 and one[0].Variable_name == "Open_tables"
    cs = [r.Charset for r in engine.execute("SHOW CHARACTER SET").collect()]
    assert "utf8mb4" in cs
    co = [r.Collation for r in engine.execute(
        "SHOW COLLATION LIKE 'utf8mb4%'").collect()]
    assert "utf8mb4_general_ci" in co


def test_pg_catalog_extended_views(engine, tmp_path):
    engine.execute("CREATE VIEW v_top AS SELECT id FROM t WHERE id > 1")
    engine.execute("CREATE INDEX idx_name ON t (name)")
    views = {r.viewname: r.definition for r in engine.sql(
        "SELECT * FROM pg_catalog.pg_views").collect()}
    assert "v_top" in views and "id > 1" in views["v_top"]
    dbs = [r.datname for r in engine.sql(
        "SELECT * FROM pg_catalog.pg_database").collect()]
    assert "main" in dbs
    idx = {r.indexname: r.indexdef for r in engine.sql(
        "SELECT * FROM pg_catalog.pg_indexes").collect()}
    assert "idx_name" in idx and "USING btree (name)" in idx["idx_name"]


def test_summarize(engine):
    rows = {r.column_name: r for r in engine.execute("SUMMARIZE t").collect()}
    assert set(rows) == {"id", "name", "v"}
    # Row.count is a method — index the 'count' field by name
    assert rows["id"]["count"] == 3 and rows["id"].min == "1"
    assert rows["name"].null_percentage == pytest.approx(33.33, abs=0.01)
    assert rows["v"].approx_unique >= 1


def test_client_handshake_statements(engine):
    """SET NAMES / SET CHARACTER SET / SET TRANSACTION — the
    statements every MySQL client fires on connect must succeed."""
    assert isinstance(engine.execute("SET NAMES utf8mb4"), OkResult)
    assert engine.variables["character_set_client"] == "utf8mb4"
    engine.execute("SET NAMES 'latin1' COLLATE 'latin1_swedish_ci'")
    assert engine.variables["character_set_client"] == "latin1"
    engine.execute("SET CHARACTER SET utf8mb4")
    engine.execute("SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ")
    assert engine.variables["transaction_isolation"] == "REPEATABLE-READ"
    engine.execute("SET TRANSACTION READ ONLY")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="read-only"):
        engine.execute("DELETE FROM t")
    engine.execute("SET TRANSACTION READ WRITE")
    assert engine.execute("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3


def test_cache_table_statements(engine):
    assert engine.execute("CACHE TABLE t") is not None
    assert engine.execute("SELECT COUNT(*) AS n FROM t").collect()[0].n == 3
    engine.execute("UNCACHE TABLE t")
    engine.execute("CLEAR CACHE")


def test_read_only_accepts_onoff_words(engine):
    """SET read_only = OFF/ON/TRUE/FALSE normalize like MySQL booleans;
    a raw truth test on the string 'OFF' left the session permanently
    read-only (ADVICE r2)."""
    engine.execute("SET GLOBAL read_only = ON")
    with pytest.raises(ValueError, match="read-only"):
        engine.execute("INSERT INTO t VALUES (901, 'x', 0.0)")
    engine.execute("SET GLOBAL read_only = OFF")
    engine.execute("INSERT INTO t VALUES (901, 'x', 0.0)")  # must not raise
    engine.execute("SET GLOBAL read_only = 'ON'")
    with pytest.raises(ValueError, match="read-only"):
        engine.execute("DELETE FROM t WHERE id = 901")
    engine.execute("SET GLOBAL read_only = '0'")
    engine.execute("DELETE FROM t WHERE id = 901")


def test_read_only_blocks_copy_from(engine, tmp_path):
    """COPY ... FROM mutates its target table and must respect
    read_only; COPY ... TO stays allowed (it is a read)."""
    import os

    p = os.path.join(str(tmp_path), "in.csv")
    with open(p, "w") as f:
        f.write("902,z,1.5\n")
    out = os.path.join(str(tmp_path), "out.csv")
    engine.execute("SET GLOBAL read_only = 1")
    try:
        with pytest.raises(ValueError, match="read-only"):
            engine.execute(f"COPY t FROM '{p}'")
        engine.execute(f"COPY t TO '{out}' (FORMAT CSV)")  # read: allowed
    finally:
        engine.execute("SET GLOBAL read_only = 0")


def test_update_bare_order_by_no_limit_is_noop_clause(engine):
    """MySQL allows UPDATE/DELETE ... ORDER BY with no LIMIT — the
    ORDER BY is a no-op and must not leak into the WHERE condition
    (ADVICE r2: it previously landed in the WHERE tail and failed in
    F.expr)."""
    engine.execute("INSERT INTO t VALUES (903, 'ob', 1.0)")
    r = engine.execute("UPDATE t SET name = 'ob2' WHERE id = 903 ORDER BY id")
    assert r.affected_rows == 1
    assert engine.execute(
        "SELECT name FROM t WHERE id = 903").collect()[0].name == "ob2"
    d = engine.execute("DELETE FROM t WHERE id = 903 ORDER BY name")
    assert d.affected_rows == 1


def test_savepoint_ddl_not_rolled_back(engine):
    """ROLLBACK TO SAVEPOINT reverts DATA only: a table created after
    the savepoint survives (MySQL: DDL implicitly commits), a table
    dropped after it stays dropped, and no orphan meta files appear
    (ADVICE r2)."""
    engine.execute("CREATE TABLE sp_keep (a INT)")
    engine.execute("BEGIN")
    engine.execute("SAVEPOINT s1")
    engine.execute("CREATE TABLE sp_new (a INT)")
    engine.execute("INSERT INTO sp_new VALUES (1)")
    engine.execute("ROLLBACK TO SAVEPOINT s1")
    # created-after table survives (DDL is not rolled back)
    tables = {r[0] for r in engine.execute("SHOW TABLES").collect()}
    assert "sp_new" in tables
    engine.execute("COMMIT")


def test_show_full_tables_desc_create_view_grants(spark, tmp_path):
    """SHOW FULL TABLES (Table_type), DESC alias, SHOW CREATE VIEW,
    SHOW OPEN TABLES, SHOW GRANTS — the remaining observability forms
    MySQL clients issue on connect."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE st1 (id INT PRIMARY KEY, v INT)")
    e.execute("CREATE VIEW sv1 AS SELECT id FROM st1")
    rows = {
        r[0]: r.Table_type
        for r in e.execute("SHOW FULL TABLES").collect()
    }
    assert rows == {"st1": "BASE TABLE", "sv1": "VIEW"}
    # DESC == DESCRIBE == SHOW COLUMNS
    d = e.execute("DESC st1").collect()
    assert [r.Field for r in d] == ["id", "v"]
    cv = e.execute("SHOW CREATE VIEW sv1").collect()[0]
    assert cv.View == "sv1" and "SELECT id FROM st1" in cv[1]
    ot = e.execute("SHOW OPEN TABLES").collect()
    assert [(r.Table, r.In_use) for r in ot] == [("st1", 0)]
    g = e.execute("SHOW GRANTS").collect()
    assert "GRANT ALL PRIVILEGES" in g[0][0]


def test_show_client_probe_surface(engine):
    """MySQL clients/ORMs issue these between statements; each answers
    with the correct (usually empty) shape instead of erroring the
    session. Triggers/events/routines empty = the truthful catalog
    answer (documented non-goals, GMS-side only in the reference)."""
    cases = {
        "SHOW WARNINGS": (["Level", "Code", "Message"], 0),
        "SHOW ERRORS": (["Level", "Code", "Message"], 0),
        "SHOW TRIGGERS": (None, 0),
        "SHOW EVENTS": (None, 0),
        "SHOW FUNCTION STATUS": (None, 0),
        "SHOW PROCEDURE STATUS": (None, 0),
        "SHOW BINARY LOGS": (["Log_name", "File_size", "Encrypted"], 0),
    }
    for q, (cols, n) in cases.items():
        df = engine.execute(q)
        assert len(df.collect()) == n, q
        if cols:
            assert df.columns == cols, q
    assert engine.execute("SHOW COUNT(*) WARNINGS").collect()[0][0] == 0
    assert len(engine.execute("SHOW PLUGINS").collect()) >= 1
    assert len(engine.execute("SHOW PRIVILEGES").collect()) >= 1


def test_show_fields_alias(engine):
    engine.execute("CREATE TABLE sfa (id INT PRIMARY KEY, v INT)")
    a = [tuple(r) for r in engine.execute("SHOW COLUMNS FROM sfa").collect()]
    b = [tuple(r) for r in engine.execute("SHOW FIELDS FROM sfa").collect()]
    assert a == b and len(a) == 2


def test_maintenance_statements(engine):
    engine.execute("CREATE TABLE mt1 (id INT PRIMARY KEY, v INT)")
    engine.execute("INSERT INTO mt1 VALUES (1, 10), (2, 20)")
    chk = engine.execute("CHECK TABLE mt1").collect()
    assert chk[0].Msg_text == "OK"
    rep = engine.execute("REPAIR TABLE mt1").collect()
    assert rep[0].Msg_text == "OK"
    bad = engine.execute("CHECK TABLE missing_tbl").collect()
    assert bad[0].Msg_type == "Error"
    # CHECKSUM is a real content checksum: stable across calls, changes
    # with the data, order-independent
    c1 = engine.execute("CHECKSUM TABLE mt1").collect()[0].Checksum
    c2 = engine.execute("CHECKSUM TABLE mt1").collect()[0].Checksum
    assert c1 == c2
    engine.execute("INSERT INTO mt1 VALUES (3, 30)")
    c3 = engine.execute("CHECKSUM TABLE mt1").collect()[0].Checksum
    assert c3 != c1
    # sum (not xor) accumulation: a row duplicated an EVEN number of
    # times must NOT cancel back to the original checksum (ADVICE r5)
    engine.execute("CREATE TABLE mt2 (id INT, v INT)")
    engine.execute("INSERT INTO mt2 VALUES (1, 10), (2, 20), (3, 30)")
    base = engine.execute("CHECKSUM TABLE mt2").collect()[0].Checksum
    engine.execute("INSERT INTO mt2 VALUES (1, 10), (1, 10)")
    doubled = engine.execute("CHECKSUM TABLE mt2").collect()[0].Checksum
    assert doubled != base
    # OPTIMIZE TABLE spelling (MySQL) routes to the OPTIMIZE rewrite
    engine.execute("OPTIMIZE TABLE mt1")
    assert engine.execute("SELECT COUNT(*) AS n FROM mt1").collect()[0].n == 3


def test_admin_noops_and_do(engine):
    for q in ("FLUSH TABLES", "FLUSH LOGS", "FLUSH PRIVILEGES",
              "KILL 42", "KILL QUERY 42", "RESET QUERY CACHE"):
        r = engine.execute(q)
        assert r.affected_rows == 0, q
    assert engine.execute("DO 1+1").affected_rows == 0
    import pytest as _pytest
    with _pytest.raises(Exception):
        engine.execute("DO unknown_fn_xyz(1)")


def test_explain_variants(engine):
    engine.execute("CREATE TABLE ex1 (id INT PRIMARY KEY)")
    for q in ("EXPLAIN SELECT * FROM ex1",
              "EXPLAIN FORMAT=TREE SELECT * FROM ex1",
              "EXPLAIN ANALYZE SELECT * FROM ex1"):
        rows = engine.execute(q).collect()
        assert rows and "Scan" in str(rows[0]) or rows, q


def test_txn_access_modifiers(engine):
    engine.execute("CREATE TABLE txm (id INT PRIMARY KEY)")
    engine.execute("START TRANSACTION READ ONLY")
    engine.execute("INSERT INTO txm VALUES (1)")
    engine.execute("COMMIT")
    engine.execute("START TRANSACTION WITH CONSISTENT SNAPSHOT, READ WRITE")
    engine.execute("ROLLBACK")
    assert engine.execute("SELECT COUNT(*) AS n FROM txm").collect()[0].n == 1


def test_temporary_tables(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    wh = str(tmp_path / "whtmp")
    e = Engine(spark, wh)
    e.execute("CREATE TABLE perm (id INT PRIMARY KEY)")
    e.execute("CREATE TEMPORARY TABLE tt (a INT PRIMARY KEY, b INT)")
    e.execute("INSERT INTO tt VALUES (1, 2)")
    e.execute("CREATE TEMPORARY TABLE tt2 AS SELECT * FROM perm")
    # hidden from SHOW TABLES (MySQL semantics), still queryable
    tabs = {r[0] for r in e.execute("SHOW TABLES").collect()}
    assert "perm" in tabs and "tt" not in tabs and "tt2" not in tabs
    assert e.execute("SELECT b FROM tt").collect()[0].b == 2
    e.execute("DROP TEMPORARY TABLE tt2")
    # connection-end semantics: a new engine over the warehouse drops
    # leftover temp tables, permanent ones survive
    e2 = Engine(spark, wh)
    assert {r[0] for r in e2.execute("SHOW TABLES").collect()} == {"perm"}
    import pytest as _pytest
    with _pytest.raises(Exception):
        e2.execute("SELECT * FROM tt").collect()


def test_alter_comment_and_engine_options(engine):
    engine.execute("CREATE TABLE ac (id INT PRIMARY KEY)")
    engine.execute("ALTER TABLE ac COMMENT = 'hello world'")
    assert engine.table_meta("ac").stats.get("comment") == "hello world"
    engine.execute("ALTER TABLE ac ENGINE = InnoDB")  # accepted no-op
    engine.execute("ALTER TABLE ac ROW_FORMAT = DYNAMIC")


def test_select_into_user_vars(engine):
    engine.execute("CREATE TABLE siv (id INT PRIMARY KEY, v INT)")
    engine.execute("INSERT INTO siv VALUES (1, 10), (2, 20)")
    engine.execute("SELECT id, v INTO @si, @sv FROM siv WHERE id = 2")
    row = engine.execute("SELECT @si AS a, @sv + 1 AS b").collect()[0]
    assert (row.a, row.b) == (2, 21)
    # MySQL contract: >1 row errors; 0 rows leaves variables untouched
    with pytest.raises(ValueError, match="more than one row"):
        engine.execute("SELECT id INTO @x FROM siv")
    engine.execute("SELECT id INTO @si FROM siv WHERE id = 999")
    assert engine.execute("SELECT @si AS a").collect()[0].a == 2
    with pytest.raises(ValueError, match="different number"):
        engine.execute("SELECT id, v INTO @only FROM siv WHERE id = 1")


def test_show_create_database_profiles_engine_status(engine):
    r = engine.execute("SHOW CREATE DATABASE main").collect()
    assert r[0][0] == "main" and "CREATE DATABASE" in r[0][1]
    assert engine.execute("SHOW PROFILES").collect() == []
    r = engine.execute("SHOW ENGINE INNODB STATUS").collect()
    assert r[0].Name == "INNODB"


def test_alter_charset_and_index_options(engine):
    engine.execute("CREATE TABLE aco (id INT PRIMARY KEY, name TEXT, v INT)")
    engine.execute("ALTER TABLE aco CONVERT TO CHARACTER SET utf8mb4")
    assert engine.table_meta("aco").stats.get("charset") == "utf8mb4"
    engine.execute(
        "ALTER TABLE aco DEFAULT CHARACTER SET = latin1 COLLATE = latin1_bin"
    )
    assert engine.table_meta("aco").stats.get("charset") == "latin1"
    engine.execute("CREATE INDEX acoix ON aco (name) USING BTREE")
    engine.execute("ALTER TABLE aco ADD INDEX acoix2 (v) VISIBLE")
    engine.execute(
        "CREATE UNIQUE INDEX acoix3 ON aco (id) USING HASH "
        "COMMENT 'c' KEY_BLOCK_SIZE=8"
    )
    names = {r.Key_name for r in
             engine.execute("SHOW INDEXES FROM aco").collect()}
    assert {"acoix", "acoix2", "acoix3"} <= names


def test_describe_single_column(engine):
    engine.execute("CREATE TABLE dsc (id INT PRIMARY KEY, name TEXT)")
    rows = engine.execute("DESCRIBE dsc id").collect()
    assert len(rows) == 1 and rows[0].Field == "id"
    rows = engine.execute("DESC dsc 'na%'").collect()
    assert len(rows) == 1 and rows[0].Field == "name"


def test_charset_introducers_and_dml_modifiers(engine):
    engine.execute("CREATE TABLE cim (id INT PRIMARY KEY, s TEXT)")
    engine.execute("INSERT INTO cim VALUES (1, _utf8mb4'héllo')")
    engine.execute("INSERT INTO cim VALUES (2, N'n-str')")
    engine.execute("INSERT LOW_PRIORITY INTO cim VALUES (3, 'lp')")
    engine.execute("INSERT DELAYED INTO cim VALUES (4, 'dl')")
    engine.execute("UPDATE LOW_PRIORITY cim SET s = 'upd' WHERE id = 3")
    engine.execute("DELETE QUICK FROM cim WHERE id = 4")
    engine.execute("DELETE LOW_PRIORITY IGNORE FROM cim WHERE id = 999")
    got = {r.id: r.s for r in
           engine.execute("SELECT id, s FROM cim").collect()}
    assert got == {1: "héllo", 2: "n-str", 3: "upd"}


def test_mysqldump_create_table_shape(engine):
    engine.execute("""CREATE TABLE `dmp` (
  `id` int NOT NULL AUTO_INCREMENT,
  `name` varchar(100) CHARACTER SET utf8mb4 COLLATE utf8mb4_0900_ai_ci
      DEFAULT NULL,
  `note` text COMMENT 'free text',
  PRIMARY KEY (`id`),
  UNIQUE KEY `uq_name` (`name`),
  KEY `ix_note` (`name`) USING BTREE
) ENGINE=InnoDB AUTO_INCREMENT=7 DEFAULT CHARSET=utf8mb4
  COLLATE=utf8mb4_0900_ai_ci COMMENT='dump table'""")
    meta = engine.table_meta("dmp")
    assert meta.stats.get("auto_increment_base") == 7
    assert meta.stats.get("comment") == "dump table"
    assert meta.stats.get("charset") == "utf8mb4"
    # the AUTO_INCREMENT=7 option floors the counter (MySQL semantics)
    engine.execute("INSERT INTO dmp (name) VALUES ('x')")
    assert engine.execute("SELECT id FROM dmp").collect()[0].id == 7
    engine.execute("ALTER TABLE dmp AUTO_INCREMENT = 100")
    engine.execute("INSERT INTO dmp (name) VALUES ('y')")
    ids = sorted(r.id for r in engine.execute("SELECT id FROM dmp").collect())
    assert ids == [7, 100]


def test_mysql_range_list_partition_clauses(engine):
    engine.execute("""CREATE TABLE prt (id INT PRIMARY KEY, d DATE)
PARTITION BY RANGE (YEAR(d)) (
  PARTITION p0 VALUES LESS THAN (2020),
  PARTITION p1 VALUES LESS THAN (2021),
  PARTITION pmax VALUES LESS THAN MAXVALUE)""")
    # realized as value partitioning on the underlying column — pruning
    # on d subsumes the RANGE bounds
    assert engine.table_meta("prt").partition_by == ["d"]
    engine.execute(
        "INSERT INTO prt VALUES (1, DATE'2019-05-01'), (2, DATE'2020-06-01')"
    )
    assert engine.execute(
        "SELECT COUNT(*) AS n FROM prt WHERE d >= DATE'2020-01-01'"
    ).collect()[0].n == 1
    engine.execute("""CREATE TABLE plst (id INT PRIMARY KEY, rgn VARCHAR(4))
PARTITION BY LIST COLUMNS(rgn) (
  PARTITION pa VALUES IN ('a'), PARTITION pb VALUES IN ('b'))""")
    assert engine.table_meta("plst").partition_by == ["rgn"]


def test_view_attribute_clauses(engine):
    engine.execute(
        "CREATE ALGORITHM=UNDEFINED DEFINER=`root`@`localhost` "
        "SQL SECURITY DEFINER VIEW vattr AS SELECT 11 AS one"
    )
    assert engine.execute("SELECT one FROM vattr").collect()[0].one == 11
    engine.execute(
        "CREATE OR REPLACE ALGORITHM=MERGE VIEW vattr AS SELECT 22 AS one"
    )
    assert engine.execute("SELECT one FROM vattr").collect()[0].one == 22


def test_insert_values_with_expressions(engine):
    engine.execute("CREATE TABLE ivx (id INT PRIMARY KEY, s TEXT, v INT)")
    engine.execute(
        "INSERT INTO ivx VALUES (1, UPPER('ab'), 1+2), "
        "(2, CONCAT('x', 'y'), FLOOR(7.9))"
    )
    got = {r.id: (r.s, r.v) for r in
           engine.execute("SELECT * FROM ivx").collect()}
    assert got == {1: ("AB", 3), 2: ("xy", 7)}
    # literal-only fast path still handles DEFAULT keywords
    engine.execute("ALTER TABLE ivx ALTER COLUMN v SET DEFAULT 9")
    engine.execute("INSERT INTO ivx VALUES (3, 'z', DEFAULT)")
    assert engine.execute(
        "SELECT v FROM ivx WHERE id = 3"
    ).collect()[0].v == 9


def test_connector_probe_shapes(engine):
    assert engine.execute("SELECT 1 FROM DUAL").collect()[0][0] == 1
    assert engine.execute(
        "SELECT 1+1 AS x FROM DUAL WHERE 1 = 1"
    ).collect()[0].x == 2
    assert "spark" in engine.execute(
        "SELECT @@version_comment AS v"
    ).collect()[0].v
    assert len(engine.execute("SHOW STORAGE ENGINES").collect()) == 1


def test_xa_transaction_lifecycle(engine):
    engine.execute("CREATE TABLE xat (id INT PRIMARY KEY)")
    engine.execute("XA START 'b1'")
    engine.execute("INSERT INTO xat VALUES (1)")
    engine.execute("XA END 'b1'")
    engine.execute("XA PREPARE 'b1'")
    engine.execute("XA COMMIT 'b1'")
    assert engine.execute(
        "SELECT COUNT(*) AS n FROM xat"
    ).collect()[0].n == 1
    engine.execute("XA START 'b2'")
    engine.execute("INSERT INTO xat VALUES (2)")
    engine.execute("XA ROLLBACK 'b2'")
    assert engine.execute(
        "SELECT COUNT(*) AS n FROM xat"
    ).collect()[0].n == 1
    assert engine.execute("XA RECOVER").collect() == []


def test_user_grant_catalog(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    wh = str(tmp_path / "whusers")
    e = Engine(spark, wh)
    e.execute("CREATE USER 'app'@'10.0.%' IDENTIFIED BY 'secret'")
    e.execute("CREATE USER IF NOT EXISTS 'app'@'10.0.%'")
    e.execute("CREATE USER reporter")
    e.execute("GRANT SELECT, INSERT ON shop.* TO 'app'@'10.0.%'")
    e.execute("GRANT ALL PRIVILEGES ON *.* TO reporter WITH GRANT OPTION")
    rows = [r[0] for r in
            e.execute("SHOW GRANTS FOR 'app'@'10.0.%'").collect()]
    assert rows == [
        "GRANT USAGE ON *.* TO 'app'@'10.0.%'",
        "GRANT SELECT, INSERT ON shop.* TO 'app'@'10.0.%'",
    ]
    rows = [r[0] for r in
            e.execute("SHOW GRANTS FOR reporter").collect()]
    assert rows[1].endswith("WITH GRANT OPTION")
    e.execute("REVOKE SELECT, INSERT ON shop.* FROM 'app'@'10.0.%'")
    assert len(e.execute(
        "SHOW GRANTS FOR 'app'@'10.0.%'"
    ).collect()) == 1
    # persists across engine instances; DROP removes
    e2 = Engine(spark, wh)
    e2.execute("DROP USER 'app'@'10.0.%'")
    import pytest as _p
    with _p.raises(ValueError):
        e2.execute("SHOW GRANTS FOR 'app'@'10.0.%'")
    e2.execute("DROP USER IF EXISTS 'app'@'10.0.%'")
    # account-attribute statements are accepted no-ops
    e2.execute("ALTER USER reporter IDENTIFIED BY 'x'")
    # plain SHOW GRANTS still answers for the session principal
    assert "root" in e2.execute("SHOW GRANTS").collect()[0][0]


def test_event_registry_and_manual_fire(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    wh = str(tmp_path / "whev")
    e = Engine(spark, wh)
    e.execute("CREATE TABLE heartbeat (ts INT)")
    e.execute(
        "CREATE EVENT beat ON SCHEDULE EVERY 1 HOUR "
        "COMMENT 'hourly ping' DO INSERT INTO heartbeat VALUES (1)"
    )
    rows = e.execute("SHOW EVENTS").collect()
    assert [(r.Name, r.Type, r[6], r[7], r.Status) for r in rows] == \
        [("beat", "RECURRING", "1", "HOUR", "ENABLED")]
    # the host scheduler fires it; body runs set-based like any DML
    e.run_event("beat")
    e.run_event("beat")
    assert e.execute(
        "SELECT COUNT(*) AS n FROM heartbeat"
    ).collect()[0].n == 2
    e.execute("ALTER EVENT beat DISABLE")
    import pytest as _p
    with _p.raises(ValueError, match="DISABLED"):
        e.run_event("beat")
    # persists; drop removes
    e2 = Engine(spark, wh)
    assert [r.Name for r in e2.execute("SHOW EVENTS").collect()] == ["beat"]
    e2.execute("DROP EVENT beat")
    assert e2.execute("SHOW EVENTS").collect() == []
    e2.execute("DROP EVENT IF EXISTS beat")


def test_cross_database_qualification(spark, tmp_path):
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "whxdb"))
    e.execute("CREATE DATABASE db2")
    e.execute("CREATE TABLE local_t (id INT PRIMARY KEY)")
    e.execute("INSERT INTO local_t VALUES (1)")
    # DDL/DML with a qualified target execute under that db's context
    e.execute("CREATE TABLE db2.remote_t (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO db2.remote_t VALUES (10, 100)")
    assert e.current_db == "main"
    # reads + cross-db joins resolve through on-demand mangled views
    assert e.execute(
        "SELECT v FROM db2.remote_t"
    ).collect()[0].v == 100
    row = e.execute(
        "SELECT m.id, r.v FROM local_t m "
        "JOIN db2.remote_t r ON r.id = m.id * 10"
    ).collect()[0]
    assert (row.id, row.v) == (1, 100)
    # the view cache tracks versions: post-UPDATE reads see new data
    e.execute("UPDATE db2.remote_t SET v = 101 WHERE id = 10")
    assert e.execute(
        "SELECT v FROM db2.remote_t"
    ).collect()[0].v == 101
    tabs = [r[0] for r in e.execute("SHOW TABLES FROM db2").collect()]
    assert tabs == ["remote_t"]
    assert [r[0] for r in
            e.execute("SHOW TABLES IN db2 LIKE 'zz%'").collect()] == []
    assert e.execute(
        "DESCRIBE db2.remote_t"
    ).collect()[0].Field == "id"
    e.execute("DROP TABLE db2.remote_t")
    assert e.execute("SHOW TABLES FROM db2").collect() == []
    # current-db state is untouched throughout
    assert e.execute("SELECT COUNT(*) AS n FROM local_t").collect()[0].n == 1


def test_privilege_enforcement_when_principal_set(spark, tmp_path):
    """Grants ENFORCE once the host switches the session principal
    (set_session_user — what a wire layer does at connect; reference
    enforces via plugin/auth.go + GMS checks). The default principal
    stays unrestricted, so library use is unchanged."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t1 (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO t1 VALUES (1, 10)")
    e.execute("CREATE TABLE t2 (id INT PRIMARY KEY)")
    e.execute("CREATE USER 'app'@'%'")
    e.execute("GRANT SELECT, INSERT ON t1 TO 'app'@'%'")

    with pytest.raises(PermissionError, match="Access denied"):
        e.set_session_user("ghost")  # unknown principal refused
    e.set_session_user("'app'@'%'")
    try:
        # allowed: reads, and INSERT on the granted table
        assert e.execute("SELECT v FROM t1").collect()[0].v == 10
        e.execute("INSERT INTO t1 VALUES (2, 20)")
        # denied: UPDATE (not granted), INSERT on another table, DDL
        with pytest.raises(PermissionError, match="UPDATE command denied"):
            e.execute("UPDATE t1 SET v = 0")
        with pytest.raises(PermissionError, match="INSERT command denied"):
            e.execute("INSERT INTO t2 VALUES (1)")
        with pytest.raises(PermissionError, match="DROP command denied"):
            e.execute("DROP TABLE t2")
        with pytest.raises(PermissionError, match="CREATE command denied"):
            e.execute("CREATE TABLE t3 (id INT)")
        # account management needs the unrestricted principal
        with pytest.raises(PermissionError, match="account management"):
            e.execute("GRANT ALL ON *.* TO 'app'@'%'")
    finally:
        e.set_session_user(None)
    # root mode: everything allowed again; REVOKE takes effect live
    e.execute("UPDATE t1 SET v = 0 WHERE id = 1")
    e.execute("REVOKE SELECT, INSERT ON t1 FROM 'app'@'%'")
    e.set_session_user("'app'@'%'")
    try:
        with pytest.raises(PermissionError, match="SELECT command denied"):
            e.execute("SELECT * FROM t1")
    finally:
        e.set_session_user(None)


def test_privilege_scopes_db_and_global(spark, tmp_path):
    """*.* and db.* grant scopes resolve against the session db."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t1 (id INT PRIMARY KEY)")
    e.execute("CREATE USER reporter")
    e.execute("GRANT SELECT ON *.* TO reporter")
    e.set_session_user("reporter")
    try:
        e.execute("SELECT * FROM t1")  # global read scope
        with pytest.raises(PermissionError, match="INSERT command denied"):
            e.execute("INSERT INTO t1 VALUES (1)")
    finally:
        e.set_session_user(None)
    # ALL PRIVILEGES on db.* admits DML + DDL within the database
    e.execute("CREATE USER writer")
    db = e.current_db
    e.execute(f"GRANT ALL PRIVILEGES ON {db}.* TO writer")
    e.set_session_user("writer")
    try:
        e.execute("INSERT INTO t1 VALUES (5)")
        e.execute("CREATE TABLE t9 (id INT)")
        e.execute("DROP TABLE t9")
    finally:
        e.set_session_user(None)


def test_event_tick_every_and_at_schedules(spark, tmp_path):
    """event_tick fires EVERY-interval events when elapsed (first tick
    counts) and AT one-shots exactly once (then DISABLED) — the
    engine-owned half of MySQL's event scheduler (reference runs
    events GMS-side on a timer, main_test.go:1083)."""
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE beats (src VARCHAR(10))")
    e.execute("CREATE EVENT hb ON SCHEDULE EVERY 10 SECOND DO "
              "INSERT INTO beats VALUES ('every')")
    e.execute("CREATE EVENT once ON SCHEDULE AT '2020-01-01 00:00:00' "
              "DO INSERT INTO beats VALUES ('at')")
    t0 = 1_770_000_000.0  # 2026 — past the AT timestamp
    assert sorted(e.event_tick(now=t0)) == ["hb", "once"]
    # within the interval: nothing fires; the AT event stays done
    assert e.event_tick(now=t0 + 5) == []
    rows = sorted(r.src for r in
                  e.execute("SELECT * FROM beats").collect())
    assert rows == ["at", "every"]
    # interval elapsed: EVERY fires again, AT does not
    assert e.event_tick(now=t0 + 11) == ["hb"]
    st = {r[1]: r[4] for r in e.execute("SHOW EVENTS").collect()}
    assert st["once"] == "ONE TIME"
    # DISABLE is honored
    e.execute("ALTER EVENT hb DISABLE")
    assert e.event_tick(now=t0 + 100) == []
    # STARTS defers the first firing; ENDS disables past the window
    e.execute("CREATE EVENT windowed ON SCHEDULE EVERY 1 SECOND "
              "STARTS '2026-02-01 00:00:00' ENDS '2026-03-01 00:00:00' "
              "DO INSERT INTO beats VALUES ('win')")
    import datetime as dt

    def ts(s):
        return dt.datetime.fromisoformat(s).replace(
            tzinfo=dt.timezone.utc).timestamp()

    assert e.event_tick(now=ts("2026-01-15 00:00:00")) == []
    assert e.event_tick(now=ts("2026-02-02 00:00:00")) == ["windowed"]
    assert e.event_tick(now=ts("2026-03-02 00:00:00")) == []
    st = {r[1]: r[10] for r in e.execute("SHOW EVENTS").collect()}
    assert st["windowed"] == "DISABLED"


def test_event_scheduler_daemon(spark, tmp_path):
    """start_event_scheduler drives event_tick from a daemon thread."""
    import time as _t

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE beats (n INT)")
    e.execute("CREATE EVENT hb ON SCHEDULE EVERY 1 SECOND DO "
              "INSERT INTO beats VALUES (1)")
    e.start_event_scheduler(interval=0.2)
    try:
        deadline = _t.time() + 15
        while _t.time() < deadline:
            if e.execute("SELECT COUNT(*) AS n FROM beats"
                         ).collect()[0].n >= 1:
                break
            _t.sleep(0.3)
        assert e.execute("SELECT COUNT(*) AS n FROM beats"
                         ).collect()[0].n >= 1
        assert not getattr(e, "event_errors", [])
    finally:
        e.stop_event_scheduler()


def test_user_functions_reflect_session_principal(spark, tmp_path):
    """USER()/CURRENT_USER()/bare CURRENT_USER constant-fold to the
    session principal (client connection probes; MySQL evaluates these
    engine-side like DATABASE())."""
    e = Engine(spark, str(tmp_path / "wh"))
    r = e.execute(
        "SELECT USER() AS u, CURRENT_USER() AS cu, CURRENT_USER AS b"
    ).collect()[0]
    assert (r.u, r.cu, r.b) == ("root@localhost",) * 3
    e.execute("CREATE USER 'app'@'%'")
    e.execute("GRANT SELECT ON *.* TO 'app'@'%'")
    e.set_session_user("'app'@'%'")
    try:
        assert e.execute(
            "SELECT CURRENT_USER() AS cu"
        ).collect()[0].cu == "app@%"
    finally:
        e.set_session_user(None)
    # literal text inside strings is untouched
    assert e.execute(
        "SELECT 'CURRENT_USER() stays' AS s"
    ).collect()[0].s == "CURRENT_USER() stays"


def test_insert_ignore_leaves_warning(spark, tmp_path):
    """INSERT IGNORE duplicate conflicts surface in SHOW WARNINGS
    (MySQL reports each ignored conflict; code 1062)."""
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO t VALUES (1, 10)")
    r = e.execute("INSERT IGNORE INTO t VALUES (1, 99), (2, 20)")
    assert r.affected_rows == 1
    notes = e.execute("SHOW WARNINGS").collect()
    assert any(w.Code == 1062 and "1 row(s) skipped" in w.Message
               for w in notes)
    assert e.execute(
        "SHOW COUNT(*) WARNINGS"
    ).collect()[0][0] == 1
    # a clean statement resets the diagnostics area
    e.execute("INSERT IGNORE INTO t VALUES (3, 30)")
    assert e.execute("SHOW WARNINGS").collect() == []


def test_time_uuid_inet6_function_batch(engine):
    """Round-7 shim batch, values from the MySQL 8 reference manual:
    TIMEDIFF/ADDTIME/SUBTIME/MAKETIME (TIME-as-string arithmetic),
    IS_UUID/UUID_TO_BIN/BIN_TO_UUID (incl. the swap flag), and
    INET6_ATON/INET6_NTOA (stdlib-ipaddress scalar UDFs)."""
    cases = [
        ("TIMEDIFF('2000-01-01 00:00:00','2000-01-01 00:00:30')",
         "-00:00:30"),
        ("TIMEDIFF('2008-12-31 23:59:59','2008-12-30 01:01:01')",
         "46:58:58"),
        ("ADDTIME('01:00:00','00:30:00')", "01:30:00"),
        ("ADDTIME('2007-12-31 23:59:59','0:0:1')", "2008-01-01 00:00:00"),
        ("SUBTIME('01:00:00','00:30:00')", "00:30:00"),
        ("MAKETIME(-1,30,30)", "-01:30:30"),
        ("IS_UUID('6ccd780c-baba-1026-9564-5b8c656024db')", 1),
        ("IS_UUID('6ccd780cbaba102695645b8c656024db')", 1),
        ("IS_UUID('nope')", 0),
        ("BIN_TO_UUID(UUID_TO_BIN('6ccd780c-baba-1026-9564-"
         "5b8c656024db', 1), 1)", "6ccd780c-baba-1026-9564-5b8c656024db"),
        ("HEX(UUID_TO_BIN('6ccd780c-baba-1026-9564-5b8c656024db', 1))",
         "1026BABA6CCD780C95645B8C656024DB"),
        ("INET6_NTOA(INET6_ATON('fdfe::5a55:caff:fefa:9089'))",
         "fdfe::5a55:caff:fefa:9089"),
        ("INET6_NTOA(INET6_ATON('10.0.5.9'))", "10.0.5.9"),
        ("INET6_ATON('garbage')", None),
    ]
    for expr, want in cases:
        got = engine.execute(f"SELECT {expr} AS x").collect()[0].x
        assert got == want, f"{expr}: {got!r} != {want!r}"


def test_extract_composite_units(engine):
    """MySQL composite EXTRACT units (manual's temporal-interval
    table): positional-decimal sums, integer-typed."""
    cases = [
        ("EXTRACT(YEAR_MONTH FROM '2019-07-02 01:02:03')", 201907),
        ("EXTRACT(DAY_HOUR FROM '2019-07-02 01:02:03')", 201),
        ("EXTRACT(DAY_MINUTE FROM '2019-07-02 01:02:03')", 20102),
        ("EXTRACT(DAY_SECOND FROM '2019-07-02 01:02:03')", 2010203),
        ("EXTRACT(HOUR_MINUTE FROM '2019-07-02 01:02:03')", 102),
        ("EXTRACT(HOUR_SECOND FROM '2019-07-02 01:02:03')", 10203),
        ("EXTRACT(MINUTE_SECOND FROM '2019-07-02 01:02:03')", 203),
        ("EXTRACT(YEAR FROM '2019-07-02')", 2019),  # simple: untouched
    ]
    for expr, want in cases:
        got = engine.execute(f"SELECT {expr} AS x").collect()[0].x
        assert got == want, f"{expr}: {got!r} != {want!r}"


def test_common_dump_statement_forms(spark, tmp_path):
    """Round-8 statement-form sweep (shapes mysqldump / ORMs emit):
    CREATE TABLE ... SELECT without AS, INSERT VALUES ROW(), INSERT
    with a parenthesized query source, parenthesized set-op operands
    as a whole statement, EXPLAIN <table> = DESCRIBE, ALTER TABLE
    ORDER BY as an accepted physical-sort no-op, INSERT ... TABLE."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
    # CTAS without AS (plain and TEMPORARY)
    e.execute("CREATE TABLE c1 SELECT id, v FROM t")
    assert e.execute("SELECT COUNT(*) AS n FROM c1").collect()[0].n == 2
    e.execute("CREATE TEMPORARY TABLE c2 SELECT * FROM t WHERE id = 1")
    assert e.execute("SELECT COUNT(*) AS n FROM c2").collect()[0].n == 1
    # MySQL 8 row constructors in INSERT
    e.execute("INSERT INTO t VALUES ROW(3, 30), ROW(4, 40)")
    # parenthesized query source
    e.execute("INSERT INTO c1 (SELECT id + 100, v FROM t WHERE id = 2)")
    assert sorted(
        x.id for x in e.execute("SELECT id FROM c1").collect()
    ) == [1, 2, 102]
    # INSERT ... TABLE (MySQL 8)
    e.execute("CREATE TABLE c3 (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO c3 TABLE t")
    assert e.execute("SELECT COUNT(*) AS n FROM c3").collect()[0].n == 4
    # parenthesized set-op operands (the MySQL way to ORDER/LIMIT arms)
    rows = e.execute(
        "(SELECT id FROM t ORDER BY id LIMIT 1) UNION ALL "
        "(SELECT id FROM t ORDER BY id DESC LIMIT 1)"
    ).collect()
    assert sorted(r.id for r in rows) == [1, 4]
    # a fully parenthesized single query is unwrapped
    assert e.execute(
        "(SELECT id FROM t ORDER BY id LIMIT 1)").collect()[0].id == 1
    # EXPLAIN <table> = DESCRIBE <table>; EXPLAIN <query> still a plan
    cols = {r[0] for r in e.execute("EXPLAIN t").collect()}
    assert cols == {"id", "v"}
    assert e.execute("EXPLAIN SELECT 1").count() >= 1
    # ALTER TABLE ORDER BY: accepted no-op, alone or in an action list
    e.execute("ALTER TABLE t ORDER BY id, v")
    e.execute("ALTER TABLE t ADD COLUMN z INT, ORDER BY id")
    assert "z" in e.execute("SELECT * FROM t").columns


def test_round8_function_semantics_batch(spark, tmp_path):
    """Round-8 function corrections, MySQL-manual-verified values:
    STR_TO_DATE parses 1-2 digit fields (%m/%d/%H/%i/%s are tolerant
    in MySQL; Java's two-letter tokens are not), CONVERT_TZ with
    offsets and named zones, two-arg ATAN = ATAN2, and LEAST/GREATEST
    returning NULL when ANY argument is NULL (Spark skips NULLs)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    one = lambda q: e.execute(q).collect()[0][0]  # noqa: E731
    import datetime as dt

    assert one("SELECT STR_TO_DATE('01,5,2013','%d,%m,%Y') AS d") \
        == dt.datetime(2013, 5, 1)
    assert one("SELECT STR_TO_DATE('2013-05-01','%Y-%m-%d') AS d") \
        == dt.datetime(2013, 5, 1)
    assert one("SELECT STR_TO_DATE('9:5:1','%H:%i:%s') AS d") \
        == dt.datetime(1970, 1, 1, 9, 5, 1)
    # formatting stays zero-padded
    assert one("SELECT DATE_FORMAT('2024-05-01','%m/%d') AS f") == "05/01"
    assert one("SELECT CONVERT_TZ('2024-01-01 12:00:00', "
               "'+00:00', '+05:00') AS t") == dt.datetime(2024, 1, 1, 17)
    assert one("SELECT CONVERT_TZ('2024-01-01 12:00:00', "
               "'UTC', 'US/Eastern') AS t") == dt.datetime(2024, 1, 1, 7)
    assert abs(one("SELECT ATAN(-2, 2) AS a") + 0.7853981633974483) < 1e-12
    assert abs(one("SELECT ATAN(1) AS a") - 0.7853981633974483) < 1e-12
    assert one("SELECT LEAST(1, NULL) AS l") is None
    assert one("SELECT GREATEST(1, NULL, 2) AS g") is None
    assert one("SELECT LEAST(3, 1, 2) AS l") == 1
    assert one("SELECT GREATEST(v, 5) AS g FROM (SELECT 9 AS v) q") == 9


def test_round8_function_semantics_batch2(spark, tmp_path):
    """Second round-8 batch, MySQL-manual-verified: string-literal
    bases in interval arithmetic (DATE_ADD('2024-01-31', INTERVAL 1
    MONTH) = 2024-02-29), infix intervals with expression counts,
    TIME(), QUOTE(NULL) = 'NULL', integer SIGN, byte-counting LENGTH,
    and rounding numeric CAST AS SIGNED."""
    import datetime as dt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    one = lambda q: e.execute(q).collect()[0][0]  # noqa: E731
    assert one("SELECT DATE_ADD('2024-01-31', INTERVAL 1 MONTH) AS x") \
        == dt.date(2024, 2, 29)
    assert one("SELECT '2024-01-31' + INTERVAL n DAY AS x "
               "FROM (SELECT 1 AS n) q") == dt.date(2024, 2, 1)
    assert one("SELECT d + INTERVAL n + 1 DAY AS x FROM "
               "(SELECT DATE'2024-01-01' AS d, 1 AS n) q") \
        == dt.date(2024, 1, 3)
    assert one("SELECT TIME('2024-01-01 11:22:33') AS x") == "11:22:33"
    assert one("SELECT TIME('11:22:33') AS x") == "11:22:33"
    assert one("SELECT QUOTE(NULL) AS x") == "NULL"
    v = one("SELECT SIGN(-3) AS x")
    assert v == -1 and isinstance(v, int)
    assert one("SELECT LENGTH('héllo') AS x") == 6   # bytes
    assert one("SELECT CHAR_LENGTH('héllo') AS x") == 5
    assert one("SELECT CAST(1.7 AS SIGNED) AS x") == 2
    assert one("SELECT CAST(-2.5 AS SIGNED) AS x") == -3
    assert one("SELECT CAST('1.7' AS SIGNED) AS x") == 1  # strings truncate


def test_alter_view_and_sysvar_scopes(spark, tmp_path):
    """ALTER VIEW redefines like CREATE OR REPLACE (MySQL 15.1.11,
    attribute clauses accepted and dropped); @@session.x / @@global.x
    are scope spellings of the same system variable."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    e.execute("INSERT INTO t VALUES (1, 5)")
    e.execute("CREATE VIEW vw AS SELECT id FROM t")
    e.execute("ALTER VIEW vw AS SELECT id, v FROM t")
    assert e.execute("SELECT * FROM vw").columns == ["id", "v"]
    e.execute("ALTER ALGORITHM=MERGE DEFINER=`root`@`%` "
              "SQL SECURITY DEFINER VIEW vw AS SELECT v FROM t")
    assert e.execute("SELECT * FROM vw").columns == ["v"]
    r = e.execute("SELECT @@session.autocommit AS a, "
                  "@@GLOBAL.sql_mode IS NOT NULL AS g, "
                  "@@autocommit AS p").collect()[0]
    assert (r.a, r.g, r.p) == (1, True, 1)


def test_help_binlog_events_groups_frame(spark, tmp_path):
    """HELP returns a pointer row (keeps interactive clients
    functional); SHOW BINLOG EVENTS renders applied-position markers;
    GROUPS window frames on supported shapes now REWRITE (round-8
    verdict item #5); unsupported shapes (GROUP BY in the same block)
    still reject with the actionable message."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    row = e.execute("HELP 'SELECT'").collect()[0]
    assert row.name == "SELECT" and "doc" in row.description
    assert e.execute("SHOW BINLOG EVENTS").columns[:3] == [
        "Log_name", "Pos", "Event_type"]
    for i, v in enumerate([1, 1, 2, 5]):
        e.execute(f"INSERT INTO t VALUES ({i}, {v})")
    # GROUPS = peer-group offsets: for v=[1,1,2,5], 1-group-preceding
    # sums are [2,2,4,7] (both v=1 rows share a group)
    got = {
        r.id: r.s
        for r in e.execute(
            "SELECT id, SUM(v) OVER (ORDER BY v GROUPS BETWEEN 1 "
            "PRECEDING AND CURRENT ROW) AS s FROM t"
        ).collect()
    }
    assert got == {0: 2, 1: 2, 2: 4, 3: 7}
    # unsupported shape (GROUP BY in the block) keeps the clear error
    with pytest.raises(NotImplementedError, match="GROUPS"):
        e.execute("SELECT SUM(MAX(v)) OVER (ORDER BY id GROUPS BETWEEN "
                  "1 PRECEDING AND CURRENT ROW) FROM t GROUP BY id")


def test_groups_frames_vs_python_reference(spark, tmp_path):
    """GROUPS frame rewrite (RANGE over an injected dense_rank key)
    differential-tested against an independent pure-Python frame
    evaluator on ties-heavy data — partitioned, unpartitioned,
    shorthand, UNBOUNDED, FOLLOWING-only, and named-window forms.
    (DuckDB in this image rejects GROUPS mode, so the oracle is
    Python, not SQL.)"""
    import numpy as np
    import pandas as pd

    from myduckserver_spark.functions.mysql_compat import translate_mysql

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "id": range(150),
        "g": rng.randint(0, 3, 150),
        "v": rng.randint(0, 6, 150),
        "x": rng.randn(150).round(3),
    })
    spark.createDataFrame(df).createOrReplaceTempView("gt")

    def py_groups(data, part, order, val, a, b, fn):
        out = pd.Series(index=data.index, dtype="float64")
        chunks = data.groupby(part) if part else [(None, data)]
        for _, gdf in chunks:
            r = gdf[order].rank(method="dense").astype(int)
            for idx in gdf.index:
                lo = r[idx] - a if a is not None else -(10 ** 9)
                hi = r[idx] + b if b is not None else 10 ** 9
                out[idx] = fn(gdf[(r >= lo) & (r <= hi)][val])
        return out

    base = df.set_index("id")
    cases = [
        ("SELECT id, SUM(x) OVER (PARTITION BY g ORDER BY v GROUPS "
         "BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS r FROM gt",
         ("g", "v", "x", 1, 1, np.sum)),
        ("SELECT id, COUNT(*) OVER (ORDER BY v GROUPS 2 PRECEDING) "
         "AS r FROM gt", (None, "v", "x", 2, 0, len)),
        ("SELECT id, AVG(x) OVER (ORDER BY v GROUPS BETWEEN UNBOUNDED "
         "PRECEDING AND CURRENT ROW) AS r FROM gt",
         (None, "v", "x", None, 0, np.mean)),
        ("SELECT id, MIN(x) OVER (PARTITION BY g ORDER BY v GROUPS "
         "BETWEEN CURRENT ROW AND 2 FOLLOWING) AS r FROM gt",
         ("g", "v", "x", 0, 2, np.min)),
        ("SELECT id, SUM(v) OVER w AS r FROM gt WINDOW w AS "
         "(PARTITION BY g ORDER BY v GROUPS BETWEEN 1 PRECEDING AND "
         "CURRENT ROW)", ("g", "v", "v", 1, 0, np.sum)),
    ]
    for sql, (part, order, val, a, b, fn) in cases:
        got = (spark.sql(translate_mysql(sql)).toPandas()
               .set_index("id")["r"].sort_index())
        want = py_groups(base, part, order, val, a, b, fn).sort_index()
        assert np.allclose(got, want), sql


def test_set_multi_assignment_and_expressions(spark, tmp_path):
    """SET applies a comma list left-to-right with earlier assignments
    visible (MySQL); expression values EVALUATE (previously the raw
    text was stored); bare-word enum values stay strings; DEFAULT
    resets."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("SET @a = 1, @b = @a + 1, @c = CONCAT('x', 'y')")
    r = e.execute("SELECT @a AS a, @b AS b, @c AS c").collect()[0]
    assert (r.a, r.b, r.c) == (1, 2, "xy")
    e.execute("SET @d = (SELECT 2 + 3)")
    assert e.execute("SELECT @d AS d").collect()[0].d == 5
    e.execute("SET character_set_client = utf8mb4")
    assert e.variables.get("character_set_client") == "utf8mb4"
    e.execute("SET autocommit = 0, sql_mode = 'STRICT_TRANS_TABLES'")
    assert e.variables.get("autocommit") == 0
    e.execute("SET sql_mode = CONCAT(@@sql_mode, ',ANSI_QUOTES')")
    assert e.variables.get("sql_mode") == "STRICT_TRANS_TABLES,ANSI_QUOTES"
    e.execute("SET @d = DEFAULT")
    assert e.execute("SELECT @d AS d").collect()[0].d is None


def test_xml_functions(spark, tmp_path):
    """ExtractValue / UpdateXML for the MySQL-manual XPath subset
    (round-8 verdict item #7); LOAD XML rejects with an actionable
    message; unsupported XPath axes reject clearly."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))

    def v(q):
        return e.execute(q).collect()[0][0]

    # MySQL manual 14.11 examples
    assert v("SELECT ExtractValue('<a><b>X</b><b>Y</b></a>', '/a/b')") \
        == "X Y"
    assert v("SELECT ExtractValue('<a><b>X</b><c><b>Z</b></c></a>', "
             "'//b')") == "X Z"
    assert v("SELECT ExtractValue('<a><b>X</b><b>Y</b></a>', "
             "'/a/b[2]')") == "Y"
    assert v("SELECT ExtractValue('<a att=\"5\"><b>X</b></a>', "
             "'/a/@att')") == "5"
    assert v("SELECT UpdateXML('<a><b>ccc</b><d></d></a>', '/a/b', "
             "'<e>fff</e>')") == "<a><e>fff</e><d /></a>"
    assert v("SELECT UpdateXML('<a><b>ccc</b><d></d></a>', '/a', "
             "'<e>fff</e>')") == "<e>fff</e>"
    # zero or multiple matches: original document unchanged
    assert v("SELECT UpdateXML('<a><d></d><b>c</b><d></d></a>', "
             "'/a/d', '<e>f</e>')") == "<a><d></d><b>c</b><d></d></a>"
    # raw-text replacement splices where the element was
    assert v("SELECT UpdateXML('<a><b>x</b><c>y</c></a>', '/a/b', "
             "'plain')") == "<a>plain<c>y</c></a>"
    # non-XML target: empty per MySQL's tolerant behavior
    assert v("SELECT ExtractValue('not xml', '/a')") == ""
    with pytest.raises(NotImplementedError, match="LOAD XML"):
        e.execute("LOAD XML INFILE 'f.xml' INTO TABLE t")
    with pytest.raises(Exception):
        v("SELECT ExtractValue('<a/>', 'count(/a)')")


def test_shims_regexp_like3_cast_json_default_fn(spark, tmp_path):
    """3-arg REGEXP_LIKE match-type flags, CAST(... AS JSON), and
    DEFAULT(col) (round-8 verdict item #6) — MySQL-manual values."""
    import pytest

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    r = e.execute(
        "SELECT REGEXP_LIKE('ABC', 'abc', 'i') AS i1, "
        "REGEXP_LIKE('ABC', 'abc', 'c') AS c1, "
        "REGEXP_LIKE('a\\nb', 'a.b', 'n') AS n1, "
        "REGEXP_LIKE('abc', 'abc') AS p1"
    ).collect()[0]
    assert (r.i1, r.c1, r.n1, r.p1) == (True, False, True, True)
    r = e.execute(
        "SELECT CAST('{\"a\":  1}' AS JSON) AS j, "
        "CAST('[1,2]' AS JSON) AS k, CAST('oops' AS JSON) AS bad"
    ).collect()[0]
    assert (r.j, r.k, r.bad) == ('{"a": 1}', "[1, 2]", None)
    e.execute("CREATE TABLE dt (id INT PRIMARY KEY, v INT DEFAULT 7, "
              "s VARCHAR(5) DEFAULT 'hi', n INT)")
    e.execute("INSERT INTO dt (id) VALUES (1)")
    e.execute("UPDATE dt SET v = DEFAULT(v) + 10")
    r = e.execute("SELECT v, DEFAULT(s) AS ds FROM dt").collect()[0]
    assert (r.v, r.ds) == (17, "hi")
    with pytest.raises(ValueError, match="1364"):
        e.execute("SELECT DEFAULT(n) FROM dt")


def test_hex_literal_arithmetic_context(spark, tmp_path):
    """Hex literals adjacent to an arithmetic operator evaluate as
    integers (MySQL: 0x41+1 = 66); string/comparison contexts keep the
    mysqldump binary-string default (round-8 ADVICE)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    r = e.execute(
        "SELECT 0x41 + 1 AS a, 2 * 0x10 AS b, 0x0A MOD 3 AS c, "
        "HEX(0x41) AS d"
    ).collect()[0]
    assert (r.a, r.b, r.c) == (66, 32, 1)
    assert r.d == "41"  # non-arith context stays a binary string


def test_alter_multi_action_trailing_order_by(spark, tmp_path):
    """ALTER TABLE t ADD COLUMN ..., ORDER BY a, b — the ORDER BY
    column list must not split into bogus actions (round-8 ADVICE;
    MyISAM-era dumps emit this)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, b INT)")
    e.execute("ALTER TABLE t ADD COLUMN x INT, ORDER BY a, b")
    assert "x" in e.execute("SELECT * FROM t").columns


def test_orderless_ranking_windows(spark, tmp_path):
    """row_number()/rank() OVER () — valid in MySQL and pg with
    arbitrary order — get a constant ORDER BY injected for Spark;
    named-window references are left to the chain pass."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY)")
    e.execute("INSERT INTO t VALUES (3), (1), (2)")
    rns = sorted(
        r.rn for r in e.execute(
            "SELECT ROW_NUMBER() OVER () AS rn FROM t").collect()
    )
    assert rns == [1, 2, 3]
    assert e.execute(
        "SELECT RANK() OVER (PARTITION BY a) AS r FROM t"
    ).collect()[0].r == 1
    # named base windows keep their declared order
    rows = e.execute(
        "SELECT a, ROW_NUMBER() OVER w AS rn FROM t "
        "WINDOW w AS (ORDER BY a DESC)"
    ).collect()
    assert [(r.a, r.rn) for r in rows] == [(3, 1), (2, 2), (1, 3)]


def test_having_without_group_by_alias_reference(spark, tmp_path):
    """MySQL extension: HAVING without GROUP BY filters un-grouped
    rows and may reference select aliases; aggregate HAVING keeps the
    Spark-native implicit global group (probe battery round 9)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, b INT)")
    e.execute("INSERT INTO t VALUES (1, 10), (2, 20), (3, 5)")
    rows = e.execute("SELECT a, IF(b > 10, b, NULL) AS nb FROM t "
                     "HAVING nb IS NOT NULL").collect()
    assert [(r.a, r.nb) for r in rows] == [(2, 20)]
    rows = e.execute("SELECT a, b * 2 AS d FROM t HAVING d > 15 "
                     "ORDER BY a LIMIT 1").collect()
    assert [(r.a, r.d) for r in rows] == [(1, 20)]
    assert e.execute("SELECT MAX(b) AS m FROM t HAVING MAX(b) > 5"
                     ).collect()[0].m == 20


def test_round9_datetime_regexp_batch(spark, tmp_path):
    """Probe battery round 9: TIME_FORMAT (>24h TIME values),
    DATE_FORMAT %W/%r/%T tokens (+ unknown %X quoting), composite
    INTERVAL units (YEAR_MONTH/DAY_MINUTE -> ANSI YEAR TO MONTH...),
    TIMESTAMPADD SQL_TSI_ spellings, TO_BASE64/FROM_BASE64, and
    REGEXP_INSTR/SUBSTR pos+occurrence args (REGEXP_INSTR previously
    passed pos into Spark's GROUP-INDEX slot — silent wrong answer)."""
    import datetime as dt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))

    def v(q):
        return tuple(e.execute(q).collect()[0])

    assert v("SELECT TIME_FORMAT('25:30:10', '%H %k %i %s %p') AS x") \
        == ("25 25 30 10 AM",)
    assert v("SELECT DATE_FORMAT('2024-08-16 14:05:09', "
             "'%W %M %e %Y %r') AS x") \
        == ("Friday August 16 2024 02:05:09 PM",)
    assert v("SELECT '2024-01-01' + INTERVAL '1-2' YEAR_MONTH AS x") \
        == (dt.datetime(2025, 3, 1),)
    assert v("SELECT '2024-01-01 00:00:00' + INTERVAL '1 10:30' "
             "DAY_MINUTE AS x") == (dt.datetime(2024, 1, 2, 10, 30),)
    assert v("SELECT TIMESTAMPADD(SQL_TSI_DAY, 3, '2024-01-01') AS x") \
        == (dt.date(2024, 1, 4),)
    assert v("SELECT TO_BASE64('ab') AS a, FROM_BASE64('YWI=') AS b") \
        == ("YWI=", b"ab")
    # MySQL manual: search from pos 2 finds the SECOND dog at 9
    assert v("SELECT REGEXP_INSTR('dog cat dog', 'dog', 2) AS x") == (9,)
    assert v("SELECT REGEXP_INSTR('aaa bbb aaa', 'a{3}', 1, 2) AS x") \
        == (9,)
    assert v("SELECT REGEXP_INSTR('abc', 'b', 1, 1, 1) AS x") == (3,)
    assert v("SELECT REGEXP_SUBSTR('abc def ghi', '[a-z]+', 1, 3) AS x") \
        == ("ghi",)


def test_mysql_logical_operator_spellings(spark, tmp_path):
    """! / && / || / XOR / IS TRUE with MySQL numeric truthiness
    (probe battery round 9): ! binds to the next primary and yields
    INT in comparison context; XOR sits between AND and comparison
    precedence and NULL-propagates; IS [NOT] TRUE/FALSE boolean-casts
    non-boolean operands; DATE()/TIME() return NULL on invalid input
    and TIME handles the ±838h range."""
    import datetime as dt

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, flag INT)")
    e.execute("INSERT INTO t VALUES (1, 1), (2, 0), (3, NULL)")
    r = e.execute("SELECT !0 AS bang, !1 = 0 AS prec, !NULL AS nn, "
                  "1 XOR 0 AS x1, 2 XOR 1 AS x2, 1 XOR NULL AS xn"
                  ).collect()[0]
    assert (r.bang, r.prec, r.nn) == (True, True, None)
    assert (r.x1, r.x2, r.xn) == (True, False, None)
    assert sorted(
        x.a for x in e.execute("SELECT a FROM t WHERE !flag").collect()
    ) == [2]
    assert sorted(
        x.a for x in e.execute(
            "SELECT a FROM t WHERE a=1 && flag=1 || a=2").collect()
    ) == [1, 2]
    assert sorted(
        x.a for x in e.execute(
            "SELECT a FROM t WHERE a = 1 XOR a = 2").collect()
    ) == [1, 2]
    assert sorted(
        x.a for x in e.execute(
            "SELECT a FROM t WHERE flag IS TRUE").collect()
    ) == [1]
    assert sorted(
        x.a for x in e.execute(
            "SELECT a FROM t WHERE flag IS NOT TRUE").collect()
    ) == [2, 3]
    r = e.execute("SELECT DATE('2024-02-30') AS bad, "
                  "DATE('2024-02-29') AS ok, TIME('838:59:59') AS t1, "
                  "TIME('2024-01-01 10:05:03') AS t2, "
                  "TIME('junk') AS t4").collect()[0]
    assert r.bad is None and r.ok == dt.date(2024, 2, 29)
    assert (r.t1, r.t2, r.t4) == ("838:59:59", "10:05:03", None)


def test_std_variance_population_and_view_column_list(spark, tmp_path):
    """MySQL's STD/STDDEV/VARIANCE are POPULATION statistics (manual
    14.19.1) — previously mapped to Spark's bare (sample) names:
    silent wrong values. CREATE VIEW v (col_list) AS ... renames
    positionally (dump-file form)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE t (a INT PRIMARY KEY, b INT)")
    e.execute("INSERT INTO t VALUES (1, 10), (2, 20), (3, 5)")
    r = e.execute("SELECT ROUND(STD(b), 4) AS s, "
                  "ROUND(STDDEV(b), 4) AS s2, "
                  "ROUND(VARIANCE(b), 4) AS v, "
                  "ROUND(STDDEV_SAMP(b), 4) AS ss FROM t").collect()[0]
    assert (r.s, r.s2, r.v, r.ss) == (6.2361, 6.2361, 38.8889, 7.6376)
    e.execute("CREATE OR REPLACE VIEW v3 (col_alias, cb) AS "
              "SELECT a, b FROM t")
    row = e.execute("SELECT col_alias, cb FROM v3 "
                    "ORDER BY col_alias LIMIT 1").collect()[0]
    assert (row.col_alias, row.cb) == (1, 10)


def test_round9_info_crypto_batch(spark, tmp_path):
    """Probe battery round 9: NOW(n)/CURRENT_TIMESTAMP(n)/SYSDATE(n)
    fractional-seconds args (ORMs emit NOW(6)), AES with MySQL's
    XOR-fold key derivation, COMPRESS/UNCOMPRESS zlib + 4-byte header,
    STATEMENT_DIGEST_TEXT, FORMAT_BYTES/FORMAT_PICO_TIME,
    SYSTEM_USER/CURRENT_ROLE/ICU_VERSION, replication-wait shims."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))

    def v(q):
        return tuple(e.execute(q).collect()[0])

    r = v("SELECT NOW(6) IS NOT NULL AS a, NOW(3) <= NOW(6) AS b, "
          "CURRENT_TIMESTAMP(3) IS NOT NULL AS c, SYSDATE(6) IS NOT "
          "NULL AS d")
    assert r == (True, True, True, True)
    assert v("SELECT AES_DECRYPT(AES_ENCRYPT('text', 'mykey'), "
             "'mykey') AS x") == (b"text",)
    r = v("SELECT UNCOMPRESS(COMPRESS('abcabcabc')) AS u, "
          "UNCOMPRESSED_LENGTH(COMPRESS('abcabcabc')) AS ul")
    assert (bytes(r[0]), r[1]) == (b"abcabcabc", 9)
    assert v("SELECT STATEMENT_DIGEST_TEXT("
             "'select * from t where a = 1') AS d") \
        == ("SELECT * FROM t WHERE a = ? ;",)
    assert v("SELECT FORMAT_BYTES(512 * 1024) AS fb, "
             "FORMAT_PICO_TIME(3500000000) AS fpt") \
        == ("512.00 KiB", "3.50 ms")
    assert v("SELECT SYSTEM_USER() AS a, CURRENT_ROLE() AS b") \
        == ("root", "NONE")
    assert v("SELECT GTID_SUBSET('', 'x') AS a, "
             "MASTER_POS_WAIT('f', 4, 0) AS b, "
             "VALIDATE_PASSWORD_STRENGTH('weak') AS c") == (1, 0, 0)


def test_explicit_ci_collation_comparisons(spark, tmp_path):
    """An explicitly-requested `COLLATE ..._ci` makes the adjacent
    comparison case-insensitive (round-10 verdict #3 — the blanket
    COLLATE strip silently kept it binary)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_ci_cmp"))
    assert e.execute(
        "SELECT 'a' = 'A' COLLATE utf8mb4_general_ci AS v"
    ).collect()[0].v is True
    e.execute("CREATE TABLE fr (id INT, s VARCHAR(20))")
    e.execute("INSERT INTO fr VALUES (1, 'Apple'), (2, 'banana')")
    rows = e.execute(
        "SELECT id FROM fr WHERE s = 'apple' COLLATE utf8mb4_general_ci"
    ).collect()
    assert [r.id for r in rows] == [1]
    rows = e.execute(
        "SELECT id FROM fr WHERE s COLLATE utf8mb4_0900_ai_ci "
        "LIKE 'APP%'"
    ).collect()
    assert [r.id for r in rows] == [1]
    # binary collations keep the default case-sensitive comparison
    rows = e.execute(
        "SELECT id FROM fr WHERE s = 'apple' COLLATE utf8mb4_bin"
    ).collect()
    assert rows == []


def test_date_format_week_tokens(spark, tmp_path):
    """DATE_FORMAT week-based tokens %U/%u/%V/%v/%X/%x stitched from
    the WEEK/YEARWEEK mode machinery (round-10 verdict #5 — they used
    to emit malformed SQL), checked against MySQL-manual values and a
    Python isocalendar differential for the ISO pair %x-%v."""
    from datetime import date, timedelta

    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_wkfmt"))
    row = e.execute(
        "SELECT DATE_FORMAT('1999-01-01', '%X %V') AS a, "
        "DATE_FORMAT('1999-01-01', '%x-%v') AS b, "
        "DATE_FORMAT('2006-06-15', '%Y w%u') AS c, "
        "DATE_FORMAT('2023-01-01', '%U') AS d"
    ).collect()[0]
    assert row.a == "1998 52"       # MySQL manual example
    assert row.b == "1998-53"
    assert row.c == "2006 w24"      # literal letters stay quoted
    assert row.d == "01"            # Sunday Jan 1, mode-0 week
    # ISO pair differential across year boundaries
    probes = [date(2020, 12, 28) + timedelta(days=k * 3)
              for k in range(12)]
    sel = ", ".join(
        f"DATE_FORMAT('{d_}', '%x-%v') AS c{k}"
        for k, d_ in enumerate(probes))
    got = e.execute(f"SELECT {sel}").collect()[0]
    for k, d_ in enumerate(probes):
        iso = d_.isocalendar()
        assert got[k] == f"{iso[0]:04d}-{iso[1]:02d}", (d_, got[k])


def test_string_numeric_prefix_coercion(spark, tmp_path):
    """MySQL coerces string operands of arithmetic by parsing a
    numeric prefix (round-10 verdict #9 — the silent NULL matched
    neither MySQL nor DuckDB)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_coerce"))
    row = e.execute(
        "SELECT '3abc' + 1 AS a, 'abc' + 1 AS b, '-3x' + 1 AS c, "
        "'5' - '2' AS d, '.5e1y' * 2 AS e"
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (4, 1, -2, 3)
    assert abs(row.e - 10.0) < 1e-9
    # date arithmetic keeps the string base
    assert str(e.execute(
        "SELECT '2024-01-01' + INTERVAL 1 DAY AS d").collect()[0].d
    ).startswith("2024-01-02")


def test_row_subquery_comparison(spark, tmp_path):
    """Row-subquery comparison `(a, b) = (SELECT x, y ...)` via
    struct-wrapping (round-10: previously an honest gap). Scalar
    subquery errors on >1 row like MySQL 1242."""
    import pytest
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_rowsub"))
    e.execute("CREATE TABLE rt (a INT, b INT)")
    e.execute("INSERT INTO rt VALUES (1, 2), (3, 4)")
    e.execute("CREATE TABLE ru (x INT, y INT)")
    e.execute("INSERT INTO ru VALUES (1, 2)")
    rows = e.execute(
        "SELECT a, b FROM rt WHERE (a, b) = (SELECT x, y FROM ru)"
    ).collect()
    assert [(r.a, r.b) for r in rows] == [(1, 2)]
    rows = e.execute(
        "SELECT a FROM rt WHERE (a, b) <> (SELECT x, y FROM ru) "
        "ORDER BY a").collect()
    assert [r.a for r in rows] == [3]
    rows = e.execute(
        "SELECT a FROM rt WHERE ROW(a, b) = (SELECT x, y FROM ru)"
    ).collect()
    assert [r.a for r in rows] == [1]
    # >1 subquery row raises (MySQL ER_SUBQUERY_NO_1_ROW parity)
    e.execute("INSERT INTO ru VALUES (3, 4)")
    with pytest.raises(Exception):
        e.execute("SELECT a FROM rt WHERE (a, b) = "
                  "(SELECT x, y FROM ru)").collect()


def test_timestamp_two_arg(spark, tmp_path):
    """2-arg TIMESTAMP(date, time) adds the time (round-10 battery)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_ts2"))
    assert e.execute(
        "SELECT TIMESTAMP('2024-01-01', '10:30:00') AS t"
    ).collect()[0].t == "2024-01-01 10:30:00"
    assert str(e.execute(
        "SELECT TIMESTAMP('2024-01-01 01:00:00') AS t"
    ).collect()[0].t).startswith("2024-01-01 01:00:00")


def test_battery21_coercion_and_edges(spark, tmp_path):
    """Round-10 battery 21: CAST string→SIGNED prefix parsing (was a
    silent NULL), LEAST mixed literal types, CASE WHEN NULL,
    FROM_UNIXTIME %-format routing, mysqldump max-LIMIT clamp."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_b21"))

    def val(sql):
        return e.execute(sql).collect()[0][0]

    assert val("SELECT CAST('abc' AS SIGNED)") == 0
    assert val("SELECT CAST('12abc' AS SIGNED)") == 12
    assert val("SELECT CAST('12.7' AS SIGNED)") == 12  # string: prefix
    assert val("SELECT CAST('-3x' AS SIGNED)") == -3
    assert val("SELECT CAST(NULL AS SIGNED)") is None
    assert val("SELECT CAST(1.7 AS SIGNED)") == 2      # numeric: rounds
    assert val("SELECT LEAST('1', 2)") == 1
    assert val("SELECT GREATEST(3, '10')") == 10
    assert val("SELECT CASE WHEN NULL THEN 'x' ELSE 'y' END") == "y"
    assert val("SELECT FROM_UNIXTIME(1704067200, '%Y %v')") == "2024 01"
    e.execute("CREATE TABLE lmt (a INT)")
    e.execute("INSERT INTO lmt VALUES (1), (2)")
    rows = e.execute(
        "SELECT a FROM lmt LIMIT 18446744073709551615").collect()
    assert len(rows) == 2
    rows = e.execute(
        "SELECT a FROM lmt ORDER BY a LIMIT 1, 18446744073709551615"
    ).collect()
    assert [r.a for r in rows] == [2]
