"""Engine DML lifecycle queries: put the statement front door under the
driver's oracle gate.

The CTAS / INSERT…SELECT / REPLACE / IGNORE / ON DUPLICATE / UPDATE /
DELETE / defaults surface (reference: TestInsertInto main_test.go:840,
TestReplaceInto :938, TestInsertIgnoreInto :846, TestUpdate :948,
TestDeleteFrom :989, TestColumnDefaults :1977) is pytest-covered but was
invisible to the correctness gate, which only runs queries() callables.
These entries close that hole: each callable builds a THROWAWAY engine
in a temp warehouse, drives real SQL statements through
``Engine.execute``, and returns the final table state; the oracle is a
pure-SQL reconstruction of the same final state over the source parquet
tables. Hash-equality therefore verifies the whole statement path —
parser, routing, snapshot rewrites, PK upserts, defaults — not just the
read path.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table


def _fresh_engine(spark: SparkSession):
    from myduckserver_spark.engine import Engine

    return Engine(spark, tempfile.mkdtemp(prefix="eng_gate_"))


@register(
    "eng_dml_lifecycle",
    oracle="""
    SELECT k,
           CAST(ROUND(CASE WHEN st = 'O' THEN p0 + 10 ELSE p0 END, 2)
                AS DOUBLE) AS p,
           st, note
    FROM (
        SELECT o_orderkey AS k, o_totalprice AS p0, o_orderstatus AS st,
               'dflt' AS note
        FROM orders WHERE o_orderkey <= 300
    )
    WHERE k % 7 <> 0
    ORDER BY k
    """,
    tags=("engine", "dml", "ctas", "update", "delete", "defaults"),
)
def eng_dml_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE + INSERT…SELECT + UPDATE + DELETE + column DEFAULT,
    verified end-to-end: the returned rows come out of the engine's
    versioned storage after real statement execution."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute(
        "CREATE TABLE t_life (k BIGINT PRIMARY KEY, p DOUBLE, "
        "st VARCHAR(1), note VARCHAR(10) DEFAULT 'dflt')"
    )
    eng.execute(
        "INSERT INTO t_life (k, p, st) SELECT o_orderkey, o_totalprice, "
        "o_orderstatus FROM orders WHERE o_orderkey <= 300"
    )
    eng.execute("UPDATE t_life SET p = p + 10 WHERE st = 'O'")
    eng.execute("DELETE FROM t_life WHERE k % 7 = 0")
    return eng.sql(
        "SELECT k, CAST(round(p, 2) AS DOUBLE) AS p, st, note "
        "FROM t_life ORDER BY k"
    )


@register(
    "eng_upsert_semantics",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v
        FROM orders WHERE o_orderkey <= 100
    ),
    replaced AS (  -- REPLACE INTO overwrote k <= 50 with v*2
        SELECT k, CASE WHEN k <= 50 THEN v * 2 ELSE v END AS v FROM base
    ),
    ignored AS (   -- INSERT IGNORE added only the NEW keys 101..140
        SELECT k, v FROM replaced
        UNION ALL
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) * 3 AS v
        FROM orders
        WHERE o_orderkey > 100 AND o_orderkey <= 140
    )
    SELECT k,  -- ON DUPLICATE KEY UPDATE pinned k=7 to 555.5
           CAST(ROUND(CASE WHEN k = 7 THEN 555.5 ELSE v END, 2) AS DOUBLE)
               AS v
    FROM ignored
    ORDER BY k
    """,
    tags=("engine", "dml", "replace", "ignore", "on-duplicate"),
)
def eng_upsert_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPLACE INTO + INSERT IGNORE + ON DUPLICATE KEY UPDATE against a
    PK table, verified against a pure-SQL reconstruction."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute("CREATE TABLE t_ups (k BIGINT PRIMARY KEY, v DOUBLE)")
    eng.execute(
        "INSERT INTO t_ups SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) "
        "FROM orders WHERE o_orderkey <= 100"
    )
    eng.execute(
        "REPLACE INTO t_ups SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) "
        "* 2 FROM orders WHERE o_orderkey <= 50"
    )
    eng.execute(
        "INSERT IGNORE INTO t_ups SELECT o_orderkey, "
        "CAST(o_totalprice AS DOUBLE) * 3 FROM orders "
        "WHERE o_orderkey <= 140"
    )
    eng.execute(
        "INSERT INTO t_ups (k, v) VALUES (7, 555.5) "
        "ON DUPLICATE KEY UPDATE v = VALUES(v)"
    )
    return eng.sql(
        "SELECT k, CAST(round(v, 2) AS DOUBLE) AS v FROM t_ups ORDER BY k"
    )


@register(
    "eng_ddl_catalog",
    oracle="""
    SELECT * FROM (VALUES
        ('a', 'id',    CAST(1 AS BIGINT), 'int',    'PRI'),
        ('a', 'v',     CAST(2 AS BIGINT), 'double', ''),
        ('a', 'label', CAST(3 AS BIGINT), 'varchar', ''),
        ('a', 'extra', CAST(4 AS BIGINT), 'bigint', '')
    ) t(table_name, column_name, ordinal, data_type, column_key)
    ORDER BY ordinal
    """,
    tags=("engine", "ddl", "alter", "information-schema"),
)
def eng_ddl_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL + ALTER + information_schema under the gate: CREATE, ADD
    COLUMN, RENAME COLUMN, then read the catalog back through the
    information_schema.columns shim (reference: GMS information_schema
    + internal views, catalog/internal_views.go:13-88). The oracle is
    the literal expected catalog state."""
    eng = _fresh_engine(spark)
    eng.execute("CREATE TABLE a (id INT PRIMARY KEY, v DOUBLE, s VARCHAR(10))")
    eng.execute("ALTER TABLE a ADD COLUMN extra BIGINT")
    eng.execute("ALTER TABLE a RENAME COLUMN s TO label")
    return eng.sql(
        "SELECT lower(TABLE_NAME) AS table_name, COLUMN_NAME AS column_name, "
        "CAST(ORDINAL_POSITION AS BIGINT) AS ordinal, DATA_TYPE AS data_type, "
        "COLUMN_KEY AS column_key "
        "FROM information_schema.columns WHERE table_name = 'a' "
        "ORDER BY ordinal"
    )


@register(
    "eng_prepared_exec",
    oracle="""
    SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v
    FROM orders
    WHERE o_totalprice < 5000 AND o_orderkey <= 2000
    ORDER BY k
    """,
    tags=("engine", "prepared"),
)
def eng_prepared_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREPARE / EXECUTE USING with a ? placeholder, under the gate
    (reference: extended protocol Parse/Bind/Execute,
    pgserver/duck_handler.go:105-233)."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute(
        "PREPARE p FROM 'SELECT o_orderkey AS k, "
        "CAST(o_totalprice AS DOUBLE) AS v FROM orders "
        "WHERE o_totalprice < ? AND o_orderkey <= ? ORDER BY k'"
    )
    eng.execute("SET @cap = 5000")
    eng.execute("SET @maxk = 2000")
    return eng.execute("EXECUTE p USING @cap, @maxk")


@register(
    "eng_merge_statement",
    oracle="""
    WITH t AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v
        FROM orders WHERE o_orderkey <= 2000
    ),
    s AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v
        FROM orders WHERE o_orderkey BETWEEN 1000 AND 4000
    ),
    kept AS (
        SELECT t.k,
               CASE WHEN s.k IS NOT NULL THEN t.v + s.v ELSE t.v END AS v
        FROM t LEFT JOIN s ON t.k = s.k
        WHERE NOT (s.k IS NOT NULL AND s.v > 200000)
    ),
    ins AS (
        SELECT s.k, s.v FROM s
        WHERE s.k NOT IN (SELECT k FROM t) AND s.v <= 150000
    )
    SELECT k, CAST(ROUND(v, 2) AS DOUBLE) AS v
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
    ORDER BY k
    """,
    tags=("engine", "dml", "merge"),
)
def eng_merge_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO with conditional DELETE, UPDATE, and filtered INSERT
    clauses, executed through the statement front door and verified
    against a pure-SQL reconstruction of the final table state
    (SQL:2003 MERGE; reference reaches the same semantics via
    REPLACE/ON DUPLICATE, backend/loaddata.go:131-143, and the CDC
    upsert path, delta/controller.go)."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute(
        "CREATE TABLE m_tgt AS SELECT o_orderkey AS k, "
        "CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_orderkey <= 2000"
    )
    eng.execute(
        "CREATE TABLE m_src AS SELECT o_orderkey AS k, "
        "CAST(o_totalprice AS DOUBLE) AS v FROM orders "
        "WHERE o_orderkey BETWEEN 1000 AND 4000"
    )
    eng.execute(
        "MERGE INTO m_tgt t USING m_src s ON t.k = s.k "
        "WHEN MATCHED AND s.v > 200000 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = t.v + s.v "
        "WHEN NOT MATCHED AND s.v <= 150000 THEN INSERT (k, v) VALUES (s.k, s.v)"
    )
    return eng.sql(
        "SELECT k, CAST(round(v, 2) AS DOUBLE) AS v FROM m_tgt ORDER BY k"
    )


@register(
    "eng_table_changes",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p,
               o_orderstatus AS st
        FROM orders WHERE o_orderkey <= 200
    )
    SELECT k, p, st, _change_type FROM (
        SELECT k, p, st, 'delete' AS _change_type
        FROM base WHERE k % 5 = 0
        UNION ALL
        SELECT k, p, st, 'update_preimage'
        FROM base WHERE st = 'F' AND k % 5 <> 0
        UNION ALL
        SELECT k, p + 5, st, 'update_postimage'
        FROM base WHERE st = 'F' AND k % 5 <> 0
        UNION ALL
        SELECT 9001, CAST(1.5 AS DOUBLE), 'X', 'insert'
    )
    ORDER BY k, _change_type
    """,
    tags=("engine", "change-feed", "time-travel"),
)
def eng_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE_CHANGES change feed under the gate: CTAS (v0) → UPDATE
    (v1) → DELETE (v2) → INSERT (v3), then the v0→current row diff
    through the SQL table-function front door. The oracle reconstructs
    the exact insert/delete/update pre+post image set from the source
    parquet — hash-equality proves the full-outer-join diff, version
    reads, and the rewrite path all at once."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute(
        "CREATE TABLE tc_t AS SELECT o_orderkey AS k, "
        "CAST(o_totalprice AS DOUBLE) AS p, o_orderstatus AS st "
        "FROM orders WHERE o_orderkey <= 200"
    )
    meta = eng.table_meta("tc_t")
    meta.primary_key = ["k"]
    eng._save_meta("tc_t", meta)
    eng.execute("UPDATE tc_t SET p = p + 5 WHERE st = 'F'")
    eng.execute("DELETE FROM tc_t WHERE k % 5 = 0")
    eng.execute("INSERT INTO tc_t VALUES (9001, 1.5, 'X')")
    return eng.sql(
        "SELECT k, p, st, _change_type FROM TABLE_CHANGES('tc_t', 0) "
        "ORDER BY k, _change_type"
    )


@register(
    "eng_partitioned_prune",
    oracle="""
    SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p,
           o_orderstatus AS st
    FROM orders
    WHERE o_orderkey <= 500 AND o_orderstatus = 'F'
    ORDER BY k
    """,
    tags=("engine", "partitioning", "pruning"),
)
def eng_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned CTAS + partition-pruned read under the gate:
    the o_orderstatus = 'F' predicate resolves to partition directories
    (PartitionFilters — plan-asserted in tests/test_partitioned_tables);
    hash-equality proves values, declared column order, and partition-
    column types all survive the directory-encoding round trip."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute(
        "CREATE TABLE po_t PARTITIONED BY (st) AS "
        "SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p, "
        "o_orderstatus AS st FROM orders WHERE o_orderkey <= 500"
    )
    return eng.sql(
        "SELECT k, p, st FROM po_t WHERE st = 'F' ORDER BY k"
    )


@register(
    "eng_vector_search",
    oracle="""
    WITH q AS (SELECT embedding AS qa FROM embeddings WHERE vec_id = 7),
    scored AS (
        SELECT vec_id,
               ROUND(list_sum([CAST(qa[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)
                         FOR i IN range(1, len(qa) + 1)])
               / (sqrt(list_sum([CAST(qa[i] AS DOUBLE) * CAST(qa[i] AS DOUBLE)
                         FOR i IN range(1, len(qa) + 1)]))
                  * sqrt(list_sum([CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)
                         FOR i IN range(1, len(va) + 1)]))), 6) AS sim
        FROM q JOIN (SELECT vec_id, embedding AS va FROM embeddings) v ON TRUE
    )
    SELECT vec_id, sim FROM scored
    ORDER BY sim DESC, vec_id
    LIMIT 10
    """,
    tags=("engine", "vector-index", "ann"),
)
def eng_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VECTOR INDEX + full-probe search under the gate: with
    nprobe = nlist the IVF probe degenerates to the exact scan, so the
    DuckDB brute-force top-10 is a hash-exact oracle for the whole
    index path (build, persistence, probe selection, bucket scan,
    rounding)."""
    eng = _fresh_engine(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    eng.catalog.create_table("ev_t", emb)
    meta = eng.table_meta("ev_t")
    meta.primary_key = ["vec_id"]
    eng._save_meta("ev_t", meta)
    eng.execute(
        "CREATE VECTOR INDEX ev_idx ON ev_t (embedding) WITH (nlist = 8)"
    )
    q = list(
        emb.filter(F.col("vec_id") == 7).collect()[0].embedding
    )
    return eng.vector_search("ev_t", "ev_idx", q, k=10, nprobe=8).select(
        F.col("vec_id").cast("long").alias("vec_id"), "sim"
    )


@register(
    "eng_rowcap_dml",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS p
        FROM orders WHERE o_orderkey <= 120
    ),
    upd AS (  -- UPDATE ... ORDER BY p DESC, k LIMIT 10: top-10 priciest
        SELECT k, CASE WHEN rk <= 10 THEN p + 1000 ELSE p END AS p
        FROM (SELECT k, p, ROW_NUMBER() OVER (ORDER BY p DESC, k) AS rk
              FROM base)
    ),
    del AS (  -- DELETE ... ORDER BY k LIMIT 5: five lowest keys go
        SELECT k, p FROM (
            SELECT k, p, ROW_NUMBER() OVER (ORDER BY k) AS rk FROM upd)
        WHERE rk > 5
    ),
    ref AS (
        SELECT o_orderkey AS k, CAST(o_custkey AS BIGINT) AS c
        FROM orders WHERE o_orderkey <= 120
    ),
    upd2 AS (  -- multi-table UPDATE ... JOIN ... ORDER BY LIMIT 7
        SELECT k, CASE WHEN m AND rn <= 7 THEN p + c ELSE p END AS p
        FROM (
            SELECT d.k, d.p, r.c, (r.c % 2 = 0) AS m,
                   ROW_NUMBER() OVER (
                       PARTITION BY (r.c % 2 = 0)
                       ORDER BY d.p DESC, d.k DESC) AS rn
            FROM del d JOIN ref r ON d.k = r.k
        )
    ),
    del2 AS (  -- DELETE ... USING ... ORDER BY k DESC LIMIT 4
        SELECT k, p FROM (
            SELECT u.k, u.p, (r.c % 3 = 0) AS m,
                   ROW_NUMBER() OVER (
                       PARTITION BY (r.c % 3 = 0)
                       ORDER BY u.k DESC) AS rn
            FROM upd2 u JOIN ref r ON u.k = r.k
        ) WHERE NOT (m AND rn <= 4)
    )
    SELECT k, p FROM del2 ORDER BY k
    """,
    tags=("engine", "dml", "row-cap"),
)
def eng_rowcap_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL row-capped DML under the gate: UPDATE ... ORDER BY LIMIT
    touches exactly the first n ordered matches, DELETE ... ORDER BY
    LIMIT removes exactly the first n — the oracle reconstructs both
    caps with window ranks over the same source rows."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute(
        "CREATE TABLE rc_t AS SELECT o_orderkey AS k, "
        "CAST(o_totalprice AS DOUBLE) AS p FROM orders "
        "WHERE o_orderkey <= 120"
    )
    meta = eng.table_meta("rc_t")
    meta.primary_key = ["k"]
    eng._save_meta("rc_t", meta)
    eng.execute("UPDATE rc_t SET p = p + 1000 ORDER BY p DESC, k LIMIT 10")
    eng.execute("DELETE FROM rc_t ORDER BY k LIMIT 5")
    # multi-table row caps (GMS accepts ORDER BY/LIMIT on these forms;
    # cap counts DISTINCT target rows in first-match order)
    eng.execute(
        "CREATE TABLE rc_ref AS SELECT o_orderkey AS k, "
        "CAST(o_custkey AS BIGINT) AS c FROM orders WHERE o_orderkey <= 120"
    )
    eng.execute(
        "UPDATE rc_t t JOIN rc_ref r ON t.k = r.k SET t.p = t.p + r.c "
        "WHERE r.c % 2 = 0 ORDER BY t.p DESC, t.k DESC LIMIT 7"
    )
    eng.execute(
        "DELETE FROM rc_t USING rc_t JOIN rc_ref r ON rc_t.k = r.k "
        "WHERE r.c % 3 = 0 ORDER BY rc_t.k DESC LIMIT 4"
    )
    return eng.sql("SELECT k, p FROM rc_t ORDER BY k")


@register(
    "eng_view_dml",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS v
        FROM orders WHERE o_orderkey <= 200
    ),
    viewupd AS (  -- UPDATE through the view: only rows VISIBLE in it
                  -- (v > 100000), even keys, post-image under the
                  -- table CHECK
        SELECT k, CASE WHEN v > 100000 AND k % 2 = 0
                        AND v + 1000 < 600000
                  THEN v + 1000 ELSE v END AS v
        FROM base
    ),
    ig AS (       -- UPDATE IGNORE: doubling skips rows whose
                  -- post-image violates CHECK (v < 600000)
        SELECT k, CASE WHEN v * 2 < 600000 THEN v * 2 ELSE v END AS v
        FROM viewupd
    )
    SELECT k, CAST(ROUND(v, 2) AS DOUBLE) AS v FROM ig ORDER BY k
    """,
    tags=("engine", "views", "updatable-view", "check-option",
          "update-ignore"),
)
def eng_view_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-7 DML surface end-to-end: DML through an updatable view
    WITH CHECK OPTION (retargeted onto the base table, alias mapped,
    view WHERE narrowing) followed by UPDATE IGNORE skipping
    CHECK-violating post-images with a warning instead of failing."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute(
        "CREATE TABLE t_vd (k BIGINT PRIMARY KEY, v DOUBLE, "
        "CHECK (v < 600000))"
    )
    eng.execute(
        "INSERT INTO t_vd SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey <= 200"
    )
    eng.execute(
        "CREATE VIEW big_vd AS SELECT k, v AS val FROM t_vd "
        "WHERE v > 100000 WITH CHECK OPTION"
    )
    eng.execute(
        "UPDATE big_vd SET val = val + 1000 "
        "WHERE k % 2 = 0 AND val + 1000 < 600000"
    )
    eng.execute("UPDATE IGNORE t_vd SET v = v * 2")
    return eng.sql(
        "SELECT k, CAST(round(v, 2) AS DOUBLE) AS v FROM t_vd ORDER BY k"
    )


@register(
    "eng_on_dup_batch",
    oracle="""
    WITH seeded AS (
        SELECT o_orderkey AS k, CAST(ROUND(o_totalprice, 2) AS DOUBLE) AS v
        FROM orders WHERE o_orderkey <= 20
    ),
    after_chain AS (
        -- the batch (1,10),(1,5),(2,7),(21,3),(21,4),(22,1) applied
        -- row-at-a-time with v = v + VALUES(v): k=1 takes +10 then +5,
        -- k=2 takes +7, k=21 inserts 3 then updates to 7, k=22 inserts
        SELECT k,
               CASE WHEN k = 1 THEN v + 15
                    WHEN k = 2 THEN v + 7
                    ELSE v END AS v
        FROM seeded
        UNION ALL SELECT 21, CAST(7 AS DOUBLE)
        UNION ALL SELECT 22, CAST(1 AS DOUBLE)
    ),
    uq AS (
        -- unique-index matching: base (1,'a',10),(2,'b',20); batch
        -- (9,'a',90) updates row 1 via UNIQUE(e), (3,'c',30) inserts
        SELECT * FROM (VALUES
            (CAST(1001 AS BIGINT), CAST(90 AS DOUBLE)),
            (CAST(1002 AS BIGINT), CAST(20 AS DOUBLE)),
            (CAST(1003 AS BIGINT), CAST(30 AS DOUBLE))
        ) t(k, v)
    )
    SELECT k, CAST(ROUND(v, 2) AS DOUBLE) AS v FROM after_chain
    UNION ALL
    SELECT k, v FROM uq
    ORDER BY k
    """,
    tags=("engine", "dml", "on-duplicate", "intra-batch", "unique-index"),
)
def eng_on_dup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 ON DUPLICATE KEY UPDATE semantics end-to-end: an
    intra-batch duplicate-key chain applied row-at-a-time (MySQL
    sequential semantics, the driver-resolved tier) AND conflict
    resolution via a UNIQUE index (first-match precedence, the
    distributed tier), verified against a pure-SQL reconstruction
    (reference: GMS row-at-a-time exec, main_test.go:851)."""
    eng = _fresh_engine(spark)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    eng.execute("CREATE TABLE t_odb (k BIGINT PRIMARY KEY, v DOUBLE)")
    eng.execute(
        "INSERT INTO t_odb SELECT o_orderkey, "
        "CAST(ROUND(o_totalprice, 2) AS DOUBLE) FROM orders "
        "WHERE o_orderkey <= 20"
    )
    eng.execute(
        "INSERT INTO t_odb VALUES (1, 10), (1, 5), (2, 7), (21, 3), "
        "(21, 4), (22, 1) ON DUPLICATE KEY UPDATE v = v + VALUES(v)"
    )
    eng.execute(
        "CREATE TABLE t_odu (id BIGINT PRIMARY KEY, e VARCHAR(10), "
        "v DOUBLE, UNIQUE KEY uq_e (e))"
    )
    eng.execute("INSERT INTO t_odu VALUES (1,'a',10), (2,'b',20)")
    eng.execute(
        "INSERT INTO t_odu VALUES (9,'a',90), (3,'c',30) "
        "ON DUPLICATE KEY UPDATE v = VALUES(v)"
    )
    return eng.sql(
        "SELECT k, CAST(round(v, 2) AS DOUBLE) AS v FROM t_odb "
        "UNION ALL "
        "SELECT id + 1000 AS k, v FROM t_odu "
        "ORDER BY k"
    )
