"""Remaining SQL-surface corners: multiset set ops, VALUES lists,
DISTINCT ON equivalents, scalar EXISTS in SELECT, global HAVING,
ORDER BY expressions (GMS-corpus shapes not yet covered)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table


@register(
    "s_intersect_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 5000
    INTERSECT ALL
    SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
    ORDER BY nk
    """,
    tags=("setop", "multiset"),
)
def s_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — keeps duplicate counts)."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("nk")
    )
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nk")
    )
    return a.intersectAll(b).orderBy("nk")


@register(
    "s_except_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY k
    """,
    tags=("setop", "multiset"),
)
def s_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (per-occurrence subtraction)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("k")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    return a.exceptAll(b).orderBy("k")


@register(
    "v_values_join",
    oracle="""
    SELECT t.code, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    JOIN (VALUES ('O', 'open'), ('F', 'final'), ('P', 'pending'))
         AS t(status, code)
      ON o_orderstatus = t.status
    GROUP BY t.code
    ORDER BY t.code
    """,
    tags=("values", "join"),
)
def v_values_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES list joined against a table (the reference's GMS
    corpus exercises VALUES via derived tables)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT t.code, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        JOIN (VALUES ('O', 'open'), ('F', 'final'), ('P', 'pending'))
             AS t(status, code)
          ON o_orderstatus = t.status
        GROUP BY t.code
        ORDER BY t.code
        """
    )


@register(
    "d_distinct_on_latest_order",
    oracle="""
    -- DuckDB v1.0.0 arg_max can't take a composite ordering key, so
    -- the oracle states the same semantics as a window query.
    SELECT o_custkey, o_orderkey AS latest_order,
           CAST(o_orderdate AS TIMESTAMP) AS latest_date
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) t
    WHERE rn = 1
    ORDER BY o_custkey
    """,
    tags=("distinct-on", "max_by"),
)
def d_distinct_on_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON / latest-row-per-key via max_by with a composite
    ordering struct (the same primitive CDC condense uses)."""
    orders = load_table(spark, sf_dir, "orders")
    ordk = F.struct("o_orderdate", "o_orderkey")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", ordk).alias("latest_order"),
            F.max_by("o_orderdate", ordk).cast("timestamp").alias("latest_date"),
        )
        .orderBy("o_custkey")
    )


@register(
    "sq_exists_in_select_list",
    oracle="""
    SELECT n_nationkey, n_name,
           CAST(EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
                AS INT) AS has_supplier
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("subquery", "exists", "select-list"),
)
def sq_exists_in_select_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS as a projected value (not a filter)."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT n_nationkey, n_name,
               CAST(EXISTS (SELECT 1 FROM supplier
                            WHERE s_nationkey = n_nationkey) AS INT)
                   AS has_supplier
        FROM nation
        ORDER BY n_nationkey
        """
    )


@register(
    "g_having_no_groupby",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total
    FROM orders
    HAVING COUNT(*) > 10
    """,
    tags=("having", "global-agg"),
)
def g_having_no_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING over a global aggregate (no GROUP BY) — GMS edge case."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total
        FROM orders
        HAVING COUNT(*) > 10
        """
    )


@register(
    "o_orderby_expression",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    ORDER BY length(s_name) % 5 DESC, s_acctbal DESC, s_suppkey
    LIMIT 8
    """,
    tags=("sort", "expression"),
)
def o_orderby_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY computed expressions (not projected columns)."""
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.orderBy(
            (F.length("s_name") % 5).desc(),
            F.col("s_acctbal").desc(),
            F.col("s_suppkey").asc(),
        )
        .select("s_suppkey", "s_name")
        .limit(8)
    )


@register(
    "c_case_in_groupby",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS tier,
           c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("case", "grouping"),
)
def c_case_in_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE expression as a grouping key."""
    cust = load_table(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("tier")
    )
    return (
        cust.groupBy(tier, F.col("c_mktsegment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("tier", "c_mktsegment")
    )


@register(
    "j_lateral_topn",
    oracle="""
    SELECT n_name, t.c_custkey, t.c_acctbal
    FROM nation, LATERAL (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) t
    ORDER BY n_name, c_custkey
    """,
    tags=("join", "lateral"),
)
def j_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join with correlated ORDER BY + LIMIT (reference:
    TestLateralJoin main_test.go:403). Spark 4 supports true LATERAL
    subqueries; Catalyst decorrelates this into a ranked join rather
    than a per-row re-scan, so it scales like the window top-k form."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n_name, t.c_custkey, t.c_acctbal
        FROM nation, LATERAL (
            SELECT c_custkey, c_acctbal FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) t
        ORDER BY n_name, c_custkey
        """
    )


@register(
    "f_json_table_explode",
    oracle="""
    WITH j AS (
        SELECT user_id,
               '[' || string_agg(props, ',' ORDER BY event_id) || ']' AS arr
        FROM events WHERE user_id < 200 GROUP BY user_id
    )
    SELECT user_id, CAST(SUM(u.k) AS BIGINT) AS total_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM j, LATERAL unnest(json_transform(arr, '[{"k":"BIGINT"}]')) AS t(u)
    GROUP BY user_id ORDER BY user_id
    """,
    tags=("json", "json-table", "explode"),
)
def f_json_table_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON_TABLE semantics (reference: TestJSONTableQueries
    main_test.go:430): a JSON array column re-expanded to rows.
    Spark mapping per SURVEY §2.B: from_json('array<struct<...>>') +
    explode — the array is parsed once per row, stays JVM-side, and
    the explode pipelines inside whole-stage codegen (no Python)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH j AS (
            SELECT user_id,
                   concat('[', concat_ws(',',
                       sort_array(collect_list(struct(event_id, props))).props),
                   ']') AS arr
            FROM events WHERE user_id < 200 GROUP BY user_id
        )
        SELECT user_id, CAST(SUM(u.k) AS BIGINT) AS total_k,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM j LATERAL VIEW explode(from_json(arr, 'array<struct<k:bigint>>')) AS u
        GROUP BY user_id ORDER BY user_id
        """
    )


@register(
    "f_json_table_siblings",
    oracle="""
    WITH j AS (
        SELECT user_id,
               list(CAST(json_extract_string(props, '$.k') AS BIGINT)
                    ORDER BY event_id)
                   FILTER (WHERE event_type = 'click') AS clicks,
               list(CAST(json_extract_string(props, '$.k') AS BIGINT)
                    ORDER BY event_id)
                   FILTER (WHERE event_type = 'view') AS views
        FROM events WHERE user_id < 200 GROUP BY user_id
    ), u AS (
        SELECT user_id, unnest(clicks) AS ck, CAST(NULL AS BIGINT) AS vk
        FROM j WHERE len(clicks) > 0
        UNION ALL
        SELECT user_id, CAST(NULL AS BIGINT), unnest(views)
        FROM j WHERE len(views) > 0
        UNION ALL
        SELECT user_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM j WHERE COALESCE(len(clicks), 0) = 0
              AND COALESCE(len(views), 0) = 0
    )
    SELECT user_id, ck, vk FROM u
    ORDER BY user_id, ck NULLS FIRST, vk NULLS FIRST
    """,
    tags=("json", "json-table", "nested", "siblings"),
)
def f_json_table_siblings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sibling NESTED PATHs in JSON_TABLE — MySQL's union-with-NULLs
    semantics (manual 14.17.6; the reference's own JSON_TABLE suite is
    skipped, main_test.go:437, so the MySQL documentation is the
    authority). Per parent row the siblings produce rows one path at a
    time with the other path's columns NULL; an all-empty union keeps
    the parent alive with one NULL-complemented row.

    The MySQL-dialect query goes through the engine's actual
    JSON_TABLE rewrite (functions/mysql_compat.rewrite_json_table →
    from_json + tagged choice-array + one LATERAL VIEW explode per
    nesting depth, all JVM-side); the oracle reconstructs the same
    union in plain SQL."""
    from myduckserver_spark.functions.mysql_compat import (
        rewrite_json_table,
    )

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    mysql_q = """
        WITH j AS (
            SELECT user_id,
                   concat('[', to_json(named_struct(
                       'clicks',
                       sort_array(collect_list(CASE WHEN event_type = 'click'
                           THEN struct(event_id AS e,
                                CAST(get_json_object(props, '$.k') AS BIGINT)
                                    AS k) END)).k,
                       'views',
                       sort_array(collect_list(CASE WHEN event_type = 'view'
                           THEN struct(event_id AS e,
                                CAST(get_json_object(props, '$.k') AS BIGINT)
                                    AS k) END)).k)), ']') AS doc
            FROM events WHERE user_id < 200 GROUP BY user_id
        )
        SELECT user_id, ck, vk
        FROM j, JSON_TABLE(doc, '$[*]' COLUMNS (
            NESTED PATH '$.clicks[*]' COLUMNS (ck BIGINT PATH '$'),
            NESTED PATH '$.views[*]' COLUMNS (vk BIGINT PATH '$')
        )) AS jt
        ORDER BY user_id, ck NULLS FIRST, vk NULLS FIRST
    """
    return spark.sql(rewrite_json_table(mysql_q))


@register(
    "g_pivot_status",
    oracle="""
    WITH per AS (SELECT o_orderpriority AS prio, o_orderstatus AS st,
                 CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1, 2)
    SELECT prio, CAST("O" AS BIGINT) AS n_open, CAST("F" AS BIGINT) AS n_final,
           CAST("P" AS BIGINT) AS n_pending FROM (
        PIVOT per ON st IN ('O', 'F', 'P') USING SUM(n) GROUP BY prio
    ) ORDER BY prio
    """,
    tags=("groupby", "pivot"),
)
def g_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True PIVOT (not CASE emulation — that's g_conditional_pivot):
    DataFrame groupBy().pivot() with explicit value list, which keeps
    the plan a single hash aggregate (no second scan to discover
    pivot values — the explicit IN list matters at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        per.groupBy("prio")
        .pivot("st", ["O", "F", "P"])
        .sum("n")
        .select(
            "prio",
            F.col("O").alias("n_open"),
            F.col("F").alias("n_final"),
            F.col("P").alias("n_pending"),
        )
        .orderBy("prio")
    )


@register(
    "g_unpivot_status",
    oracle="""
    WITH w AS (SELECT o_orderpriority AS prio,
        CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_open,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_final
      FROM orders GROUP BY 1)
    SELECT prio, status, cnt FROM w
    UNPIVOT (cnt FOR status IN (n_open, n_final))
    ORDER BY prio, status
    """,
    tags=("groupby", "unpivot"),
)
def g_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: wide → long. DataFrame .unpivot() (melt) — a pure
    projection+generate, no shuffle beyond the input aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    w = orders.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("long")
        .alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("long")
        .alias("n_final"),
    )
    return (
        w.unpivot("prio", ["n_open", "n_final"], "status", "cnt")
        .orderBy("prio", "status")
    )


@register(
    "f_regexp_extract",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]{7,})', 1) AS first_long,
           CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS INT) AS n_long
    FROM documents
    WHERE doc_id < 200
    ORDER BY doc_id
    """,
    tags=("functions", "regex"),
)
def f_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_extract_all (GMS function corpus;
    both engines return '' for no-match on extract)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]{7,})", 1).alias("first_long"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{7,}"), 0)).alias(
            "n_long"
        ),
    ).orderBy("doc_id")


@register(
    "f_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           (SELECT CAST(ROUND(SUM(CAST(ROUND(CAST(u.x AS DOUBLE), 3)
                                      AS DECIMAL(18,6))), 2) AS DOUBLE)
            FROM unnest(embedding[1:4]) AS u(x)) AS head_sum
    FROM embeddings
    WHERE vec_id < 200
    ORDER BY vec_id
    """,
    tags=("functions", "array"),
)
def f_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array slice + fold over the embedding column (float32 widened
    to double EXACTLY, rounded, then exact-decimal summed so the fold
    order cannot matter — the only portable way to sum floats)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    head_sum = F.expr(
        """
        aggregate(
          slice(embedding, 1, 4),
          cast(0 as decimal(38,6)),
          (acc, x) -> acc + cast(round(cast(x as double), 3) as decimal(18,6))
        )
        """
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(head_sum, 2).cast("double").alias("head_sum"),
    ).orderBy("vec_id")


@register(
    "g_groupby_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("groupby", "groupby-all"),
)
def g_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (supported verbatim by both engines)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@register(
    "ev_hopping_hour",
    oracle="""
    SELECT w_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
    FROM (
        SELECT time_bucket(INTERVAL 30 MINUTE, ts)
                 - (k * INTERVAL 30 MINUTE) AS w_start,
               value
        FROM events CROSS JOIN (VALUES (0), (1)) t(k)
    )
    GROUP BY w_start
    ORDER BY w_start
    """,
    tags=("events", "window", "hopping"),
)
def ev_hopping_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) 1h windows every 30min via F.window — the
    batch twin of the streaming hop operator (streaming/windows.py).
    Each event lands in exactly 2 windows; the oracle expands that
    membership with a 2-row cross join + time_bucket (both engines
    align buckets to the epoch)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "total")
        .orderBy("w_start")
    )


@register(
    "ev_view_to_purchase_1h",
    oracle="""
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND epoch_us(v.ts) >= epoch_us(p.ts) - 3600000000
     AND epoch_us(v.ts) <= epoch_us(p.ts)
    GROUP BY p.user_id
    ORDER BY p.user_id
    """,
    tags=("events", "range-join"),
)
def ev_view_to_purchase_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: views within the hour before each
    purchase, counted per user. Uses the banded range-join operator
    (operators/rangejoin.py): time is quantized into 1h cells so the
    shuffle key is (user, cell) — comparisons are bounded to a band
    and hot users spread across cells, unlike the naive
    equi-join-on-user + filter plan (O(views·purchases) per user).
    The DuckDB oracle states the same join as a plain non-equi range
    predicate (its IEJoin handles that shape natively)."""
    from myduckserver_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    pairs = interval_join(
        p, v, by="user_id", left_ts="ts", right_ts="ts",
        lower_s=-3600.0, upper_s=0.0,
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "f_mysql_client_fns",
    oracle=r"""
    SELECT o_orderkey AS k,
           to_base(o_orderkey, 8) AS oct_s,
           substr(o_orderpriority, 2, 3) AS mid_s,
           CAST((((200801 // 100) * 12 + (200801 % 100) - 1
                  + (o_orderkey % 30)) // 12) * 100
                + (((200801 // 100) * 12 + (200801 % 100) - 1
                    + (o_orderkey % 30)) % 12) + 1 AS INT) AS pa,
           CAST(((200912 // 100) * 12 + (200912 % 100))
                - (((200801 + (o_orderkey % 12)) // 100) * 12
                   + ((200801 + (o_orderkey % 12)) % 100)) AS INT) AS pd,
           CAST(regexp_matches(
                '10.0.0.' || CAST(o_orderkey % 300 AS VARCHAR),
                '^((25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9]?[0-9])$'
           ) AS INT) AS ip4,
           substr(CAST(o_orderdate AS VARCHAR), 1, 7) AS cast_char
    FROM orders WHERE o_orderkey <= 200 ORDER BY k
    """,
    tags=("functions", "mysql-shim", "client"),
)
def f_mysql_client_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 client-function shims under the gate: OCT, MID,
    PERIOD_ADD/PERIOD_DIFF, IS_IPV4, CAST(... AS CHAR(n)) truncation —
    the MySQL text goes through the FULL dialect front door
    (translate_mysql) and must value-match a DuckDB reconstruction."""
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(translate_mysql("""
        SELECT o_orderkey AS k,
               OCT(o_orderkey) AS oct_s,
               MID(o_orderpriority, 2, 3) AS mid_s,
               PERIOD_ADD(200801, o_orderkey % 30) AS pa,
               PERIOD_DIFF(200912, 200801 + (o_orderkey % 12)) AS pd,
               IS_IPV4(CONCAT('10.0.0.', CAST(o_orderkey % 300 AS CHAR))) AS ip4,
               CAST(CAST(o_orderdate AS DATE) AS CHAR(7)) AS cast_char
        FROM orders WHERE o_orderkey <= 200 ORDER BY k
    """))
