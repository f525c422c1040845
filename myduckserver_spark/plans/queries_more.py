"""Coverage widening: deterministic sampling, multi-distinct
aggregation, named windows, struct expressions, approximate sketches.

These fill SURVEY.md §2 corners the first 105 queries didn't pin:
the GMS corpus exercises multi-DISTINCT aggregates and named windows
(TestQueriesSimple main_test.go:210, TestNamedWindows :1959); sampling
and sketches are 100 TB-pipeline staples (a training-data pipeline
samples and profiles before it commits to a full pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount, dsum, o_bcount, o_dsum
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table, register_views


@register(
    "samp_hash_bucket",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
           {o_dsum("l_extendedprice", "sample_revenue")},
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) = '0'
    """,
    tags=("sampling", "deterministic"),
)
def samp_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling: md5-bucket on the key → exact
    1/16 sample, identical in every engine and on every run (unlike
    TABLESAMPLE, which is RNG- and partition-dependent).

    Scale: a pure map-side filter — no shuffle, no RNG state; the
    sample rate tunes by taking more hex prefixes. This is how a
    100 TB pipeline takes a reproducible profiling slice.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sampled = li.filter(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1) == "0"
    )
    return sampled.agg(
        bcount("n_sampled"),
        dsum("l_extendedprice", "sample_revenue"),
        F.min("l_orderkey").cast("long").alias("min_key"),
    )


@register(
    "g_multi_distinct",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           {o_dsum("l_quantity", "sum_qty")}
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregation", "distinct", "expand"),
)
def g_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two DISTINCT aggregates over different columns plus a plain sum
    in one GROUP BY — planned via Expand (each input row is replicated
    per distinct group, then de-duplicated before the final agg).

    Scale: the Expand triples the shuffle volume — that's inherent to
    exact multi-distinct; the approximate alternative is
    apx_ndv_by_flag.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
            F.countDistinct("l_partkey").cast("long").alias("n_part"),
            dsum("l_quantity", "sum_qty"),
        )
        .orderBy("l_returnflag")
    )


_NAMED_WINDOW_SQL = """
SELECT o_custkey,
       o_orderkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w, 2)
            AS DOUBLE) AS running_spend
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, rn
"""


@register(
    "w_named_window",
    oracle=_NAMED_WINDOW_SQL,
    tags=("window", "named-window"),
)
def w_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause shared by two window functions — the same
    SQL text runs on Spark and DuckDB (TestNamedWindows
    main_test.go:1959). One window definition → one shuffle+sort,
    reused by both functions.
    """
    register_views(spark, sf_dir)
    return spark.sql(_NAMED_WINDOW_SQL)


@register(
    "f_struct_field",
    oracle="""
    SELECT n_nationkey,
           struct_pack(key := n_nationkey, name := n_name)['name'] AS sname,
           struct_pack(key := n_nationkey, name := n_name)['key']
               + 100 AS skey_plus
    FROM nation
    ORDER BY n_nationkey
    """,
    tags=("struct", "nested"),
)
def f_struct_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access (the pg/DuckDB side exposes
    STRUCT_PACK via internal macros, catalog/internal_macro.go:41-44).
    Catalyst collapses the construct-then-extract to the plain column.
    """
    nat = load_table(spark, sf_dir, "nation")
    s = F.struct(
        F.col("n_nationkey").alias("key"), F.col("n_name").alias("name")
    )
    return (
        nat.select(
            "n_nationkey",
            s.getField("name").alias("sname"),
            (s.getField("key") + 100).alias("skey_plus"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "apx_ndv_by_flag",
    oracle="""
    SELECT l_returnflag, TRUE AS supp_within_5pct, TRUE AS part_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("approx", "sketch", "hll"),
)
def apx_ndv_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per group — the sketch
    path a 100 TB profile uses instead of the Expand-heavy exact
    multi-distinct (g_multi_distinct is the exact twin).

    HLL estimates are engine-specific (DuckDB's sketch differs by
    design), so the hash gate compares a TOLERANCE VERDICT both engines
    can agree on: Spark computes the approximate AND exact NDV per
    group and emits `within_5pct` booleans (HLL++ rsd here is 5%, so
    a healthy sketch always passes); the oracle emits literal TRUE per
    group. A broken sketch, a broken exact path, or a wrong group set
    all flip the hash — this row is a hard driver check of the sketch's
    error contract, not of sketch internals.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey").alias("__apx_s"),
            F.countDistinct("l_suppkey").alias("__ex_s"),
            F.approx_count_distinct("l_partkey").alias("__apx_p"),
            F.countDistinct("l_partkey").alias("__ex_p"),
        )
        .selectExpr(
            "l_returnflag",
            "ABS(CAST(__apx_s AS DOUBLE) / __ex_s - 1.0) <= 0.05"
            " AS supp_within_5pct",
            "ABS(CAST(__apx_p AS DOUBLE) / __ex_p - 1.0) <= 0.05"
            " AS part_within_5pct",
        )
        .orderBy("l_returnflag")
    )


@register(
    "s_union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT s_nationkey AS nk FROM supplier
    ORDER BY nk
    """,
    tags=("setop", "distinct"),
)
def s_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct UNION (set semantics — dedups across both inputs;
    s_union_all is the multiset twin). One hash-dedup shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    a = cust.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nk")
    )
    b = supp.select(F.col("s_nationkey").alias("nk"))
    return a.union(b).distinct().orderBy("nk")


@register(
    "j_right_outer",
    oracle="""
    SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_cust
    FROM (SELECT * FROM customer WHERE c_acctbal > 9900) c
    RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("join", "right-outer"),
)
def j_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join keeping unmatched dimension rows (count=0).

    Scale: Spark plans this as a broadcast of the small preserved side
    flipped to a left join — no shuffle of the big side.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_acctbal") > 9900
    )
    nat = load_table(spark, sf_dir, "nation")
    return (
        cust.join(
            nat, cust["c_nationkey"] == nat["n_nationkey"], "right"
        )
        .groupBy("n_name")
        .agg(F.count("c_custkey").cast("long").alias("n_cust"))
        .orderBy("n_name")
    )


@register(
    "j_skew_salted",
    oracle=f"""
    SELECT c.c_nationkey,
           {o_dsum("o.o_totalprice", "revenue")},
           {o_bcount("n_orders")}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    tags=("join", "skew", "salting"),
)
def j_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.salted_join) vs a plain-join
    oracle — proves the salt fan-out changes the shuffle layout, not
    the result.

    Scale: the salt spreads one pathological hot key over salt_n
    reducers; the scatter is a deterministic hash (not rand()), so
    retries partition identically. AQE's skew split covers the
    run-of-the-mill case; explicit salting is for keys that dwarf a
    whole executor.
    """
    from myduckserver_spark.operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    from myduckserver_spark.plans.helpers import dsum

    return (
        salted_join(orders, cust, "c_custkey", salt_n=8)
        .groupBy("c_nationkey")
        .agg(dsum("o_totalprice", "revenue"), bcount("n_orders"))
        .orderBy("c_nationkey")
    )


@register(
    "w_groups_frame",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             DENSE_RANK() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate) AS __gk
      FROM orders WHERE o_custkey < 200
    )
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY __gk
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS grp_spend
    FROM r
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "groups-frame"),
)
def w_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS window frames under the oracle gate (round-8 verdict
    item #5): the MySQL text uses GROUPS BETWEEN 1 PRECEDING AND
    CURRENT ROW over order DATES (ties guaranteed — same-day orders
    form peer groups); the Spark side lowers it through
    rewrite_groups_frames (RANGE over an injected dense_rank), and
    DuckDB evaluates an EXPLICIT dense_rank reconstruction of the
    same group-offset semantics — two engines, independent plans,
    value-hash equality. (DuckDB's native GROUPS mode is unimplemented
    in this build, so the reconstruction IS the reference semantics.)

    Scale: one hash shuffle on the partition key; the injected
    dense_rank shares the same window exchange as the frame itself."""
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    register_views(spark, sf_dir)
    return spark.sql(translate_mysql("""
        SELECT o_custkey, o_orderkey,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW), 2)
                 AS DOUBLE) AS grp_spend
        FROM orders WHERE o_custkey < 200
        ORDER BY o_custkey, o_orderkey
    """))
