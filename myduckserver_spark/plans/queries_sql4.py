"""SQL-surface wave 4: recursive CTEs, aggregate FILTER, grouping
flags, max_by/min_by, and QUALIFY-semantics parity.

These close the remaining gaps between the reference's DuckDB
passthrough surface (§2.B / §2.D of SURVEY.md — DuckDB supports all
of WITH RECURSIVE / FILTER / GROUPING / arg_max / QUALIFY, so the
Postgres front door of the reference answers them) and our Spark
engine. Spark 4 supports WITH RECURSIVE natively; QUALIFY does not
exist in Spark SQL, so its semantics are expressed as a ranked
window + filter — the same rewrite the engine front door applies
(reference parity: pgserver passthrough, connection_handler.go:411).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount, dsum, o_bcount, o_dsum
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table


@register(
    "c_recursive_month_spine",
    oracle="""
    WITH RECURSIVE m(mon) AS (
        SELECT 1
        UNION ALL
        SELECT mon + 1 FROM m WHERE mon < 12
    )
    SELECT m.mon,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0), 2)
                AS DOUBLE) AS month_revenue
    FROM m
    LEFT JOIN orders
      ON month(o_orderdate) = m.mon AND year(o_orderdate) = 1995
    GROUP BY m.mon
    ORDER BY m.mon
    """,
    tags=("cte", "recursive"),
)
def c_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine (1..12) left-joined to 1995 order
    totals — months with zero orders still appear (the classic
    gap-filling date-spine pattern).

    Spark 4 executes recursive CTEs natively (UnionLoop); the
    recursion here is 12 driver-side iterations over one-row frames,
    then one broadcast-able 12-row spine joined to the fact table —
    at 100 TB the spine stays tiny so the join broadcasts and the
    only shuffle is the month aggregation (12 groups).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_rcte_v"
    )
    return spark.sql(
        """
        WITH RECURSIVE m(mon) AS (
            SELECT 1
            UNION ALL
            SELECT mon + 1 FROM m WHERE mon < 12
        )
        SELECT m.mon,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
               CAST(ROUND(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 0), 2)
                    AS DOUBLE) AS month_revenue
        FROM m
        LEFT JOIN orders_rcte_v
          ON month(o_orderdate) = m.mon AND year(o_orderdate) = 1995
        GROUP BY m.mon
        ORDER BY m.mon
        """
    )


@register(
    "g_filter_clause",
    oracle=f"""
    SELECT o_orderpriority,
           {o_bcount("n_orders")},
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
               AS n_finished,
           {o_dsum("o_totalprice", "all_revenue")},
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                FILTER (WHERE o_orderstatus = 'O'), 2) AS DOUBLE)
               AS open_revenue
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("aggregation", "filter-clause"),
)
def g_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate FILTER (WHERE …) clause: conditional counts and sums
    in a single pass (SQL:2003 syntax DuckDB passes through for the
    reference's pg front door).

    Spark expresses the same single-pass plan with count(when(...))
    / sum(when(...)) — one shuffle, one aggregate, no self-join; the
    open_revenue sum keeps NULL (not 0) for groups with no match,
    matching FILTER semantics exactly.
    """
    o = load_table(spark, sf_dir, "orders")
    dec_price = F.col("o_totalprice").cast("decimal(18,6)")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            bcount("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1))
            .cast("long")
            .alias("n_finished"),
            dsum("o_totalprice", "all_revenue"),
            F.round(F.sum(F.when(F.col("o_orderstatus") == "O", dec_price)), 2)
            .cast("double")
            .alias("open_revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "g_grouping_flags",
    oracle=f"""
    SELECT r_name,
           n_name,
           CAST(GROUPING(r_name) AS INTEGER) * 2
               + CAST(GROUPING(n_name) AS INTEGER) AS gid,
           {o_bcount("n_cust")},
           {o_dsum("c_acctbal", "sum_bal")}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST
    """,
    tags=("aggregation", "rollup", "grouping"),
)
def g_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) with GROUPING() flags distinguishing
    real NULL keys from subtotal rows — the flag combination is
    exposed as a single gid so subtotal levels are addressable
    (reference surface: DuckDB GROUPING via pg passthrough; MySQL
    WITH ROLLUP via GMS corpus, main_test.go:210).

    Scale: rollup is one Expand (3 grouping sets) + one shuffle on
    the grouping keys; no re-aggregation pass per level.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    gid = (
        F.grouping("r_name").cast("int") * 2
        + F.grouping("n_name").cast("int")
    ).alias("gid")
    return (
        joined.rollup("r_name", "n_name")
        .agg(gid, bcount("n_cust"), dsum("c_acctbal", "sum_bal"))
        .select("r_name", "n_name", "gid", "n_cust", "sum_bal")
        .orderBy(
            "gid",
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


@register(
    "g_max_by_extremes",
    oracle="""
    SELECT n_name,
           max_by(c_name, CAST(c_acctbal * 100 AS BIGINT) * 10000000
                          + c_custkey) AS richest_cust,
           min_by(c_name, CAST(c_acctbal * 100 AS BIGINT) * 10000000
                          + c_custkey) AS poorest_cust,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("aggregation", "max_by"),
)
def g_max_by_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (DuckDB arg_max/arg_min, passed through by the
    reference's pg front door): the customer name at each nation's
    balance extremes, in ONE aggregation pass — no self-join back to
    the fact table.

    Determinism: the ordering key packs (acctbal_cents, custkey) into
    one BIGINT so balance ties resolve identically in both engines.
    Scale: single shuffle on n_name; compare with the window
    equivalent (w_top3_orders_per_customer) which must sort within
    partitions — max_by is the cheaper plan for k=1.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    key = (
        (F.col("c_acctbal") * 100).cast("bigint") * F.lit(10000000)
        + F.col("c_custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.max_by("c_name", key).alias("richest_cust"),
            F.min_by("c_name", key).alias("poorest_cust"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "w_qualify_top2_per_region",
    oracle="""
    SELECT r_name, n_name, n_cust
    FROM (
        SELECT r_name, n_name,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    )
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY r_name ORDER BY n_cust DESC, n_name) <= 2
    ORDER BY r_name, n_cust DESC, n_name
    """,
    tags=("window", "qualify"),
)
def w_qualify_top2_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY semantics (filter on a window result — DuckDB syntax
    the reference's pg front door passes through): top-2 nations by
    customer count within each region.

    Spark has no QUALIFY keyword; the engine front door rewrites it
    to exactly this ranked-window + filter, which Catalyst executes
    as one shuffle (agg) + one window sort per region partition. The
    rank filter also enables Spark's WindowGroupLimit pushdown so
    each partition keeps only the top rows before the final filter.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    counts = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(bcount("n_cust"))
    )
    w = W.partitionBy("r_name").orderBy(
        F.col("n_cust").desc(), F.col("n_name")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
        .orderBy("r_name", F.col("n_cust").desc(), "n_name")
    )
