"""SQL-surface wave 5: safe casts, boolean aggregates, regression
aggregates, and BY NAME set ops.

All four are DuckDB passthrough surface on the reference's Postgres
front door (SURVEY.md §2.D: full DuckDB SQL) and exist natively in
Spark — the queries pin the exact semantics seam (NULL-on-failure
casts, bool agg NULL handling, FP aggregate rounding, column-name
alignment) so dialect drift shows up as a gate failure, not a silent
wrong answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount, o_bcount
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table


@register(
    "f_try_cast",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(p_type AS INTEGER) AS bad_int,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS roundtrip_int,
           TRY_CAST(p_retailprice AS INTEGER)
               + TRY_CAST(3000000000 AS INTEGER) AS overflow_int,
           TRY_CAST(substr(p_name, 1, 3) AS DOUBLE) AS bad_double
    FROM part
    WHERE p_partkey <= 200
    ORDER BY p_partkey
    """,
    tags=("functions", "cast"),
)
def f_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST semantics: failed parses and integer overflow yield
    NULL instead of an error (reference surface: DuckDB TRY_CAST via
    the pg front door; MySQL's CAST soft-error mode on the GMS side).

    overflow_int is NULL for every row (3000000000 exceeds INT32), and
    bad_int/bad_double are NULL for non-numeric strings — asserting
    Spark's try_cast and DuckDB's TRY_CAST agree on both failure
    classes. Scale: map-only; TRY_CAST stays in codegen, unlike a
    UDF-based safe parse.
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_partkey") <= 200)
        .select(
            "p_partkey",
            F.col("p_type").try_cast("int").alias("bad_int"),
            F.col("p_size")
            .cast("string")
            .try_cast("int")
            .alias("roundtrip_int"),
            (
                F.col("p_retailprice").try_cast("int")
                + F.lit(3000000000).try_cast("int")
            ).alias("overflow_int"),
            F.substring("p_name", 1, 3).try_cast("double").alias("bad_double"),
        )
        .orderBy("p_partkey")
    )


@register(
    "g_bool_aggs",
    oracle=f"""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_totalprice > 250000.0) AS any_over_250k,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
           {o_bcount("n")}
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("aggregate", "boolean"),
)
def g_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (SQL-standard EVERY/ANY): bool_and, bool_or,
    count_if per order status.

    Scale: all three are algebraic aggregates with map-side partials —
    a full scan collapses to one tiny row per status before the
    exchange, same as COUNT.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 250000.0).alias(
                "any_over_250k"
            ),
            F.count_if(F.col("o_orderpriority") == "1-URGENT")
            .cast("long")
            .alias("n_urgent"),
            bcount("n"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "f_regr_suite",
    oracle="""
    SELECT o_orderstatus,
           CAST(regr_count(o_totalprice, o_custkey) AS BIGINT) AS n_pairs,
           ROUND(regr_slope(o_totalprice, o_custkey), 6) AS slope,
           ROUND(regr_intercept(o_totalprice, o_custkey), 4) AS intercept,
           ROUND(regr_avgx(o_totalprice, o_custkey), 4) AS avg_x,
           ROUND(regr_avgy(o_totalprice, o_custkey), 4) AS avg_y
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("aggregate", "stats", "regression"),
)
def f_regr_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/avgx/avgy/
    count) — the SQL:2003 OLS family both engines implement natively.

    Rounding absorbs FP merge-order noise, same policy as
    f_stats_suite. Scale: single-pass algebraic aggregates (sums of
    x, y, xy, x²) with map-side partials — never a window or a join.
    """
    orders = load_table(spark, sf_dir, "orders")
    y, x = F.col("o_totalprice"), F.col("o_custkey")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.regr_count(y, x).cast("long").alias("n_pairs"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_avgx(y, x), 4).alias("avg_x"),
            F.round(F.regr_avgy(y, x), 4).alias("avg_y"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "s_union_by_name",
    oracle=f"""
    WITH a AS (
        SELECT n_name AS name, 'nation' AS kind FROM nation
    ), b AS (
        SELECT 'region' AS kind, r_name AS name FROM region
    )
    SELECT name, kind, {o_bcount("n")}
    FROM (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
    GROUP BY name, kind
    ORDER BY name, kind
    """,
    tags=("setops", "union"),
)
def s_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL BY NAME: columns align by name, not position —
    Spark unionByName == DuckDB UNION ALL BY NAME (the positional
    union of these two inputs would scramble name/kind).

    Scale: union is plan-level concatenation (zero cost); the
    aggregate dedups after, shuffling only the small key space.
    """
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    a = nation.select(
        F.col("n_name").alias("name"), F.lit("nation").alias("kind")
    )
    b = region.select(
        F.lit("region").alias("kind"), F.col("r_name").alias("name")
    )
    return (
        a.unionByName(b)
        .groupBy("name", "kind")
        .agg(bcount("n"))
        .orderBy("name", "kind")
    )
