"""Extended query surface: remaining TPC-H shapes adapted to the test
schema + function-coverage suites (SURVEY.md §2.B categories the core
file doesn't yet touch: disjunctive predicates, null semantics,
bitwise ops, ordered string/array aggregation, distribution windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount, dec, o_bcount, o_dsum
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table

_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, yr,
           {o_dsum("volume", "revenue")}
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
               {_REV} AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
            OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
    ) shipping
    GROUP BY supp_nation, cust_nation, yr
    ORDER BY supp_nation, cust_nation, yr
    """,
    tags=("join", "tpch"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by year."""
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6")
    ) | ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9"))
    return (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.round(F.sum(dec(F.expr(_REV))), 2).cast("double").alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               n1.n_name AS supp_nation,
               CAST({_REV} AS DECIMAL(18,6)) AS volume
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region   ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    )
    SELECT yr,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_9'
                              THEN volume ELSE 0 END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY yr
    ORDER BY yr
    """,
    tags=("join", "tpch", "share"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional revenue per year.

    Share = exact decimal sums → one IEEE divide (cross-engine exact).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    vol = F.expr(_REV).cast("decimal(18,6)")
    base = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.col("supp_nation"),
            vol.alias("volume"),
        )
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,6)")
    ))
    return (
        base.groupBy("yr")
        .agg(
            (num.cast("double") / F.sum("volume").cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("yr")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              - p_retailprice * l_quantity * 0.05
                         AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%5%'
    GROUP BY n_name, yr
    ORDER BY nation, yr
    """,
    tags=("join", "tpch"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit (retailprice-proxy cost) per nation-year."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%5%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.05
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.round(F.sum(profit.cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", "yr")
    )


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_quantity >= 30
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("join", "case", "tpch"),
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted: high/low-priority line counts."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST({_REV} AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("join", "tpch", "share"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue percentage."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.expr(_REV).cast("decimal(18,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"))
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("join", "distinct", "tpch"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct suppliers per part group."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q19_disjunctive",
    oracle=f"""
    SELECT {o_dsum(_REV, "revenue")}, {o_bcount("n")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand IN ('Brand#33', 'Brand#34') AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("join", "disjunctive", "tpch"),
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate across the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & (q >= 10) & (q <= 20)
        )
        | (
            F.col("p_brand").isin("Brand#33", "Brand#34")
            & F.col("p_size").between(1, 35)
            & (q >= 20) & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.round(F.sum(dec(F.expr(_REV))), 2).cast("double").alias("revenue"),
            bcount("n"),
        )
    )


@register(
    "q22_wealthy_inactive",
    oracle="""
    SELECT SUBSTRING(c_name, 10, 1) AS digit,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE SUBSTRING(c_name, 10, 1) IN ('1', '3', '5', '7', '9')
      AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
          FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY SUBSTRING(c_name, 10, 1)
    ORDER BY digit
    """,
    tags=("subquery", "anti-join", "tpch"),
)
def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: above-average-balance customers w/o orders."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT SUBSTRING(c_name, 10, 1) AS digit,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS totacctbal
        FROM customer
        WHERE SUBSTRING(c_name, 10, 1) IN ('1', '3', '5', '7', '9')
          AND c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                     / COUNT(*)
              FROM customer WHERE c_acctbal > 0.0
          )
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY SUBSTRING(c_name, 10, 1)
        ORDER BY digit
        """
    )


# ------------------------------------------------------------ window extras


@register(
    "w_distribution",
    oracle="""
    SELECT p_partkey,
           ROUND(CUME_DIST() OVER w, 6) AS cd,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           nth_value(p_partkey, 3) OVER (
               ORDER BY p_retailprice, p_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_cheapest
    FROM part
    WINDOW w AS (ORDER BY p_retailprice, p_partkey)
    ORDER BY p_partkey
    """,
    tags=("window", "distribution"),
)
def w_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUME_DIST / PERCENT_RANK / NTH_VALUE (exact int-ratio doubles).

    Scale: global-total-order distribution functions come from
    operators/globalrank.py (range partition + prefix-count correction)
    instead of a single-task unpartitioned window; NTH_VALUE over the
    full frame is a broadcast of the one row at global row_number == 3.
    """
    from ..operators import globalrank as gr

    part = load_table(spark, sf_dir, "part")
    g = gr.with_global_order(part, F.asc("p_retailprice"), F.asc("p_partkey"))
    g = gr.global_nth_value(g, "p_partkey", 3, "third_cheapest")
    return g.select(
        "p_partkey",
        F.round(F.col(gr.CUME_DIST), 6).alias("cd"),
        F.round(F.col(gr.PERCENT_RANK), 6).alias("pr"),
        "third_cheapest",
    ).orderBy("p_partkey")


@register(
    "w_partition_only",
    oracle="""
    SELECT o_orderkey,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS cust_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey), 2) AS DOUBLE) AS cust_total
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("window", "unordered"),
)
def w_partition_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition window aggregates (no ORDER BY → full frame)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    return (
        orders.select(
            "o_orderkey",
            F.count(F.lit(1)).over(w).cast("long").alias("cust_orders"),
            F.round(F.sum(dec("o_totalprice")).over(w), 2)
            .cast("double")
            .alias("cust_total"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------- function suites


@register(
    "f_string_agg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("functions", "string-agg"),
)
def f_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (GROUP_CONCAT/LISTAGG family) via
    sort_array(collect_list) — deterministic regardless of partitioning."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations")
        )
        .orderBy("n_regionkey")
    )


@register(
    "f_array_agg_sorted",
    oracle="""
    SELECT r_regionkey, list_sort(list(n_name)) AS nation_list,
           CAST(len(list(n_name)) AS INT) AS n
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_regionkey
    ORDER BY r_regionkey
    """,
    tags=("functions", "array"),
)
def f_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array result column (nested type output)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        region.join(nation, F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("r_regionkey")
        .agg(
            F.sort_array(F.collect_list("n_name")).alias("nation_list"),
            F.count(F.lit(1)).cast("int").alias("n"),
        )
        .orderBy("r_regionkey")
    )


@register(
    "f_null_semantics",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CAST(o_totalprice + NULL AS DOUBLE) AS null_arith,
           CAST(o_orderstatus IS NOT DISTINCT FROM 'F' AS INT) AS nullsafe_f,
           CAST(CASE WHEN NULLIF('x', 'x') IS NULL THEN 1 ELSE 0 END AS INT)
               AS nullif_is_null
    FROM orders
    WHERE o_orderkey <= 100
    ORDER BY o_orderkey
    """,
    tags=("functions", "null"),
)
def f_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL propagation, NULLIF/COALESCE, null-safe equality (<=>)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return (
        orders.select(
            "o_orderkey",
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
                "status_or_open"
            ),
            (F.col("o_totalprice") + F.lit(None)).cast("double").alias("null_arith"),
            F.col("o_orderstatus").eqNullSafe("F").cast("int").alias("nullsafe_f"),
            F.when(F.nullif(F.lit("x"), F.lit("x")).isNull(), 1)
            .otherwise(0)
            .cast("int")
            .alias("nullif_is_null"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "f_string_suite2",
    oracle="""
    SELECT s_suppkey,
           translate(s_name, '#', '-') AS tr,
           repeat(left(s_name, 2), 2) AS rep,
           reverse(s_name) AS rev,
           CAST(strpos(s_name, 'r#') AS INT) AS pos,
           right(s_name, 3) AS r3,
           split_part(s_name, '#', 2) AS num_part,
           regexp_extract(s_name, '[0-9]+') AS digits
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("functions", "string"),
)
def f_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function battery (translate/repeat/reverse/
    instr/right/split_part/regexp_extract)."""
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.select(
            "s_suppkey",
            F.translate("s_name", "#", "-").alias("tr"),
            F.repeat(F.substring("s_name", 1, 2), 2).alias("rep"),
            F.reverse(F.col("s_name")).alias("rev"),
            F.instr("s_name", "r#").cast("int").alias("pos"),
            F.substring(F.col("s_name"), -3, 3).alias("r3"),
            F.split_part(F.col("s_name"), F.lit("#"), F.lit(2)).alias("num_part"),
            F.regexp_extract("s_name", "[0-9]+", 0).alias("digits"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "f_bitwise",
    oracle="""
    SELECT p_partkey,
           CAST(p_partkey & 255 AS BIGINT) AS b_and,
           CAST(p_partkey | 4096 AS BIGINT) AS b_or,
           CAST(xor(p_partkey, p_size) AS BIGINT) AS b_xor,
           CAST(p_partkey << 2 AS BIGINT) AS b_shl,
           CAST(p_partkey >> 1 AS BIGINT) AS b_shr,
           CAST(bit_count(p_partkey) AS INT) AS b_cnt
    FROM part
    WHERE p_partkey <= 64
    ORDER BY p_partkey
    """,
    tags=("functions", "bitwise"),
)
def f_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator surface (&, |, xor, shifts, popcount)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 64)
    return (
        part.select(
            "p_partkey",
            F.expr("p_partkey & 255").cast("long").alias("b_and"),
            F.expr("p_partkey | 4096").cast("long").alias("b_or"),
            F.expr("p_partkey ^ p_size").cast("long").alias("b_xor"),
            F.expr("shiftleft(p_partkey, 2)").cast("long").alias("b_shl"),
            F.expr("shiftright(p_partkey, 1)").cast("long").alias("b_shr"),
            F.bit_count("p_partkey").cast("int").alias("b_cnt"),
        )
        .orderBy("p_partkey")
    )


@register(
    "f_in_between",
    oracle=f"""
    SELECT o_orderpriority, {o_bcount("n")}
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND o_orderpriority NOT IN ('5-LOW')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("filter", "in-list"),
)
def f_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list / NOT IN / BETWEEN predicate combination."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(50000, 150000)
            & ~F.col("o_orderpriority").isin("5-LOW")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(bcount("n"))
        .orderBy("o_orderpriority")
    )
