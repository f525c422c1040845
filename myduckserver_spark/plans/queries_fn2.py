"""Date parse/arithmetic + multi-field JSON query coverage
(ref: TestDateParse main_test.go:2177, TestJsonScripts :2185)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table


@register(
    "f_date_parse_roundtrip",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                         '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS reparsed,
           CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y')
                AS TIMESTAMP) AS reparsed_dmy
    FROM orders
    WHERE o_orderkey <= 50
    ORDER BY o_orderkey
    """,
    tags=("functions", "date-parse"),
)
def f_date_parse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format → parse round-trip (STR_TO_DATE/DATE_FORMAT parity)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    fmt = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return (
        orders.select(
            "o_orderkey",
            fmt.alias("formatted"),
            F.to_timestamp(fmt, "yyyy-MM-dd HH:mm:ss").alias("reparsed"),
            F.to_timestamp(
                F.date_format("o_orderdate", "dd/MM/yyyy"), "dd/MM/yyyy"
            ).alias("reparsed_dmy"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "f_date_arith",
    oracle="""
    -- NB: the two interval additions use structurally different left
    -- arguments (raw ts vs CAST AS DATE) to dodge a DuckDB v1.0.0 CSE
    -- bug that collapses `col + INTERVAL a` / `col + INTERVAL b` into
    -- one expression.
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS plus_30d,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_1mo,
           CAST(date_diff('day', o_orderdate,
                TIMESTAMP '2000-01-01 00:00:00') AS INT) AS days_to_2000,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(make_date(CAST(EXTRACT(year FROM o_orderdate) AS INT), 6, 15)
                AS TIMESTAMP) AS mid_june
    FROM orders
    WHERE o_orderkey <= 50
    ORDER BY o_orderkey
    """,
    tags=("functions", "date-arith"),
)
def f_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval addition, datediff, last_day, make_date."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    return (
        orders.select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
            F.add_months("o_orderdate", 1).cast("timestamp").alias("plus_1mo"),
            F.datediff(
                F.lit("2000-01-01").cast("date"), F.col("o_orderdate")
            ).cast("int").alias("days_to_2000"),
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
            F.make_date(F.year("o_orderdate"), F.lit(6), F.lit(15)).cast("timestamp").alias("mid_june"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "ev_json_multi_field",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(j, '$.inner.k') AS INTEGER) AS k,
           json_extract_string(j, '$.type') AS typ,
           CAST(json_extract_string(j, '$.uid') AS BIGINT) AS uid
    FROM (
        SELECT event_id,
               concat('{"inner":', props, ',"type":"', event_type,
                      '","uid":', CAST(user_id AS VARCHAR), '}') AS j
        FROM events WHERE event_id <= 200
    ) t
    ORDER BY event_id
    """,
    tags=("functions", "json", "json-table"),
)
def ev_json_multi_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested multi-field JSON extraction (JSON_TABLE-style shred:
    one JSON doc → several typed columns)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    j = F.concat(
        F.lit('{"inner":'),
        F.col("props"),
        F.lit(',"type":"'),
        F.col("event_type"),
        F.lit('","uid":'),
        F.col("user_id").cast("string"),
        F.lit("}"),
    )
    return (
        ev.select("event_id", j.alias("j"))
        .select(
            "event_id",
            F.get_json_object("j", "$.inner.k").cast("int").alias("k"),
            F.get_json_object("j", "$.type").alias("typ"),
            F.get_json_object("j", "$.uid").cast("long").alias("uid"),
        )
        .orderBy("event_id")
    )


@register(
    "ev_from_json_struct",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER)
                              > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INT)
               AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("functions", "json"),
)
def ev_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, then aggregate on the field —
    the schema-on-read JSON path (vs string extraction)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("p.k") > 50, 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
            F.max("p.k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )
