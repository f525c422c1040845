"""Every registered query must hash-match its DuckDB oracle.

This is the local twin of the driver's t2 correctness gate
(CORRECTNESS_r{N}.json); run with SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
for the exact driver scale.
"""

import pytest

from myduckserver_spark.oracle import compare_one
from myduckserver_spark.plans.registry import REGISTRY, all_queries

all_queries()  # populate REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    res = compare_one(spark, name, q.spark, q.oracle, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0


def test_comparator_detects_mismatches(spark, sf_dir):
    """Negative control: the comparator must flag value, row-count, and
    column-name divergence — not vacuously pass (guards the driver's t2
    gate against a broken harness)."""
    from pyspark.sql import functions as F

    from myduckserver_spark.tables import load_table

    def spark_fn(sp, d):
        return load_table(sp, d, "region").agg(
            F.count("*").cast("bigint").alias("n")
        )

    good = compare_one(
        spark, "nc_ok", spark_fn, "SELECT count(*) AS n FROM region", sf_dir
    )
    assert good.ok
    value = compare_one(
        spark, "nc_val", spark_fn,
        "SELECT count(*) + 1 AS n FROM region", sf_dir,
    )
    assert not value.ok
    rows = compare_one(
        spark, "nc_rows", spark_fn,
        "SELECT CAST(1 AS BIGINT) AS n UNION ALL SELECT CAST(2 AS BIGINT)",
        sf_dir,
    )
    assert not rows.ok and "row count" in rows.detail
    cols = compare_one(
        spark, "nc_cols", spark_fn,
        "SELECT count(*) AS wrong FROM region", sf_dir,
    )
    assert not cols.ok and "column" in cols.detail
