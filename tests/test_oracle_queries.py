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
