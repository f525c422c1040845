"""Query registry: every operator from SURVEY.md §2 gets one entry.

Each entry pairs a Spark implementation (DataFrame-first, declarative
so Catalyst optimizes it) with an equivalent ANSI/DuckDB SQL oracle.
The driver hash-compares the two at sf0.01 — see __spark_entry__.py.

Determinism rules (so a Spark result hash-matches DuckDB exactly):
- Aggregate doubles through DECIMAL(18,6): exact + associative, so
  partial/parallel aggregation order cannot change the result.
  Final cast pins the output schema (DuckDB SUM widens to DECIMAL(38,x),
  Spark to (28,x) — both sides cast to the same (38,x)).
- Integer COUNT/SUM cast to BIGINT in both (DuckDB SUM(int)→HUGEINT).
- Derived ratios: cast the exact decimal to DOUBLE then divide —
  IEEE ops on identical inputs are bitwise identical in both engines.
- Window/top-k orderings carry a full deterministic tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under `name`."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Import modules for their registration side effects.
    from myduckserver_spark.plans import (  # noqa: F401
        analytics,
        cdc_queries,
        queries,
        queries_emb,
        queries_ext,
        queries_fn2,
        queries_fn3,
        queries_misc,
        queries_mm,
        queries_more,
        queries_pg,
        queries_sql4,
        queries_tds,
        queries_tds3,
        queries_tds4,
        queries_tpch2,
    )

    return {name: q.spark for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    from myduckserver_spark.plans import (  # noqa: F401
        analytics,
        cdc_queries,
        queries,
        queries_emb,
        queries_ext,
        queries_fn2,
        queries_fn3,
        queries_misc,
        queries_mm,
        queries_more,
        queries_pg,
        queries_sql4,
        queries_tds,
        queries_tds3,
        queries_tds4,
        queries_tpch2,
    )

    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
