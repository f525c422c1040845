"""pg_catalog-compat macro equivalents (SURVEY.md §2.C).

The reference defines DuckDB table/scalar macros for Postgres-client
compatibility (reference catalog/internal_macro.go:33-109):
- ``_pg_expandarray(a)`` = STRUCT_PACK(x := unnest(a), n := i)
- ``my_list_contains(l, e)`` over lists or comma-split strings.

Spark twins are posexplode() and array_contains(split()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pg_expandarray(df: DataFrame, array_col: str, out_prefix: str = "") -> DataFrame:
    """_pg_expandarray: one row per element with its 1-based index."""
    x = f"{out_prefix}x"
    n = f"{out_prefix}n"
    return df.select(
        "*", F.posexplode(F.col(array_col)).alias(n, x)
    ).withColumn(n, F.col(n) + 1)


def list_contains(list_or_csv: Column, element: Column | str) -> Column:
    """my_list_contains: arrays directly, strings via comma-split
    (reference internal_macro.go:89-106)."""
    e = F.lit(element) if isinstance(element, str) else element
    return F.when(
        list_or_csv.isNull(), F.lit(None).cast("boolean")
    ).otherwise(F.array_contains(F.split(list_or_csv.cast("string"), ","), e))


def array_list_contains(arr: Column, element: Column | str) -> Column:
    e = F.lit(element) if isinstance(element, str) else element
    return F.array_contains(arr, e)
