"""Engine UDF registry (SURVEY.md §2.D parity).

The reference registers one extra scalar function into its frontend —
``ps_current_thread_id()`` (reference myfunc/ps.go:20-45,
myfunc/registry.go:5-7) — and uses DuckDB macros as its UDF mechanism
(catalog/internal_macro.go:17-31). Spark twins: ``spark.udf.register``
for scalars, and vectorized pandas UDFs for anything per-row heavy
(Arrow-batched; the only sanctioned Python in a hot path).
"""

from __future__ import annotations

import threading

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


def _current_thread_id() -> int:
    return threading.get_ident() % 2**31


@F.pandas_udf(DoubleType())
def vec_minmax_scale(s: pd.Series) -> pd.Series:
    """Vectorized min-max normalize within each Arrow batch — a demo
    of the Arrow-batched slow path (10-100× over row-at-a-time)."""
    lo, hi = s.min(), s.max()
    if hi == lo:
        return s * 0.0
    return (s - lo) / (hi - lo)


def _inet6_aton(s):
    """MySQL INET6_ATON: textual IPv4/IPv6 → packed binary (4 or 16
    bytes), NULL on malformed input. Real address parsing needs
    stdlib ipaddress — a scalar UDF, never a hot path (net-admin
    helper, same tier as the reference's GMS builtin)."""
    import ipaddress

    if s is None:
        return None
    try:
        return ipaddress.ip_address(s).packed
    except ValueError:
        return None


def _inet6_ntoa(b):
    import ipaddress

    if b is None or len(b) not in (4, 16):
        return None
    try:
        return str(ipaddress.ip_address(bytes(b)))
    except ValueError:
        return None


def register_engine_udfs(spark: SparkSession) -> None:
    """Register the engine's session UDFs (call once at bootstrap,
    like the reference's provider init, catalog/provider.go:108-239)."""
    from pyspark.sql.types import BinaryType, StringType

    spark.udf.register("ps_current_thread_id", _current_thread_id, LongType())
    spark.udf.register("vec_minmax_scale", vec_minmax_scale)
    spark.udf.register("inet6_aton", _inet6_aton, BinaryType())
    spark.udf.register("inet6_ntoa", _inet6_ntoa, StringType())
