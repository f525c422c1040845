"""Skew-aware join helpers for hot keys at cluster scale.

AQE's skew-join split (enabled in session.py) handles most skew at
runtime; explicit salting is for the pathological case — one key that
dwarfs every partition (e.g. the empty-string document fingerprint, a
null-ish default user_id) — where you want the fan-out under source
control and deterministic.

Pattern: replicate the small side SALT_N times; scatter the big side
by hash(row) % SALT_N within each key; join on (key, salt). One extra
narrow column; the shuffle spreads the hot key over SALT_N reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on `key` with the big side salted.

    Deterministic scatter: salt = positive hash of all big-side
    columns % salt_n (not rand(), so retries/re-runs partition
    identically — the same idempotency rule as CDC apply).
    """
    salts = big.sparkSession.range(salt_n).select(
        F.col("id").cast("int").alias("__salt")
    )
    big_s = big.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt_n)).cast("int"),
    )
    small_s = small.crossJoin(F.broadcast(salts))
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew diagnosis: heaviest keys with their share of total rows."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "cnt",
            F.round(F.col("cnt") / F.col("t"), 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(n)
    )
