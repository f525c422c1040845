"""Training-data cleaning pipeline: the composed 100 TB pass.

Chains the individual operators (quality gate → exact dedup →
MinHash-LSH near-dup removal) the way a pre-training corpus build
actually runs them. Beyond-reference capability (BASELINE.json
north-star); every stage is shuffle-bounded:

- quality gate: map-only column math, no shuffle,
- exact dedup: one shuffle on the md5 fingerprint,
- near-dup: map-only signatures + one self-join keyed on (band,
  band_sig) + one anti-join on doc id.

Nothing collects to the driver; the funnel summary aggregates to
one row per source.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myduckserver_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
)


def alpha_ratio(text_col: str = "text") -> Column:
    """Share of [a-z] characters — deterministic int/int IEEE divide."""
    return F.length(
        F.regexp_replace(F.col(text_col), "[^a-z]", "")
    ).cast("double") / F.length(F.col(text_col))


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 50,
    max_len: int = 5000,
    min_alpha: float = 0.6,
) -> DataFrame:
    """Length + alphabetic-ratio gate (map-only)."""
    return docs.filter(
        F.length(F.col(text_col)).between(min_len, max_len)
        & (alpha_ratio(text_col) >= min_alpha)
    )


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
    max_len: int = 5000,
    min_alpha: float = 0.6,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> dict[str, DataFrame]:
    """Run the full cleaning funnel; returns every stage.

    Near-dup policy: for every LSH candidate pair (a < b), the
    higher id is dropped — deterministic, and transitively keeps
    exactly the minimal id of each near-dup cluster that forms a
    chain under the candidate relation.
    """
    quality = quality_filter(docs, text_col, min_len, max_len, min_alpha)
    exact = exact_dedup(quality, text_col, id_col)
    cands = minhash_lsh_candidates(
        exact, text_col, id_col, num_hashes, rows_per_band, shingle_n
    )
    drops = cands.select(F.col("doc_b").alias(id_col)).distinct()
    clean = exact.join(drops, id_col, "left_anti")
    return {"raw": docs, "quality": quality, "exact": exact, "clean": clean}


def corpus_funnel(
    docs: DataFrame, group_col: str = "source", **kwargs
) -> DataFrame:
    """Per-group survival counts for each pipeline stage."""
    stages = clean_corpus(docs, **kwargs)
    counts = [
        stages[name]
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias(f"n_{name}"))
        for name in ("raw", "quality", "exact", "clean")
    ]
    out = reduce(lambda a, b: a.join(b, group_col, "left"), counts)
    for name in ("quality", "exact", "clean"):
        out = out.withColumn(
            f"n_{name}", F.coalesce(F.col(f"n_{name}"), F.lit(0)).cast("long")
        )
    from myduckserver_spark.plans.helpers import ordered_bounded

    # one row per source: bounded presentation sort (no sampling job)
    return out.transform(ordered_bounded, group_col)
