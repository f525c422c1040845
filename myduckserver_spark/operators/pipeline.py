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


def quality_pred(
    text_col: str = "text",
    min_len: int = 50,
    max_len: int = 5000,
    min_alpha: float = 0.6,
) -> Column:
    """The quality-gate predicate as a Column (row-local)."""
    return F.length(F.col(text_col)).between(min_len, max_len) & (
        alpha_ratio(text_col) >= min_alpha
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 50,
    max_len: int = 5000,
    min_alpha: float = 0.6,
) -> DataFrame:
    """Length + alphabetic-ratio gate (map-only)."""
    return docs.filter(quality_pred(text_col, min_len, max_len, min_alpha))


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
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 50,
    max_len: int = 5000,
    min_alpha: float = 0.6,
    **kwargs,
) -> DataFrame:
    """Per-group survival counts for each pipeline stage.

    Tag-once / aggregate-once: each doc carries its stage-survival
    flags (quality = row-local predicate; exact = dedup survivor via
    one left join of the survivor ids; clean = exact minus the LSH
    drop set), and ONE grouped aggregate emits all four funnel counts.
    The old shape ran four groupBy(source) aggregates (one per stage
    DataFrame) and re-joined them — four aggregate passes over
    subtrees that repeat the gate/dedup work (ReuseExchange recovered
    some, not all). Returns one (unsorted) row per group; callers that
    present the funnel sort it (bounded cardinality).
    """
    quality = quality_filter(docs, text_col, min_len, max_len, min_alpha)
    exact = exact_dedup(quality, text_col, id_col)
    cands = minhash_lsh_candidates(exact, text_col, id_col, **kwargs)
    drops = cands.select(F.col("doc_b").alias(id_col)).distinct()
    # survivor ids with their clean flag (exact ids are unique, so the
    # join back to docs can never fan out)
    survived = exact.select(id_col).join(
        drops.withColumn("__d", F.lit(1)), id_col, "left"
    ).select(
        F.col(id_col),
        F.lit(1).alias("__e"),
        F.when(F.col("__d").isNull(), 1).otherwise(0).alias("__c"),
    )
    tagged = docs.select(
        F.col(group_col),
        F.col(id_col),
        F.when(
            quality_pred(text_col, min_len, max_len, min_alpha), 1
        ).otherwise(0).alias("__q"),
    ).join(survived, id_col, "left")
    return tagged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum("__q").cast("long").alias("n_quality"),
        F.sum(F.coalesce(F.col("__e"), F.lit(0))).cast("long")
        .alias("n_exact"),
        F.sum(F.coalesce(F.col("__c"), F.lit(0))).cast("long")
        .alias("n_clean"),
    )
