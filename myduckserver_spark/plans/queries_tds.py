"""Training-data-pipeline queries, wave 2 (beyond-reference operators).

Corpus-management primitives a 100 TB pretraining pipeline needs that
aren't already covered by analytics.py: stratified sampling, hash-based
train/val/test splits, best-copy dedup, n-gram statistics, and length
distribution profiling. All determinism comes from md5 (bit-identical
in Spark and DuckDB) — never from engine-specific RNG.

Scale notes: each query is a single shuffle on its natural key
(strata, fingerprint, or n-gram). Stratified sampling uses a window
per-strata — at 100 TB the strata count (lang × source) is small and
each partition streams, so the sort is per-group top-N, not global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table


@register(
    "tds_stratified_sample",
    oracle="""
    SELECT lang, source, doc_id FROM (
        SELECT lang, source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20
    ORDER BY lang, source, doc_id
    """,
    tags=("training-data", "sampling"),
)
def tds_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 20 docs per (lang, source).

    The md5 of the key is a pseudo-random but reproducible sort, so the
    sample is stable across runs and engines — the standard way to pin
    corpus mixtures (so much per language per source) without an RNG.
    Scale: one hash-partition shuffle on the strata key; rank is a
    streaming per-group top-N (no global sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("lang", "source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        docs.select("lang", "source", "doc_id", rn.alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("lang", "source", "doc_id")
        .orderBy("lang", "source", "doc_id")
    )


@register(
    "tds_train_split",
    oracle="""
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     BETWEEN '0' AND 'b' THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY split, lang
    """,
    tags=("training-data", "sampling"),
)
def tds_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based train/val/test split (75/12.5/12.5 by md5 nibble).

    Membership is a pure function of the stable doc key — no RNG state,
    so the split never drifts when the corpus is re-processed or when
    partitioning changes. Scale: map-side split assignment + one
    aggregation shuffle on (split, lang).
    """
    docs = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.between("0", "b"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            bcount("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "dd_keep_best",
    oracle="""
    SELECT doc_id, fp, n_copies FROM (
        SELECT doc_id,
               md5(lower(trim(text))) AS fp,
               CAST(COUNT(*) OVER (
                   PARTITION BY md5(lower(trim(text)))) AS BIGINT
               ) AS n_copies,
               ROW_NUMBER() OVER (
                   PARTITION BY md5(lower(trim(text)))
                   ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn = 1
    ORDER BY doc_id
    """,
    tags=("dedup", "training-data"),
)
def dd_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keeping the *best* copy per fingerprint (longest, then
    lowest doc_id) — unlike dd_exact's keep-lowest-id, this is the
    quality-preserving variant used when near-identical docs differ in
    truncation. Scale: one shuffle on the 128-bit fingerprint; both
    window functions share the single partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    # Two-step select: Spark rejects a window partitioned by a lateral
    # column alias defined in the same SELECT.
    fped = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.lower(F.trim("text"))).alias("fp"),
    )
    win = W.partitionBy("fp")
    ranked = fped.select(
        "doc_id",
        "fp",
        F.count("*").over(win).cast("bigint").alias("n_copies"),
        F.row_number()
        .over(win.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rn"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select("doc_id", "fp", "n_copies")
        .orderBy("doc_id")
    )


@register(
    "tx_bigram_topk",
    oracle="""
    WITH words AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents
        WHERE length(trim(text)) > 0
    ), bigrams AS (
        SELECT unnest(list_transform(
                   generate_series(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i + 1])) AS bigram
        FROM words
        WHERE len(w) >= 2
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    tags=("text", "training-data"),
)
def tx_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams — the building block for n-gram LM
    contamination checks and boilerplate detection.

    Scale: bigram expansion is map-side (one array transform per doc,
    no join); the only shuffle is the count aggregation, which
    map-side-combines because bigram frequency is Zipfian. Top-k is a
    TakeOrdered, not a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim("text")), r"\s+")
    bigrams = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> concat(w[i], ' ', w[i + 1]))"
                )
            ).alias("bigram")
        )
    )
    return (
        bigrams.groupBy("bigram")
        .agg(bcount("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "tx_length_profile",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           ROUND(quantile_cont(n_chars, 0.5), 4) AS p50,
           ROUND(quantile_cont(n_chars, 0.9), 4) AS p90,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "training-data"),
)
def tx_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length distribution (exact interpolated
    percentiles) — the first diagnostic run on any new crawl dump.

    Exact `percentile` (not approx) so the oracle matches bit-for-bit:
    both engines interpolate a + (b-a)*frac over the sorted values and
    the round(…, 4) pins any final-ulp drift. Scale: at 100 TB swap in
    percentile_approx — noted here rather than silently defaulting.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            bcount("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("source")
    )


@register(
    "tds_contamination",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents
        WHERE length(trim(text)) > 0
    ), grams AS (
        SELECT doc_id, source,
               unnest(list_transform(
                   generate_series(1, len(w) - 4),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                        || w[i+3] || ' ' || w[i+4])) AS g
        FROM toks WHERE len(w) >= 5
    ), eval_grams AS (
        SELECT DISTINCT g FROM grams WHERE source = 'src0'
    ), train_grams AS (
        SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0'
    )
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS shared_grams
    FROM train_grams t JOIN eval_grams e USING (g)
    GROUP BY t.doc_id
    ORDER BY shared_grams DESC, doc_id
    LIMIT 100
    """,
    tags=("training-data", "decontamination"),
)
def tds_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs sharing word 5-grams with
    the eval set (source 'src0' stands in for the benchmark corpus).

    Scale: the eval gram set is tiny relative to train (benchmarks are
    MBs, train is TBs) → broadcast-joined, so the expensive side stays
    map-local: shingle, distinct-per-doc, hash-probe, then one count
    shuffle keyed by doc_id. On a 100 TB corpus add a DF cap (drop
    grams appearing in >0.1% of docs) to bound skew — boilerplate
    grams otherwise dominate the probe output.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select(
        "doc_id", "source", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= 5)
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 5), i -> "
                "concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4]))"
            )
        ).alias("g"),
    )
    eval_grams = (
        grams.filter(F.col("source") == "src0").select("g").distinct()
    )
    train_grams = (
        grams.filter(F.col("source") != "src0")
        .select("doc_id", "g")
        .distinct()
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(bcount("shared_grams"))
        .orderBy(F.col("shared_grams").desc(), "doc_id")
        .limit(100)
    )


@register(
    "ev_funnel",
    oracle="""
    WITH steps AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_view) AS BIGINT) AS viewed,
           CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
                AS BIGINT) AS clicked_after_view,
           CAST(SUM(CASE WHEN t_buy > t_click AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
    FROM steps
    """,
    tags=("events", "funnel"),
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: users whose first occurrence of
    each step happens in order (classic ordered-funnel semantics on
    first-touch timestamps; NULL comparisons drop non-completers).

    Scale: one shuffle on user_id with map-side conditional-min
    combine; the funnel logic itself is a single-pass aggregate, never
    a self-join per step.
    """
    ev = load_table(spark, sf_dir, "events")

    def first_ts(step: str, alias: str):
        return F.min(
            F.when(F.col("event_type") == step, F.col("ts"))
        ).alias(alias)

    steps = ev.groupBy("user_id").agg(
        first_ts("view", "t_view"),
        first_ts("click", "t_click"),
        first_ts("purchase", "t_buy"),
    )
    return steps.agg(
        bcount("n_users"),
        F.count("t_view").cast("bigint").alias("viewed"),
        F.sum(
            F.when(F.col("t_click") > F.col("t_view"), 1).otherwise(0)
        ).cast("bigint").alias("clicked_after_view"),
        F.sum(
            F.when(
                (F.col("t_buy") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("full_funnel"),
    )


@register(
    "ev_retention",
    oracle="""
    WITH first_day AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
           CAST(a.d - f.cohort AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM active a JOIN first_day f USING (user_id)
    GROUP BY f.cohort, day_offset
    ORDER BY 1, day_offset
    """,
    tags=("events", "retention"),
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users active N days after their
    first-seen date, grouped by signup cohort.

    Scale: two aggregations both keyed on user_id. At test scale the
    first-day aggregate is small enough that AQE broadcasts it
    (verified in the plan); at 100 TB user counts both sides already
    hash-partition on user_id from their aggregates, so the join
    co-locates without an extra exchange. The final (cohort, offset)
    rollup is tiny either way.
    """
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort")
    )
    active = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    return (
        active.join(first_day, "user_id")
        .select(
            "cohort", F.datediff("d", "cohort").cast("bigint").alias("day_offset")
        )
        .groupBy("cohort", "day_offset")
        .agg(bcount("n_active"))
        .select(
            F.col("cohort").cast("timestamp").alias("cohort"),
            "day_offset",
            "n_active",
        )
        .orderBy("cohort", "day_offset")
    )
