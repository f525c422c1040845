"""Embedding-column operators, wave 4 (beyond-reference, training-data
pipeline): k-means assignment, int8 quantization, label-centroid
pooling, source-weighted mixture sampling, and largest-remainder token
budgeting.

Float determinism strategy (so Spark hash-matches the DuckDB oracle):
- FLOAT→DOUBLE casts are exact; every arithmetic chain is written with
  an explicit, identical evaluation order in both engines (unrolled
  left-associative sums — no engine-chosen reduction order).
- Distances/values are snapped to integer micro-units
  (ROUND(x * 1e6) AS BIGINT) before any aggregation, so all sums are
  exact integer math and partial-aggregation order cannot matter.
- Unrolled element expressions also keep the Spark side inside
  whole-stage codegen (higher-order functions are interpreted in
  Spark 4 — see operators/similarity.py for the same pattern).

Scale notes are per-query; common theme: centroid/weight tables stay
tiny (broadcast), fact-side work is map-local, and every shuffle is on
a bounded key (centroid id, label, source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount, o_bcount
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table

DIM = 64  # embeddings.embedding is FLOAT[64] (TESTDATA.md)
K = 8  # centroids = vectors with vec_id < K (deterministic seed set)
MIX_BUDGET = 1_000_000  # tokens to allocate in tds_token_budget


def _sq_l2_spark(a: str, b: str) -> str:
    """Unrolled squared-L2 between two array columns (0-indexed)."""
    terms = [
        f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        f" * (CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
        for i in range(DIM)
    ]
    return " + ".join(terms)


def _sq_l2_duck(a: str, b: str) -> str:
    """Same expression, DuckDB 1-indexed lists."""
    terms = [
        f"(CAST({a}[{i + 1}] AS DOUBLE) - CAST({b}[{i + 1}] AS DOUBLE))"
        f" * (CAST({a}[{i + 1}] AS DOUBLE) - CAST({b}[{i + 1}] AS DOUBLE))"
        for i in range(DIM)
    ]
    return " + ".join(terms)


@register(
    "emb_kmeans_assign",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < {K}
    ), keyed AS (
        SELECT e.vec_id,
               MIN(CAST(ROUND(({_sq_l2_duck("e.embedding", "c.cvec")})
                              * 1000000) AS BIGINT) * 100 + c.cid)
                   AS min_key
        FROM embeddings e CROSS JOIN cent c
        GROUP BY e.vec_id
    )
    SELECT CAST(min_key % 100 AS INTEGER) AS cid,
           {o_bcount("n_assigned")},
           CAST(SUM(min_key // 100) AS BIGINT) AS sum_dist_micro
    FROM keyed
    GROUP BY 1
    ORDER BY cid
    """,
    tags=("embedding", "kmeans", "training-data"),
)
def emb_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step: every vector is assigned to the
    nearest of K=8 fixed centroids (the vectors with vec_id < 8 — a
    deterministic seed set, standing in for the previous iteration's
    centroids); reports cluster sizes and summed squared distance
    (the inertia decomposition a k-means driver loop monitors).

    Argmin determinism: (distance, centroid id) packed into one
    BIGINT key — micro-unit distance * 100 + cid — so ties break by
    cid identically everywhere. Scale: centroids broadcast (K rows),
    the distance fan-out is map-local K-per-row, and the only
    shuffles are by vec_id then cid. This is exactly how a 100 TB
    k-means iterates: broadcast centroids, one map pass, one small
    agg; never a pairwise join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    d = F.expr(_sq_l2_spark("embedding", "cvec"))
    key = (F.round(d * 1000000).cast("bigint") * 100 + F.col("cid")).alias(
        "key"
    )
    keyed = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", key)
        .groupBy("vec_id")
        .agg(F.min("key").alias("min_key"))
    )
    return (
        keyed.select(
            (F.col("min_key") % 100).cast("int").alias("cid"),
            (F.col("min_key") / F.lit(100)).cast("bigint").alias("dm"),
        )
        .groupBy("cid")
        .agg(
            bcount("n_assigned"),
            F.sum("dm").cast("bigint").alias("sum_dist_micro"),
        )
        .orderBy("cid")
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH scaled AS (
        SELECT vec_id,
               NULLIF(list_max(list_transform(
                   embedding, s -> abs(CAST(s AS DOUBLE)))), 0) AS scale
        FROM embeddings
    ), q AS (
        SELECT e.vec_id,
               list_transform(e.embedding,
                   v -> CAST(ROUND(CAST(v AS DOUBLE) / s.scale * 127)
                             AS BIGINT)) AS qv,
               s.scale
        FROM embeddings e JOIN scaled s USING (vec_id)
    )
    SELECT vec_id,
           CAST(ROUND(scale * 1000000) AS BIGINT) AS scale_micro,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_max(qv) AS BIGINT) AS q_max,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(len(list_filter(qv, t -> abs(t) = 127)) AS BIGINT)
               AS n_saturated
    FROM q
    ORDER BY vec_id
    """,
    tags=("embedding", "quantization", "training-data"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of each embedding (absmax scaling,
    q = round(v / scale * 127)) — the storage-compression step an
    embedding lake applies before ANN indexing; reports the per-row
    scale and quantized checksums (sum/max/min/#saturated).

    Determinism: scale is a pure max (no arithmetic), each quantized
    value is one fixed-order double chain snapped to BIGINT; the
    all-zero-vector edge degrades to NULL via NULLIF in both engines.
    Scale: entirely map-local — no shuffle at all except the output
    sort; quantization of 100 TB of vectors is embarrassingly
    parallel. Lambda variable names are distinct per expression
    (Spark 4 inlining collides same-named lambda vars).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.withColumn(
        "scale",
        F.nullif(
            F.expr(
                "array_max(transform(embedding,"
                " s -> abs(CAST(s AS DOUBLE))))"
            ),
            F.lit(0.0),
        ),
    )
    q = scaled.withColumn(
        "qv",
        F.expr(
            "transform(embedding,"
            " v -> CAST(ROUND(CAST(v AS DOUBLE) / scale * 127) AS BIGINT))"
        ),
    )
    return q.select(
        "vec_id",
        F.round(F.col("scale") * 1000000)
        .cast("bigint")
        .alias("scale_micro"),
        F.expr("aggregate(qv, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
        .cast("bigint")
        .alias("q_sum"),
        F.array_max("qv").cast("bigint").alias("q_max"),
        F.array_min("qv").cast("bigint").alias("q_min"),
        F.expr("size(filter(qv, t -> abs(t) = 127))")
        .cast("bigint")
        .alias("n_saturated"),
    ).orderBy("vec_id")


@register(
    "emb_centroid_by_label",
    oracle=f"""
    SELECT l.label,
           CAST(p.pos AS INTEGER) AS pos,
           {o_bcount("n_vecs")},
           CAST(SUM(CAST(ROUND(CAST(l.embedding[p.pos + 1] AS DOUBLE)
                                * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_micro,
           (CAST(SUM(CAST(ROUND(CAST(l.embedding[p.pos + 1] AS DOUBLE)
                                 * 1000000) AS BIGINT)) AS DOUBLE)
            / 1000000.0) / COUNT(*) AS mean_val
    FROM embeddings l
    CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS pos) p
    GROUP BY l.label, p.pos
    ORDER BY label, pos
    """,
    tags=("embedding", "pooling", "training-data"),
)
def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (mean-pool) of the first 8 embedding
    dimensions — the class-prototype computation behind centroid
    classifiers and k-means M-steps; reports exact micro-unit sums
    plus the double mean.

    Determinism: each element is snapped to integer micro-units
    BEFORE summation, so the per-(label,pos) sums are exact integer
    math under any partial-aggregation order; the mean is derived by
    two fixed-order IEEE divides. Scale: posexplode fans out 8× (the
    monitored prefix), then one shuffle on (label, pos) with
    map-side partial aggregation; a full-dim centroid at 100 TB uses
    the same plan with DIM× fan-out, still linear and skew-free.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val"),
    )
    micro = F.round(F.col("val").cast("double") * 1000000).cast("bigint")
    return (
        ex.select("label", F.col("pos").cast("int").alias("pos"), micro.alias("m"))
        .groupBy("label", "pos")
        .agg(
            bcount("n_vecs"),
            F.sum("m").cast("bigint").alias("sum_micro"),
        )
        .select(
            "label",
            "pos",
            "n_vecs",
            "sum_micro",
            (
                (F.col("sum_micro").cast("double") / F.lit(1000000.0))
                / F.col("n_vecs")
            ).alias("mean_val"),
        )
        .orderBy("label", "pos")
    )


@register(
    "tds_mixture_weights",
    oracle="""
    WITH rated AS (
        SELECT source, doc_id, n_chars,
               CASE CAST(regexp_extract(source, '(\\d+)', 1) AS INTEGER) % 4
                    WHEN 0 THEN 'f' WHEN 1 THEN '3'
                    WHEN 2 THEN '7' ELSE 'b' END AS max_nibble,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nib
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE nib <= max_nibble) AS BIGINT)
               AS n_kept,
           CAST(SUM(n_chars) FILTER (WHERE nib <= max_nibble) AS BIGINT)
               AS kept_chars
    FROM rated
    GROUP BY source
    ORDER BY source
    """,
    tags=("training-data", "sampling", "mixture"),
)
def tds_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture sampling: each source gets a target
    rate from its mixture weight (here 100/25/50/75% by source index
    mod 4 — standing in for a data-mixing recipe like "3 epochs of
    wiki, 0.25 of web"), enforced by comparing the doc's md5 nibble
    to the rate's nibble ceiling. Reports kept/total per source.

    Membership is a pure function of (source weight, stable doc key):
    no RNG, so the mixture is reproducible across reruns and
    repartitions, and rates compose with the train/val/test split
    (tds_train_split) because both read disjoint md5 nibbles of the
    same digest. Scale: map-side classification + one shuffle on
    source (bounded cardinality).
    """
    docs = load_table(spark, sf_dir, "documents")
    idx = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    max_nibble = (
        F.when(idx % 4 == 0, "f")
        .when(idx % 4 == 1, "3")
        .when(idx % 4 == 2, "7")
        .otherwise("b")
    )
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    kept = nib <= max_nibble
    return (
        docs.select("source", "n_chars", kept.alias("kept"))
        .groupBy("source")
        .agg(
            bcount("n_total"),
            F.count(F.when(F.col("kept"), 1)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("n_chars")))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


@register(
    "tds_token_budget",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               CAST(SUM(len(regexp_split_to_array(trim(text), '\\s+')))
                    AS BIGINT) AS tok
        FROM documents
        WHERE length(trim(text)) > 0
        GROUP BY source
    ), alloc AS (
        SELECT source, tok,
               CAST(({MIX_BUDGET} * tok) // SUM(tok) OVER () AS BIGINT)
                   AS base,
               CAST(({MIX_BUDGET} * tok) % SUM(tok) OVER () AS BIGINT)
                   AS rem
        FROM toks
    ), ranked AS (
        SELECT source, tok, base, rem,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
               {MIX_BUDGET} - SUM(base) OVER () AS leftover
        FROM alloc
    )
    SELECT source, tok,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM ranked
    ORDER BY source
    """,
    tags=("training-data", "mixture", "budget"),
)
def tds_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a 1M-token
    training budget across sources, proportional to each source's
    token mass: floor shares first, then the leftover tokens go to
    the largest fractional remainders. Allocations sum to exactly
    the budget — the property a data-mixing recipe needs.

    All integer math (no float shares), so the apportionment is
    bit-stable. Scale: the heavy pass is the per-source token count
    (one shuffle, map-side combine); the apportionment itself runs
    on one row per source — a driver-sized relation (hundreds) that
    Spark windows over a single partition, which is fine because it
    is post-aggregation.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            "source",
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias(
                "nt"
            ),
        )
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("tok"))
    )
    # post-aggregation relation: one row per source. The non-foldable
    # constant partition key (globalrank's pid%1 trick) declares the
    # single-group window to WindowExec instead of tripping its
    # "No Partition Defined" warning on a bounded input.
    _g = F.expr("crc32(source) % 1")
    wall = W.partitionBy(_g)
    alloc = toks.select(
        "source",
        "tok",
        F.floor(
            (F.lit(MIX_BUDGET) * F.col("tok")) / F.sum("tok").over(wall)
        )
        .cast("bigint")
        .alias("base"),
        ((F.lit(MIX_BUDGET) * F.col("tok")) % F.sum("tok").over(wall))
        .cast("bigint")
        .alias("rem"),
    )
    ranked = alloc.select(
        "source",
        "tok",
        "base",
        F.row_number()
        .over(W.partitionBy(_g).orderBy(F.col("rem").desc(), "source"))
        .alias("rk"),
        (F.lit(MIX_BUDGET) - F.sum("base").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "source",
        "tok",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    ).orderBy("source")
