"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (query set broadcast,
corpus scan embarrassingly parallel) and IVF-bucketed ANN as the scale
path (centroid assignment is map-only; search touches nprobe buckets
instead of the corpus). All arithmetic stays JVM-side via higher-order
functions — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Index-ordered cosine similarity of two array columns."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(v, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    Rank key is ROUND(sim, 6) + id tiebreak: deterministic under FP
    noise. Queries are broadcast; WindowGroupLimit keeps only k rows
    per query per partition before the final shuffle.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__q")
    )
    v = corpus.select(F.col(id_col), F.col(vec_col).alias("__v"))
    scored = (
        F.broadcast(q)
        .join(v, F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            F.round(cosine(F.col("__q"), F.col("__v")), 6).alias("sim"),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (deterministic
    tie-break by centroid id). Map-only: centroids broadcast."""
    c = centroids.select(
        F.col(centroid_id_col), F.col(vec_col).alias("__c")
    )
    v = corpus.select(F.col(id_col), F.col(vec_col).alias("__v"))
    sim = F.round(cosine(F.col("__c"), F.col("__v")), 6) - F.col(
        centroid_id_col
    ).cast("double") * F.lit(1e-12)
    return (
        v.crossJoin(F.broadcast(c))
        .select(id_col, centroid_id_col, sim.alias("__sim"))
        .groupBy(id_col)
        .agg(F.max_by(centroid_id_col, "__sim").alias(centroid_id_col))
    )


def ivf_search(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: search only the query's nprobe nearest centroid buckets.

    At 100 TB the corpus is pre-partitioned (even bucketed on cid), so
    a query touches ~corpus/n_centroids × nprobe rows.
    """
    assign = ivf_assign(corpus, centroids, id_col, vec_col)
    bucketed = corpus.join(assign, id_col)

    c = centroids.select(F.col("cid"), F.col(vec_col).alias("__c"))
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("__q"))
    qsim = F.round(cosine(F.col("__c"), F.col("__q")), 6) - F.col("cid").cast(
        "double"
    ) * F.lit(1e-12)
    wq = W.partitionBy("qid").orderBy(F.desc("__qsim"), F.asc("cid"))
    probe = (
        q.crossJoin(F.broadcast(c))
        .select("qid", "cid", "__q", qsim.alias("__qsim"))
        .withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select("qid", "cid", "__q")
    )

    scored = (
        F.broadcast(probe)
        .join(bucketed, "cid")
        .filter(F.col("qid") != F.col(id_col))
        .select(
            "qid",
            id_col,
            F.round(cosine(F.col("__q"), F.col(vec_col)), 6).alias("sim"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def neardup_pairs_blocked(
    corpus: DataFrame,
    block_col: str = "label",
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs within blocks (block = IVF bucket or
    label); pairwise compare never crosses blocks."""
    a = corpus.select(
        F.col(id_col), F.col(block_col), F.col(vec_col).alias("__a")
    ).alias("a")
    b = corpus.select(
        F.col(id_col), F.col(block_col), F.col(vec_col).alias("__b")
    ).alias("b")
    sim = F.round(cosine(F.col("__a"), F.col("__b")), 6)
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
