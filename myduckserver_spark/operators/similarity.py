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
    return _dot(_dvec(a), _dvec(b)) / (_norm(_dvec(a)) * _norm(_dvec(b)))


def _dvec(c: Column) -> Column:
    """float array → double array (cast once, not per pair)."""
    return F.transform(c, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays (same fold order as the
    DuckDB oracle's list_sum comprehension — left-to-right)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(v: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _with_vec_norm(
    df: DataFrame, vec_col: str, out_vec: str, out_norm: str, *keep: str
) -> DataFrame:
    """Project (keep..., out_vec: double array, out_norm): norms are
    computed ONCE per row here, not once per pair after a join —
    higher-order fns are interpreted, so per-pair norms dominated the
    pairwise-compare cost (measured 3x on dd_embedding_neardup).
    FP-identical to inline norms: same expression tree per row.
    Single-string selectExpr: one Py4J round-trip per projection."""
    return df.selectExpr(
        *keep,
        f"transform({vec_col}, xd -> cast(xd as double)) AS {out_vec}",
    ).selectExpr(
        "*",
        f"sqrt(aggregate(transform({out_vec}, xs -> xs * xs), 0.0D,"
        f" (na, nx) -> na + nx)) AS {out_norm}",
    )


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
    q = _with_vec_norm(
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col)),
        vec_col, "__q", "__nq", query_id_col,
    )
    v = _with_vec_norm(corpus, vec_col, "__v", "__nv", id_col)
    scored = (
        F.broadcast(q)
        .join(v, F.col(query_id_col) != F.col(id_col))
        .selectExpr(
            query_id_col,
            id_col,
            "round(aggregate(zip_with(__q, __v, (zx, zy) -> zx * zy), 0.0D,"
            " (da, dv) -> da + dv) / (__nq * __nv), 6) AS sim",
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def cosine_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Exact brute-force top-k via Arrow-batched numpy matmul — the
    scale path for wide corpora.

    Same contract as :func:`cosine_topk` (ROUND(sim, 6) rank key, id
    tiebreak, self-match excluded) but the dot products run as ONE
    `V @ Q.T` per Arrow batch (BLAS/SIMD) instead of interpreted
    higher-order functions per pair — at 100 TB the per-element
    interpreter dispatch is the bottleneck, not the arithmetic. Each
    batch emits only its local top-k per query (k x |queries| rows per
    batch, a per-partition combine), so the final window ranks a
    candidate set bounded by k x |queries| x n_batches, never the
    corpus. Rounding is HALF_UP to 6 decimals to match Spark/DuckDB
    ROUND; the two implementations agree exactly unless an unrounded
    sim sits within ~1e-15 of a 5e-7 rounding boundary (sum-order FP
    noise), which the rank key's rounding is there to absorb.

    The query set is collected to the driver and closed over (same
    bounded-broadcast contract as cosine_topk's broadcast join).
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(query_id_col if query_id_col in queries.columns
                           else id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = np.sqrt((Q * Q).sum(axis=1))

    def _round6(x):
        # Spark/DuckDB ROUND: HALF_UP (half away from zero)
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def score_batches(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = np.sqrt((V * V).sum(axis=1))
            sims = _round6((V @ Q.T) / np.outer(Vn, Qn))
            parts = []
            for j in range(len(qids)):
                col = sims[:, j]
                idx = np.nonzero(ids != qids[j])[0]
                if idx.size == 0:
                    continue
                # (sim desc, id asc): lexsort's LAST key is primary
                order = np.lexsort((ids[idx], -col[idx]))[:k]
                sel = idx[order]
                parts.append(pd.DataFrame({
                    query_id_col: np.full(sel.size, qids[j]),
                    id_col: ids[sel],
                    "sim": col[sel],
                }))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, f"{query_id_col} long, {id_col} long, sim double"
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


def _ivf_assign_vec(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
) -> DataFrame:
    """(id, cid, __v, __nv): nearest-centroid assignment that CARRIES
    the row's double vector and norm — truly map-only.

    The centroid set collects to ONE array row and broadcasts; the
    argmax over centroids is a single array expression per corpus row
    (array_max over (sim, cid) structs — the sim carries the same
    -cid*1e-12 uniqueness epsilon as before, so the lexicographic max
    IS the old max_by). The previous formulation exploded corpus x
    centroids and re-grouped on the row id — a full shuffle of the
    corpus plus, in ivf_search, a second shuffle to join the
    assignment back to the vectors. Both shuffles are gone; a search
    now shuffles only at the final per-query rank window."""
    c = _with_vec_norm(centroids, vec_col, "__c", "__nc", centroid_id_col)
    carr = c.agg(
        F.collect_list(
            F.struct(
                F.col(centroid_id_col).alias("cid"),
                F.col("__c"), F.col("__nc"),
            )
        ).alias("__cents")
    )
    v = _with_vec_norm(corpus, vec_col, "__v", "__nv", id_col)
    best = (
        "array_max(transform(__cents, x -> struct("
        "round(aggregate(zip_with(x.__c, __v, (zx, zy) -> zx * zy), 0.0D,"
        " (da, dv) -> da + dv) / (x.__nc * __nv), 6)"
        " - cast(x.cid as double) * 1e-12 AS s,"
        " x.cid AS cid)))"
    )
    return v.crossJoin(F.broadcast(carr)).selectExpr(
        id_col,
        f"{best}.cid AS {centroid_id_col}",
        "__v",
        "__nv",
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (deterministic
    tie-break by centroid id). Map-only: centroids broadcast as one
    collected array row; no shuffle at all (see _ivf_assign_vec)."""
    return _ivf_assign_vec(
        corpus, centroids, id_col, vec_col, centroid_id_col
    ).select(id_col, centroid_id_col)


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
    # assignment carries the vectors: no shuffle, no join-back scan
    nb = _ivf_assign_vec(corpus, centroids, id_col, vec_col)

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

    pq = probe.withColumn("__dq", _dvec(F.col("__q"))).withColumn(
        "__nq", _norm(F.col("__dq"))
    )
    sim = F.round(
        _dot(F.col("__dq"), F.col("__v")) / (F.col("__nq") * F.col("__nv")), 6
    )
    scored = (
        F.broadcast(pq)
        .join(nb, "cid")
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", id_col, sim.alias("sim"))
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
    a = _with_vec_norm(
        corpus, vec_col, "__a", "__na", id_col, block_col
    ).alias("a")
    b = _with_vec_norm(
        corpus, vec_col, "__b", "__nb", id_col, block_col
    ).alias("b")
    sim = F.round(
        _dot(F.col("__a"), F.col("__b")) / (F.col("__na") * F.col("__nb")), 6
    )
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
