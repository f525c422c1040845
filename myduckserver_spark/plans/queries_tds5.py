"""Training-data-pipeline queries, wave 5 (beyond-reference operators).

Retrieval/serving-side corpus primitives on top of waves 1..4:
overlapping RAG chunking (the doc -> chunk explosion every retrieval
index build runs), IGNORE NULLS window gap-fill (sensor/event forward
fill), matryoshka embedding truncation (Kusupati et al. 2022 — serve a
prefix of the vector and renormalize), and signed-random-projection
LSH bucketing for cosine ANN (Charikar 2002 — the data-independent
complement to the IVF index in operators/similarity.py).

Determinism strategy matches the registry contract: every derived
float is either a pure pick (no arithmetic) or one fixed-order
double chain snapped to BIGINT micro units; the SRP hyperplanes are
integer constants derived from md5 in Python at import time and
inlined verbatim into BOTH engines' expressions, so the two sides
evaluate literally identical arithmetic.

Scale notes per query are in each docstring; shared theme: chunking,
truncation and LSH signatures are all map-local (constants broadcast
inside the plan), so the only shuffles are final small-key aggregates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount, o_bcount
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table, table_view

CHUNK_WORDS = 32  # RAG chunk size in words
CHUNK_STRIDE = 24  # stride < size -> 8-word overlap between chunks

MAT_DIMS = 8  # matryoshka prefix length

SRP_PLANES = 16  # signed-random-projection signature bits
SRP_DIMS = 64  # embeddings.embedding is FLOAT[64] (TESTDATA.md)


def _srp_component(p: int, i: int) -> int:
    """Deterministic pseudo-random hyperplane component in [-500, 500]:
    first 40 bits of md5("p:i"), mod 1001, shifted. Pure Python so the
    SAME integer constant is inlined into both engines' SQL — md5 is
    md5 everywhere, but evaluating it once at import beats 1024 hash
    calls per engine per run."""
    hv = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:10], 16)
    return hv % 1001 - 500


def _srp_dot_sql(p: int, elem) -> str:
    """One plane's dot product as an explicit left-to-right sum chain.
    `elem(k)` renders 1-based element access in the target dialect
    (DuckDB `embedding[k]`, Spark `element_at(embedding, k)` — Spark's
    `[]` is 0-based, so the text cannot be shared verbatim). The
    explicit chain fixes association order so the IEEE result — and
    therefore the sign — is bit-equal on both sides."""
    terms = [
        f"{_srp_component(p, i)}.0*CAST({elem(i + 1)} AS DOUBLE)"
        for i in range(SRP_DIMS)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "tx_chunk_overlap",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
        FROM documents
        WHERE length(trim(text)) > 0
    ), starts AS (
        SELECT doc_id, w,
               unnest(generate_series(0, len(w) - 1, {CHUNK_STRIDE}))
                   AS start
        FROM words
    )
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(list_slice(w, start + 1, start + {CHUNK_WORDS}))
                AS BIGINT) AS n_words,
           array_to_string(
               list_slice(w, start + 1, start + {CHUNK_WORDS}), ' ')
               AS chunk_text
    FROM starts
    ORDER BY doc_id, chunk_id
    """,
    tags=("text", "rag", "chunking", "training-data"),
)
def tx_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping RAG chunking: split each document into 32-word
    chunks on a 24-word stride (8-word overlap), the explosion step a
    retrieval index build runs before embedding each chunk.

    Chunk starts come from `sequence(0, n_words-1, stride)` so a doc
    shorter than one chunk still yields its single (short) chunk, and
    the final partial chunk is kept — matching the oracle's
    generate_series/list_slice clamping exactly.

    Scale: pure map-side explosion (sequence + slice are per-row array
    ops, no shuffle at all except the output sort); 100 TB of docs
    chunk embarrassingly parallel, and the ~1.33x row multiplication
    is the expected overlap cost, not a join blowup.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    d = d.withColumn(
        "start",
        F.explode(F.expr(f"sequence(0, size(w) - 1, {CHUNK_STRIDE})")),
    )
    chunk = F.expr(f"slice(w, start + 1, {CHUNK_WORDS})")
    return d.select(
        "doc_id",
        F.expr(f"CAST(start DIV {CHUNK_STRIDE} AS BIGINT)").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_words"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "w_gap_fill_ignore_nulls",
    oracle="""
    WITH masked AS (
        SELECT event_id, ts, user_id,
               CASE WHEN event_type = 'view' THEN NULL ELSE value END
                   AS mval
        FROM events
    )
    SELECT event_id, user_id,
           last_value(mval IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value,
           first_value(mval IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS first_nonnull
    FROM masked
    ORDER BY event_id
    """,
    tags=("window", "ignore-nulls", "gap-fill"),
)
def w_gap_fill_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics (SURVEY §2.B window functions):
    forward-fill a sparsified measure with LAST_VALUE IGNORE NULLS over
    a running frame, plus the per-partition first non-null via
    FIRST_VALUE IGNORE NULLS over the full frame — the standard
    sensor/event gap-fill. 'view' events are masked to NULL so the
    fill path is exercised on ~1/3 of rows.

    Determinism: fills are pure picks of existing DOUBLE values (no
    arithmetic), and the (ts, event_id) ordering is total.
    Scale: one hash-partitioned window per user_id — single shuffle,
    no global sort; identical shape at 1000 executors.
    """
    ev = load_table(spark, sf_dir, "events")
    mval = (
        F.when(F.col("event_type") == "view", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
    )
    masked = ev.select("event_id", "ts", "user_id", mval.alias("mval"))
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    full = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return masked.select(
        "event_id",
        "user_id",
        F.last("mval", ignorenulls=True).over(run).alias("filled_value"),
        F.first("mval", ignorenulls=True).over(full).alias("first_nonnull"),
    ).orderBy("event_id")


@register(
    "emb_matryoshka",
    oracle=f"""
    WITH pre AS (
        SELECT vec_id,
               NULLIF(sqrt({" + ".join(
                   f"CAST(embedding[{k}] AS DOUBLE)"
                   f"*CAST(embedding[{k}] AS DOUBLE)"
                   for k in range(1, MAT_DIMS + 1))}), 0) AS nrm,
               list_slice(embedding, 1, {MAT_DIMS}) AS t8
        FROM embeddings
    )
    SELECT vec_id,
           CAST(ROUND(nrm * 1000000) AS BIGINT) AS norm_micro,
           list_transform(t8,
               v -> CAST(ROUND(CAST(v AS DOUBLE) / nrm * 1000000)
                         AS BIGINT)) AS unit_micro
    FROM pre
    ORDER BY vec_id
    """,
    tags=("embedding", "matryoshka", "training-data"),
)
def emb_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation (Kusupati et al. 2022): keep the first 8
    dims of each embedding and renormalize to unit length — the serving
    trick that trades recall for a dims/8 memory cut without
    re-embedding. Emits the prefix norm and the renormalized prefix in
    exact micro units.

    Determinism: the prefix norm is an explicit 8-term left-to-right
    sum chain (identical IEEE association both engines), each
    renormalized component is one divide+round snapped to BIGINT, and
    the all-zero-prefix edge degrades to NULL via NULLIF.
    Scale: map-local per row, no shuffle except the output sort.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm_terms = " + ".join(
        f"CAST(element_at(embedding, {k}) AS DOUBLE)"
        f"*CAST(element_at(embedding, {k}) AS DOUBLE)"
        for k in range(1, MAT_DIMS + 1)
    )
    pre = emb.select(
        "vec_id",
        F.nullif(F.expr(f"sqrt({norm_terms})"), F.lit(0.0)).alias("nrm"),
        F.expr(f"slice(embedding, 1, {MAT_DIMS})").alias("t8"),
    )
    return pre.select(
        "vec_id",
        F.round(F.col("nrm") * 1000000).cast("bigint").alias("norm_micro"),
        F.expr(
            "transform(t8, v -> CAST(ROUND(CAST(v AS DOUBLE) / nrm "
            "* 1000000) AS BIGINT))"
        ).alias("unit_micro"),
    ).orderBy("vec_id")


def _srp_bucket_sql(elem) -> str:
    """16-bit SRP signature: bit p set iff dot(v, plane_p) >= 0."""
    bits = [
        f"(CASE WHEN {_srp_dot_sql(p, elem)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(SRP_PLANES)
    ]
    return "(" + " + ".join(bits) + ")"


def _duck_elem(k: int) -> str:
    return f"embedding[{k}]"


@register(
    "sim_srp_lsh_buckets",
    oracle=f"""
    WITH sigs AS (
        SELECT vec_id,
               CAST({_srp_bucket_sql(_duck_elem)} AS BIGINT) AS bucket
        FROM embeddings
    )
    SELECT bucket, {o_bcount("n_vecs")},
           CAST(MIN(vec_id) AS BIGINT) AS min_vec
    FROM sigs
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("similarity", "ann", "lsh", "training-data"),
)
def sim_srp_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH for cosine ANN (Charikar 2002):
    16 fixed hyperplanes, signature bit p = sign(dot(v, plane_p)),
    vectors bucketed by the 16-bit signature. Collision probability is
    (1 - theta/pi)^16, so bucket-mates are cosine-close candidates —
    the data-independent complement to the IVF index
    (operators/similarity.py:94; IVF needs trained centroids, SRP
    needs none, so it is the cold-start/streaming-insert path).

    Hyperplane components are md5-derived integer constants computed
    once in Python and inlined into both engines' plans. The Spark dot
    product is `aggregate(zip_with(vec, plane, *), 0.0, +)` — a
    higher-order-function LOOP in generated code, not a 64-term
    unrolled chain: the unrolled form (16 planes x 64 dims = 1024
    inlined terms) blew the JVM's 64 KB method limit inside
    hashAgg_doAggregateWithKeys and knocked the whole stage back to
    interpreted mode. `aggregate` folds left-to-right from 0.0, the
    exact IEEE association order of DuckDB's explicit `a + b + c`
    chain in the oracle (and 0.0 + x == x for every x, with -0.0 vs
    0.0 sign-equal under >= 0), so the signature bit is bit-equal on
    both engines while the generated code stays a few hundred bytes.

    Scale: the signature is map-only (constants live in the plan, no
    join against a planes table), the bucket histogram is one
    small-key aggregate. At 100 TB the candidate join keyed on
    (bucket) — or banded sub-signatures for higher recall — bounds
    every comparison to a bucket, exactly like the MinHash LSH path
    (operators/dedup.py).
    """
    # Single generated-SQL build (one spark.sql round-trip instead of
    # 16 planes x 64 dims of F.lit Py4J calls; measured build
    # 1485-1503 -> 83-154 ms, plan byte-identical after expr-id
    # normalization — lambda args spelled (x, y) to match the Column
    # API's auto-naming). Same round-10 conversion pattern as
    # sim_topk_bruteforce.
    emb = table_view(spark, sf_dir, "embeddings")

    def dot_sql(p: int) -> str:
        arr = ", ".join(
            f"{float(_srp_component(p, i))!r}D" for i in range(SRP_DIMS)
        )
        return (
            f"aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
            f"array({arr}), (x, y) -> x * y), 0.0D, (x, y) -> x + y)"
        )

    bits = " + ".join(
        f"(CASE WHEN {dot_sql(p)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(SRP_PLANES)
    )
    return spark.sql(f"""
        SELECT bucket, CAST(COUNT(1) AS LONG) AS n_vecs,
               CAST(MIN(vec_id) AS LONG) AS min_vec
        FROM (SELECT vec_id, CAST({bits} AS LONG) AS bucket FROM {emb})
        GROUP BY bucket
        ORDER BY bucket
    """)


@register(
    "sem_classify_docs",
    oracle="""
    WITH labeled AS (
        SELECT doc_id,
               'label:' || CAST(
                   CAST(('0x' || substr(md5('classify: ' || text), 1, 8))
                        AS BIGINT) % 4 AS VARCHAR) AS response
        FROM documents
    )
    SELECT response, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM labeled
    GROUP BY response
    ORDER BY response
    """,
    tags=("semantic", "llm", "training-data"),
)
def sem_classify_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic classification under the oracle gate: semantic_map
    (operators/semantic.py — prompt dedup + Arrow-batched model) over
    every document, then a label histogram. The stub model is a pure
    md5 derivation, so DuckDB replicates it exactly in SQL and the
    hash compare verifies the whole mapInPandas + dedup + join-back
    plumbing, not just the aggregation.

    Scale: inference cost is per DISTINCT prompt (the dedup is the
    point); the histogram is one small-key aggregate.
    """
    from myduckserver_spark.operators.semantic import semantic_map

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("classify: "), F.col("text")).alias("p")
    )
    out = semantic_map(docs, "p")
    return (
        out.groupBy("response")
        .agg(bcount("n_docs"), F.min("doc_id").cast("long").alias("min_doc"))
        .orderBy("response")
    )


SPAN_WORDS = 20  # exact-substring span width (Lee et al. 2022 scale)
SPAN_STRIDE = 10


@register(
    "dd_span_dup_stats",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source,
               regexp_split_to_array(trim(text), '\\s+') AS ws
        FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\\s+'))
              >= {SPAN_WORDS}
    ), spans AS (
        SELECT doc_id, source,
               md5(array_to_string(
                   ws[i.i:i.i + {SPAN_WORDS - 1}], ' ')) AS h
        FROM w, LATERAL (
            SELECT unnest(range(1, len(ws) - {SPAN_WORDS - 2},
                                {SPAN_STRIDE})) AS i
        ) i
    ), dup AS (
        SELECT h FROM spans GROUP BY h
        HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COALESCE(SUM(CASE WHEN h IN (SELECT h FROM dup)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_dup_spans
    FROM spans
    GROUP BY source
    ORDER BY source
    """,
    tags=("training-data", "dedup", "exact-substring"),
)
def dd_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication profile per source (Lee et al. 2022:
    duplicated 20-word spans across documents are the memorization-
    prone unit document-level dedup cannot see). Both engines hash the
    identical 'word word …' span strings, so the dup sets match
    bit-for-bit.

    Scale: span explosion is map-side (~len/stride per doc); the dup
    set is one span-hash groupBy with map-side combine; the join back
    is keyed on span_hash and shrinks with true duplication.
    """
    from myduckserver_spark.operators.dedup import duplicate_span_stats

    docs = load_table(spark, sf_dir, "documents", narrow=True)
    return duplicate_span_stats(
        docs, "text", "doc_id", "source",
        span_words=SPAN_WORDS, stride=SPAN_STRIDE,
    ).orderBy("source")
