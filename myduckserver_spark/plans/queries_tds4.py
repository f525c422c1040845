"""Training-data-pipeline queries, wave 4 (beyond-reference operators).

Corpus curation primitives on top of the wave-1..3 stack: boilerplate
detection by document frequency (the n-gram analog of CCNet's repeated-
paragraph removal), per-domain document caps (crawl anti-spam), stop-
word-density quality histograms (integer-exact), SemDeDup-style
cluster-then-neardup semantic dedup (Abbas et al. 2023, expressed as
broadcast k-means assign + blocked pairwise cosine), and deterministic
median/mode aggregate parity.

Determinism strategy matches the rest of the registry: corpus-relative
thresholds are integer cross-multiplications (df*100 >= n_docs*pct, no
float division), argmax tie-breaks are packed into single BIGINT keys,
and cosine scores are rounded to 6 decimals in both engines before the
threshold compare.

Scale notes per query; shared theme: every relative-frequency operator
broadcasts one tiny aggregate (corpus size, vocab counts, centroids)
against the map-side fact scan, so the only real shuffle is the final
small-key aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.operators.similarity import neardup_pairs_blocked
from myduckserver_spark.plans.analytics import _COSINE_SQL
from myduckserver_spark.plans.helpers import bcount, o_bcount
from myduckserver_spark.plans.queries_emb import _sq_l2_duck, _sq_l2_spark
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table

BOILER_PER_MILLE = 8  # trigram is boilerplate if in >= 0.8% of docs
DOMAIN_CAP = 15  # max docs kept per source
COMMON_TOP = 10  # the top-10 corpus tokens form the "common" set
SEM_K = 8  # SemDeDup coarse clusters = vectors with vec_id < 8
SEM_TAU_MICRO = 300_000  # cosine >= 0.30 (1e-6 units) is a near-dup on
# the synthetic embeddings (real text embeddings would use ~0.95; the
# synthetic vectors are near-orthogonal, so the knob is data-relative)


@register(
    "tx_boilerplate_trigrams",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents
        WHERE length(trim(text)) > 0
    ), tri AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   generate_series(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingle
        FROM words
        WHERE len(w) >= 3
    ), total AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    )
    SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df
    FROM tri CROSS JOIN total
    GROUP BY shingle, n_docs
    HAVING CAST(COUNT(*) AS BIGINT) * 1000 >= n_docs * {BOILER_PER_MILLE}
    ORDER BY df DESC, shingle
    LIMIT 20
    """,
    tags=("text", "training-data", "boilerplate"),
)
def tx_boilerplate_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate shingle detection: trigram shingles whose *document
    frequency* (distinct docs, not occurrences) reaches 0.8% of the
    corpus — the signal CCNet-style pipelines use to strip repeated
    headers/footers before dedup.

    The threshold is corpus-relative via integer cross-multiplication
    (df*1000 >= n_docs*8): no float division, and the same query works
    unchanged at any scale factor. Scale: shingle expansion is
    map-side; per-doc DISTINCT collapses before the shuffle (array_
    distinct on the transform output); the corpus count is a 1-row
    broadcast; top-k is a TakeOrdered, never a global sort.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(bcount("n_docs"))
    w = F.split(F.lower(F.trim("text")), r"\s+")
    tri = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 3)
        .select(
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(w) - 3),"
                        " i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))"
                    )
                )
            ).alias("shingle")
        )
    )
    return (
        tri.groupBy("shingle")
        .agg(bcount("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") * 1000 >= F.col("n_docs") * BOILER_PER_MILLE)
        .select("shingle", "df")
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )


@register(
    "tds_domain_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT source,
           {o_bcount("n_total")},
           CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
    tags=("training-data", "sampling", "domain-cap"),
)
def tds_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (anti-spam downsampling): keep at most
    15 docs per source, chosen by md5(doc_id) order so the sample is
    pseudo-random yet reprocessing-stable; report kept/total/chars per
    source.

    This is the crawl-pipeline "domain cap" that stops one spammy host
    from dominating the mixture. Scale: one shuffle on source; the
    md5 order is computed map-side. Skewed domains (one source = 30%
    of the corpus) are exactly the case AQE skew-split handles, since
    rank-then-filter only needs per-source locality, not order across
    sources. At 100 TB, cap within (source, shard) first to bound the
    window, then re-cap the per-shard survivors — same plan shape twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    kept = F.when(rn <= DOMAIN_CAP, 1).otherwise(0)
    kept_chars = F.when(rn <= DOMAIN_CAP, F.col("n_chars")).otherwise(0)
    return (
        docs.select("source", "n_chars", kept.alias("k"), kept_chars.alias("kc"))
        .groupBy("source")
        .agg(
            bcount("n_total"),
            F.sum("k").cast("bigint").alias("n_kept"),
            F.sum("kc").cast("bigint").alias("kept_chars"),
        )
        .orderBy("source")
    )


@register(
    "tx_common_token_ratio",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest(regexp_split_to_array(
                   lower(trim(text)), '\\s+')) AS tok
        FROM documents
        WHERE length(trim(text)) > 0
    ), vocab AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
    ), common AS (
        SELECT tok FROM vocab ORDER BY cnt DESC, tok LIMIT {COMMON_TOP}
    ), per_doc AS (
        SELECT t.doc_id, t.lang,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(CASE WHEN c.tok IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_common
        FROM toks t LEFT JOIN common c ON t.tok = c.tok
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang,
           CAST(LEAST(9, n_common * 10 // n_tok) AS INTEGER) AS bucket,
           {o_bcount("n_docs")}
    FROM per_doc
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
    tags=("text", "training-data", "quality"),
)
def tx_common_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density quality histogram: per doc, the fraction of
    tokens belonging to the top-10 corpus tokens by frequency (the
    data-driven stopword list), bucketed into deciles per lang.

    All math is integer: the common set is a deterministic top-k
    (cnt DESC, tok ASC tiebreak), the decile is (n_common*10) // n_tok
    clamped to 9 — no float anywhere, so Spark and DuckDB agree
    bit-for-bit. Scale: vocab counts are a Zipf-collapsed aggregate
    (tiny vs corpus); the common set is a 10-row broadcast against the
    token stream; per-doc agg shuffles on doc_id; the histogram is a
    bounded-key agg. This is the two-pass corpus-statistics join shape
    every "score docs against corpus-level stats" operator uses.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
        )
    )
    common_set = (
        toks.groupBy("tok")
        .agg(bcount("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(COMMON_TOP)
        .select("tok", F.lit(1).alias("is_common"))
    )
    per_doc = (
        toks.join(F.broadcast(common_set), "tok", "left")
        .groupBy("doc_id", "lang")
        .agg(
            bcount("n_tok"),
            F.sum(F.coalesce("is_common", F.lit(0)))
            .cast("bigint")
            .alias("n_common"),
        )
    )
    bucket = F.least(
        F.lit(9), F.floor(F.col("n_common") * 10 / F.col("n_tok"))
    ).cast("int")
    return (
        per_doc.select("lang", bucket.alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(bcount("n_docs"))
        .orderBy("lang", "bucket")
    )


@register(
    "dd_semdedup",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec
        FROM embeddings WHERE vec_id < {SEM_K}
    ), assign AS (
        SELECT e.vec_id, e.embedding,
               CAST(MIN(CAST(ROUND(({_sq_l2_duck("e.embedding", "c.cvec")})
                             * 1000000) AS BIGINT) * 100 + c.cid) % 100
                    AS INTEGER) AS cid
        FROM embeddings e CROSS JOIN cent c
        GROUP BY e.vec_id, e.embedding
    ), pairs AS (
        SELECT a.cid, b.vec_id AS dup_id
        FROM (SELECT cid, vec_id, embedding AS qa FROM assign) a
        JOIN (SELECT cid, vec_id, embedding AS va FROM assign) b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
        WHERE ROUND({_COSINE_SQL}, 6) >= {SEM_TAU_MICRO} / 1000000.0
    )
    SELECT s.cid, s.n_total,
           CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped
    FROM (SELECT cid, {o_bcount("n_total")} FROM assign GROUP BY cid) s
    LEFT JOIN (SELECT cid, CAST(COUNT(DISTINCT dup_id) AS BIGINT)
                   AS n_dropped
               FROM pairs GROUP BY cid) d ON s.cid = d.cid
    ORDER BY s.cid
    """,
    tags=("dedup", "embedding", "semdedup", "training-data"),
)
def dd_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): coarse k-means clustering, then
    drop any vector with a lower-id near-duplicate (cosine >= 0.90)
    *inside its cluster*; report per-cluster totals and drops.

    This is the semantic-dedup shape used on LAION/web corpora: the
    O(n^2) cosine compare is confined to clusters, turning a
    corpus-square join into sum-of-cluster-squares. Assignment reuses
    the packed (distance, cid) argmin key of emb_kmeans_assign —
    broadcast centroids, map-only. Scale: cluster count grows with
    corpus size (K ~ sqrt(n) in production) keeping cluster size — and
    the pairwise blow-up — bounded; the pair join shuffles on cid only.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < SEM_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    d = F.expr(_sq_l2_spark("embedding", "cvec"))
    key = F.round(d * 1000000).cast("bigint") * 100 + F.col("cid")
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .groupBy("vec_id", "embedding")
        .agg((F.min(key) % 100).cast("int").alias("cid"))
    )
    dropped = (
        neardup_pairs_blocked(
            assign,
            block_col="cid",
            threshold=SEM_TAU_MICRO / 1_000_000.0,
        )
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    sizes = assign.groupBy("cid").agg(bcount("n_total"))
    drops = (
        assign.join(dropped, assign.vec_id == dropped.dup_id, "left_semi")
        .groupBy("cid")
        .agg(bcount("n_dropped"))
    )
    return (
        sizes.join(drops, "cid", "left")
        .select(
            "cid",
            "n_total",
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias(
                "n_dropped"
            ),
        )
        .orderBy("cid")
    )


@register(
    "f_median_mode",
    oracle="""
    WITH per_qty AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, qty
    )
    SELECT l_returnflag,
           ROUND(CAST(median(CAST(l_quantity AS BIGINT)) AS DOUBLE), 1)
               AS median_qty,
           (SELECT CAST(999 - MAX(cnt * 1000 + (999 - qty)) % 1000 AS BIGINT)
            FROM per_qty p WHERE p.l_returnflag = l.l_returnflag)
               AS mode_qty
    FROM lineitem l
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("aggregate", "median", "mode"),
)
def f_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN + deterministic MODE per group (reference surface: DuckDB
    exposes both as ordinary aggregates through the Postgres front
    door; GMS corpus covers them via quantiles).

    MODE has engine-defined tie-breaking, so it's computed here as an
    integer argmax over (count, smallest-value) packed into one BIGINT
    — cnt*1000 + (999-qty) — making Spark and DuckDB agree exactly.
    MEDIAN interpolates over integers (exact halves in IEEE double).
    Scale: two bounded-key aggs (flag, qty <= 50 distinct values);
    the pack/unpack trick is how any argmax-with-tiebreak should ship
    at 100 TB — one agg, no join back, no window over the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    per_qty = (
        li.select("l_returnflag", qty.alias("qty"))
        .groupBy("l_returnflag", "qty")
        .agg(bcount("cnt"))
    )
    mode = (
        per_qty.groupBy("l_returnflag")
        .agg(
            (
                F.lit(999)
                - F.max(F.col("cnt") * 1000 + (F.lit(999) - F.col("qty")))
                % 1000
            )
            .cast("bigint")
            .alias("mode_qty")
        )
    )
    med = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median(qty).cast("double"), 1).alias("median_qty")
        )
    )
    return (
        med.join(mode, "l_returnflag")
        .select("l_returnflag", "median_qty", "mode_qty")
        .orderBy("l_returnflag")
    )
