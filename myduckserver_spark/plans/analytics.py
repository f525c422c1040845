"""LLM-data-pipeline analytics queries (beyond-reference operators).

Dedup / similarity / text-analysis / multimodal plumbing expressed as
oracle-matched queries over the `documents` and `embeddings` tables.
All hashing is md5-based because md5 is bit-identical in Spark and
DuckDB; minhash uses the *lexicographic min of md5 hex strings*, which
both engines compute identically (no numeric-hash divergence).

Scale notes: every operator here is shuffle-bounded by design — LSH
banding turns O(n²) near-dup into a bucket-grouped self-join; IVF
assignment turns ANN into a per-centroid local search. No collect(),
no cross join without a blocking key (the brute-force baseline
broadcasts only the tiny query set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import (
    bcount,
    o_bcount,
    ordered_adaptive,
    ordered_bounded,
    ts_micros,
)
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table, table_view

# ------------------------------------------------------------------ dedup


@register(
    "dd_exact",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           md5(lower(trim(text))) AS fp,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(lower(trim(text)))
    ORDER BY keep_id
    """,
    tags=("dedup", "exact"),
)
def dd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text, keep lowest doc_id.

    Scale: one shuffle on the 128-bit fingerprint; at 100 TB this is
    the canonical map-side-combine dedup (the md5 prunes to one row
    per partition per key before the shuffle).
    """
    # Single generated-SQL build over the narrow cached view (one
    # spark.sql round-trip; same fingerprint-groupBy plan).
    docs = table_view(spark, sf_dir, "documents", narrow=True)
    return spark.sql(f"""
        SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
               md5(lower(trim(text))) AS fp,
               CAST(COUNT(1) AS BIGINT) AS n_copies
        FROM {docs}
        GROUP BY md5(lower(trim(text)))
    """).transform(ordered_adaptive, "keep_id")


from myduckserver_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash as simhash_op,
)
from myduckserver_spark.operators.similarity import (  # noqa: E402
    cosine as _cosine,
    cosine_topk,
    ivf_assign,
    neardup_pairs_blocked,
)


def shingle_sql(src: str = "documents") -> str:
    """DuckDB CTE text producing (doc_id, shingle) from relation
    ``src`` — the oracle twin of operators.dedup.shingle_array."""
    return f"""
        SELECT doc_id,
               unnest(list_distinct([
                   array_to_string(words[i:i+2], ' ')
                   FOR i IN range(1, greatest(len(words) - 2, 1) + 1)
               ])) AS shingle
        FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS words
              FROM {src})
"""


_SHINGLE_SQL = shingle_sql("documents")


@register(
    "dd_minhash_lsh",
    oracle=f"""
    WITH shingles AS ({_SHINGLE_SQL}),
    mh AS (
        SELECT doc_id, seed,
               MIN((a * CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) + b)
                   % 2147483647) AS minhash
        FROM shingles CROSS JOIN (
            VALUES (0, 1103515245, 12345),      (1, 1103533621, 987654321),
                   (2, 1234567891, 192837465),  (3, 1856947721, 1029384756),
                   (4, 2027382347, 564738291),  (5, 756073813, 1122334455),
                   (6, 892174501, 2046913579),  (7, 1679606101, 777000111)
        ) seeds(seed, a, b)
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 2 AS band,
               md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY seed))
                   AS band_sig
        FROM mh GROUP BY doc_id, seed // 2
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {o_bcount("n_shared_bands")}
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "minhash", "lsh"),
)
def dd_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → 8 minhashes → 4 bands
    of 2 → bucket self-join.

    Minhash_i(doc) = lexicographic MIN over shingles of md5(i:shingle):
    a valid permutation-min sketch that is engine-portable. Scale: the
    self-join is keyed on (band, band_sig) — only same-bucket docs meet,
    which is the whole point of LSH at 100 TB.
    """
    # Single generated-SQL build via the operator's SQL twin (one
    # spark.sql round-trip instead of ~30 Py4J calls; identical plan —
    # row-local signatures, one bucket shuffle reused by both join
    # sides, shuffle-hash self-join). See minhash_lsh_candidates_sql.
    from myduckserver_spark.operators.dedup import minhash_lsh_candidates_sql

    docs = table_view(spark, sf_dir, "documents")
    return spark.sql(
        minhash_lsh_candidates_sql(
            docs, num_hashes=8, rows_per_band=2, shingle_n=3
        )
    ).transform(ordered_adaptive, "doc_a", "doc_b")


@register(
    "dd_ngram_jaccard",
    oracle=f"""
    WITH raw_shingles AS ({_SHINGLE_SQL}),
    shingles AS (
        -- 60-bit md5-derived key: same bigint as the Spark side, so the
        -- inverted-index join compares 8-byte ints in both engines
        SELECT doc_id,
               CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) AS sh
        FROM raw_shingles
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_common
        FROM shingles a JOIN shingles b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.2
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "jaccard"),
)
def dd_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard similarity via inverted-index self-join.

    Scale: joins on the shingle (inverted index), so only docs sharing
    ≥1 shingle ever pair; the jaccard is exact from distinct-shingle
    counts. At 100 TB you'd pre-filter hot shingles (df-cut); the join
    stays keyed — no cross product. IEEE divide of exact ints matches
    DuckDB bitwise.
    """
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2).transform(
        ordered_adaptive, "doc_a", "doc_b"
    )


@register(
    "dd_simhash",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, token,
               CAST(concat('0x', substr(md5(token), 1, 15)) AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(list_distinct(string_split(lower(trim(text)), ' ')))
                     AS token FROM documents) t
        WHERE token <> ''
    ),
    bits AS (
        SELECT doc_id, bit_pos,
               SUM(CASE WHEN (h >> bit_pos) & 1 = 1 THEN 1 ELSE -1 END) AS score
        FROM tokens CROSS JOIN (SELECT unnest(range(60)) AS bit_pos) b
        GROUP BY doc_id, bit_pos
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN score > 0 THEN (CAST(1 AS BIGINT) << bit_pos)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("dedup", "simhash"),
)
def dd_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (token hash = first 15 md5 hex chars).

    Scale: the ×60 bit expansion is map-side only; the single shuffle
    is groupBy(doc_id, bit_pos) with map-side combine. Near-dup pairs
    then hamming-compare simhashes (see operators.dedup.simhash_pairs).
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_op(docs, bits=60).transform(ordered_adaptive, "doc_id")


# ------------------------------------------------------------- similarity


_COSINE_SQL = """
    list_sum([CAST(qa[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)
              FOR i IN range(1, len(qa) + 1)])
    / (sqrt(list_sum([CAST(qa[i] AS DOUBLE) * CAST(qa[i] AS DOUBLE)
                      FOR i IN range(1, len(qa) + 1)]))
       * sqrt(list_sum([CAST(va[i] AS DOUBLE) * CAST(va[i] AS DOUBLE)
                        FOR i IN range(1, len(va) + 1)])))
"""


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qa FROM embeddings
               WHERE vec_id < 5),
    scored AS (
        SELECT qid, vec_id, ROUND({_COSINE_SQL}, 6) AS sim
        FROM q JOIN (SELECT vec_id, embedding AS va FROM embeddings) v
          ON qid <> vec_id
    ),
    ranked AS (
        SELECT qid, vec_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY sim DESC, vec_id) AS INT) AS rk
        FROM scored
    )
    SELECT qid, vec_id, sim, rk FROM ranked WHERE rk <= 5
    ORDER BY qid, rk
    """,
    tags=("similarity", "ann", "topk"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 5 query vectors.

    Ranking is on ROUND(sim, 6) with vec_id tiebreak so FP last-bit
    noise cannot reorder ranks. Scale: query set is broadcast; the scan
    over the corpus is embarrassingly parallel; top-k per query is a
    windowed rank pushdown (WindowGroupLimit), not a global sort.
    """
    # Single generated-SQL build (one spark.sql round-trip instead of
    # the operator's ~12 Py4J calls; measured build 170→~40 ms). The
    # expression text mirrors operators.similarity.cosine_topk exactly
    # — per-row norms computed once, zip_with dot product, ROUND(.,6)
    # rank key — so the FP results are bit-identical. BROADCAST(q)
    # pins the 5-row query side; WindowGroupLimit prunes to top-5 per
    # query before the final shuffle.
    emb = table_view(spark, sf_dir, "embeddings")
    norm = ("sqrt(aggregate(transform({v}, xs -> xs * xs), 0.0D,"
            " (na, nx) -> na + nx))")
    return spark.sql(f"""
        SELECT qid, vec_id, sim, rk FROM (
            SELECT qid, vec_id, sim,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY qid ORDER BY sim DESC, vec_id
                   ) AS INT) AS rk
            FROM (
                SELECT /*+ BROADCAST(q) */ qid, vec_id,
                       round(aggregate(zip_with(__q, __v,
                                       (zx, zy) -> zx * zy), 0.0D,
                                       (da, dv) -> da + dv)
                             / (__nq * __nv), 6) AS sim
                FROM (SELECT qid, __q, {norm.format(v='__q')} AS __nq
                      FROM (SELECT vec_id AS qid,
                                   transform(embedding,
                                             xd -> cast(xd as double)) AS __q
                            FROM {emb} WHERE vec_id < 5)) q
                JOIN (SELECT vec_id, __v, {norm.format(v='__v')} AS __nv
                      FROM (SELECT vec_id,
                                   transform(embedding,
                                             xd -> cast(xd as double)) AS __v
                            FROM {emb})) v
                  ON qid != vec_id
            ) scored
        ) ranked
        WHERE rk <= 5
    """).transform(ordered_bounded, "qid", "rk")  # k x |queries|: bounded


@register(
    "sim_ivf_bucketed",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cid, embedding AS ca FROM embeddings
        WHERE vec_id % 50 = 0
    ),
    assign AS (
        SELECT vec_id, arg_max(cid, sim) AS cid
        FROM (
            SELECT v.vec_id, c.cid,
                   ROUND({_COSINE_SQL.replace("qa", "ca")}, 6)
                   - CAST(c.cid AS DOUBLE) * 1e-12 AS sim
            FROM (SELECT vec_id, embedding AS va FROM embeddings) v
            CROSS JOIN centroids c
        ) s
        GROUP BY vec_id
    )
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS bucket_size,
           CAST(MIN(vec_id) AS BIGINT) AS min_vec,
           CAST(MAX(vec_id) AS BIGINT) AS max_vec
    FROM assign
    GROUP BY cid
    ORDER BY cid
    """,
    tags=("similarity", "ann", "ivf"),
)
def sim_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse assignment: nearest of 10 deterministic centroids.

    The tiny cid*1e-12 penalty makes argmax unique even on exact sim
    ties, so both engines pick the same centroid. Scale: centroids are
    broadcast; assignment is map-only; ANN search then touches one
    bucket instead of the corpus (see operators.similarity.ivf_search).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding")
    )
    assign = ivf_assign(emb, cent)
    return (
        assign.groupBy("cid")
        .agg(
            bcount("bucket_size"),
            F.min("vec_id").cast("long").alias("min_vec"),
            F.max("vec_id").cast("long").alias("max_vec"),
        )
        .transform(ordered_bounded, "cid")  # one row per centroid: bounded
    )


@register(
    "dd_embedding_neardup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_COSINE_SQL.replace("qa", "aa").replace("va", "ba")}, 6) AS sim
    FROM (SELECT vec_id, label, embedding AS aa FROM embeddings) a
    JOIN (SELECT vec_id, label, embedding AS ba FROM embeddings) b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND({_COSINE_SQL.replace("qa", "aa").replace("va", "ba")}, 6) >= 0.999
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "embedding"),
)
def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within label blocks (cosine ≥ 0.999).

    Scale: the label is the blocking key (at 100 TB: an IVF/LSH bucket
    id) — pairwise compare happens only within buckets, keyed join.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return neardup_pairs_blocked(
        emb, block_col="label", threshold=0.999
    ).transform(ordered_adaptive, "id_a", "id_b")


# ----------------------------------------------------------- text analysis


@register(
    "tx_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_tokens,
           CAST(length(text) AS INT) AS n_chars_actual,
           CAST(length(regexp_replace(text, '[^ ]', '', 'g')) + 1 AS INT)
               AS n_words_ws,
           ROUND(CAST(length(text) AS DOUBLE)
                 / len(string_split(trim(text), ' ')), 6) AS avg_token_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "tokens"),
)
def tx_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + average token length (map-only)."""
    docs = load_table(spark, sf_dir, "documents")
    # split hoisted into its own projection (n_tokens and avg_token_len
    # both reference it — was two split evaluations per row)
    return docs.select(
        "doc_id", "text", F.split(F.trim("text"), " ").alias("__w")
    ).select(
        "doc_id",
        F.size("__w").cast("int").alias("n_tokens"),
        F.length("text").cast("int").alias("n_chars_actual"),
        (F.length(F.regexp_replace("text", "[^ ]", "")) + 1)
        .cast("int")
        .alias("n_words_ws"),
        F.round(F.length("text").cast("double") / F.size("__w"), 6).alias(
            "avg_token_len"
        ),
    ).transform(ordered_adaptive, "doc_id")


@register(
    "tx_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars,
           ROUND(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS alpha_ratio,
           ROUND(CAST(len(list_filter(string_split(lower(trim(text)), ' '),
                     t -> t IN ('the','a','of','and','to','in','is','it')))
                 AS DOUBLE) / len(string_split(trim(text), ' ')), 6)
               AS stopword_ratio,
           CAST(CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END
                AS INT) AS len_ok
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def tx_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: alpha ratio, stopword ratio, length gate.

    Scale: pure map-side column math; at 100 TB this is the standard
    pre-training quality filter pass (no shuffle at all).
    """
    # Single generated-SQL build over the narrow cached view (one Py4J
    # round-trip; measured 141→103 ms at sf0.1 — pure build savings,
    # identical map-only plan).
    docs = table_view(spark, sf_dir, "documents", narrow=True)
    return spark.sql(f"""
        SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
          ROUND(CAST(length(regexp_replace(text, '[^a-z]', '')) AS DOUBLE)
                / length(text), 6) AS alpha_ratio,
          ROUND(CAST(size(filter(split(lower(trim(text)), ' '),
                    t -> array_contains(array('the','a','of','and','to',
                                              'in','is','it'), t)))
                     AS DOUBLE)
                / size(split(trim(text), ' ')), 6) AS stopword_ratio,
          CAST(CASE WHEN length(text) BETWEEN 100 AND 2000
               THEN 1 ELSE 0 END AS INT) AS len_ok
        FROM {docs}
    """).transform(ordered_adaptive, "doc_id")


@register(
    "tx_langid_ngram",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(lower(text), ' '),
                    t -> t IN ('the','and','of'))) AS BIGINT) AS en_hits,
               CAST(len(list_filter(string_split(lower(text), ' '),
                    t -> t IN ('der','und','die'))) AS BIGINT) AS de_hits
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN en_hits > de_hits THEN 1 ELSE 0 END) AS BIGINT)
               AS pred_en,
           CAST(SUM(en_hits) AS BIGINT) AS total_en_hits
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "langid"),
)
def tx_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language scoring rolled up against the labeled lang."""
    docs = load_table(spark, sf_dir, "documents")
    en = F.array(F.lit("the"), F.lit("and"), F.lit("of"))
    de = F.array(F.lit("der"), F.lit("und"), F.lit("die"))
    # words hoisted into their own projection: both stopword filters
    # referenced the split, which evaluated it twice per row
    # (CollapseProject keeps a non-cheap multi-referenced alias in its
    # own project, so the hoist survives to the physical plan)
    scored = docs.select(
        "lang", F.split(F.lower("text"), " ").alias("__w")
    ).select(
        "lang",
        F.size(F.filter(F.col("__w"), lambda t: F.array_contains(en, t)))
        .cast("long")
        .alias("en_hits"),
        F.size(F.filter(F.col("__w"), lambda t: F.array_contains(de, t)))
        .cast("long")
        .alias("de_hits"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            bcount("n_docs"),
            F.sum(F.when(F.col("en_hits") > F.col("de_hits"), 1).otherwise(0))
            .cast("long")
            .alias("pred_en"),
            F.sum("en_hits").cast("long").alias("total_en_hits"),
        )
        .transform(ordered_bounded, "lang")  # one row per language: bounded
    )


@register(
    "tx_fingerprint",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))
                AS BIGINT) AS n_distinct_fp
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "fingerprint"),
)
def tx_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized document fingerprint (strip non-alnum, md5) per source."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9]", ""))
    return (
        docs.groupBy("source")
        .agg(bcount("n_docs"), F.countDistinct(fp).cast("long").alias("n_distinct_fp"))
        .transform(ordered_bounded, "source")  # one row per source: bounded
    )


# ------------------------------------------------------------- multimodal


@register(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(substr(text, 1, 4) AS VARCHAR) AS magic
    FROM documents
    WHERE doc_id < 50
    ORDER BY doc_id
    """,
    tags=("multimodal", "binary"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column plumbing: encode → byte length, md5, magic.

    Models the image/audio convention (binary payload + typed metadata);
    the decode UDFs live in operators.multimodal (stubbed libs).
    """
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return (
        docs.filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.md5(blob).alias("content_md5"),
            F.substring("text", 1, 4).alias("magic"),
        )
        # doc_id < 50 caps the result; coalesce(1)-sort over the pruned
        # scan beats a range-sampling sort job for a 50-row output
        .transform(ordered_bounded, "doc_id")
    )


# ------------------------------------------------------ events / streaming-ish


@register(
    "ev_tumbling_hour",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("events", "window-agg", "streaming"),
)
def ev_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time aggregation (batch twin of the streaming
    query in streaming/windows.py)."""
    from myduckserver_spark.plans.helpers import dsum

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), F.col("event_type")
        )
        .agg(bcount("n"), dsum("value", "total_value"))
        .transform(ordered_adaptive, "hour_start", "event_type")
    )


@register(
    "ev_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) > 3600000000
                    OR LAG(ts) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, event_id,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
        FROM gaps
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "sessionization", "window"),
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1h inactivity) via lag + running sum.

    Scale: one shuffle on user_id; both window passes share the same
    partitioning/sort so Spark runs them in a single Window exchange.
    """
    # Single generated-SQL build (one spark.sql round-trip instead of
    # ~20 Py4J window-spec/when/agg calls). Identical plan: the lag
    # window and the running-sum window share the (user_id; ts,
    # event_id) partitioning+sort, so Spark plans one Exchange + Sort
    # feeding two Window operators, then the per-user aggregate.
    # unix_micros(CAST(.. AS TIMESTAMP)) is the ts_micros helper's SQL
    # twin (events.ts may read as TIMESTAMP_NTZ; session TZ is UTC).
    ev = table_view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT user_id,
               CAST(MAX(session_id) AS BIGINT) AS n_sessions,
               CAST(COUNT(1) AS BIGINT) AS n_events
        FROM (
            SELECT user_id,
                   SUM(CASE WHEN prev_ts IS NULL
                            OR unix_micros(CAST(ts AS TIMESTAMP))
                               - unix_micros(CAST(prev_ts AS TIMESTAMP))
                               > 3600000000
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS session_id
            FROM (
                SELECT user_id, event_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM {ev}
            )
        )
        GROUP BY user_id
    """).transform(ordered_adaptive, "user_id")


@register(
    "ev_session_window_bounds",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 3600000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
        FROM gaps
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    tags=("events", "session-window", "streaming"),
)
def ev_session_window_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Spark ``session_window`` (1h inactivity gap), batch twin of
    streaming/windows.session_windows — a Spark-first operator the
    reference cannot express (no session windows anywhere in it,
    SURVEY §2.E). Session end = last event + gap; an event exactly at
    the gap boundary starts a NEW session (>= semantics), which the
    SQL oracle mirrors.

    Scale: session_window is a single shuffle on user_id with
    in-partition merge — no self-join, no window-over-window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            F.col("user_id"),
        )
        .agg(bcount("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .transform(ordered_adaptive, "user_id", "session_start")
    )


@register(
    "ev_asof_view_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id,
           CAST(MAX(v.ts) AS TIMESTAMP) AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
    tags=("events", "asof-join"),
)
def ev_asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest 'view' at or before each 'purchase' per user.

    Uses the merge-scan as-of operator (operators/asof.py): union both
    event streams, shuffle ONCE on user_id, and carry the latest view
    forward with a running window. The naive equi-join + range-filter
    + MAX plan materializes every (purchase, earlier view) pair —
    O(P·V) per user — before reducing; this one is O((P+V) log(P+V)),
    which is what survives hot users at 100 TB.
    """
    from myduckserver_spark.operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    return (
        asof_join_backward(p, v, by="user_id", left_ts="ts", right_ts="ts")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts_asof").alias("last_view_ts"),
        )
        .transform(ordered_adaptive, "purchase_id")
    )


# ------------------------------------------------------ composed pipeline


_SEEDS_SQL = """(
            VALUES (0, 1103515245, 12345),      (1, 1103533621, 987654321),
                   (2, 1234567891, 192837465),  (3, 1856947721, 1029384756),
                   (4, 2027382347, 564738291),  (5, 756073813, 1122334455),
                   (6, 892174501, 2046913579),  (7, 1679606101, 777000111)
        ) seeds(seed, a, b)"""


@register(
    "tds_clean_corpus",
    oracle=f"""
    WITH quality AS (
        SELECT * FROM documents
        WHERE length(text) BETWEEN 50 AND 5000
          AND CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
              / length(text) >= 0.6
    ),
    keepers AS (
        SELECT md5(lower(trim(text))) AS fp, MIN(doc_id) AS keep_id
        FROM quality GROUP BY 1
    ),
    exact AS (
        SELECT q.* FROM quality q JOIN keepers k ON q.doc_id = k.keep_id
    ),
    shingles AS ({{SHINGLES}}),
    mh AS (
        SELECT doc_id, seed,
               MIN((a * CAST('0x' || substr(md5(shingle), 1, 7) AS BIGINT) + b)
                   % 2147483647) AS minhash
        FROM shingles CROSS JOIN {_SEEDS_SQL}
        GROUP BY doc_id, seed
    ),
    bands AS (
        SELECT doc_id, seed // 2 AS band,
               md5(string_agg(CAST(minhash AS VARCHAR), '|' ORDER BY seed))
                   AS band_sig
        FROM mh GROUP BY doc_id, seed // 2
    ),
    drops AS (
        SELECT DISTINCT b.doc_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    ),
    clean AS (
        SELECT * FROM exact
        WHERE doc_id NOT IN (SELECT doc_id FROM drops)
    ),
    f_raw AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw
              FROM documents GROUP BY 1),
    f_q AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_quality
            FROM quality GROUP BY 1),
    f_e AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM exact GROUP BY 1),
    f_c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_clean
            FROM clean GROUP BY 1)
    SELECT f_raw.source, n_raw,
           CAST(COALESCE(n_quality, 0) AS BIGINT) AS n_quality,
           CAST(COALESCE(n_exact, 0) AS BIGINT) AS n_exact,
           CAST(COALESCE(n_clean, 0) AS BIGINT) AS n_clean
    FROM f_raw
    LEFT JOIN f_q USING (source)
    LEFT JOIN f_e USING (source)
    LEFT JOIN f_c USING (source)
    ORDER BY source
    """.replace("{SHINGLES}", shingle_sql("exact")),
    tags=("pipeline", "dedup", "quality", "training-data"),
)
def tds_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleaning pass: quality gate → exact
    dedup → MinHash-LSH near-dup removal, reported as a per-source
    survival funnel (operators/pipeline.py).

    Scale: map-only gate, one fingerprint shuffle, map-only signatures,
    one (band, band_sig)-keyed self-join, one anti-join — the whole
    100 TB corpus build is 3 shuffles and never collects. The funnel
    output is one row per source.
    """
    from myduckserver_spark.operators.pipeline import corpus_funnel

    docs = load_table(spark, sf_dir, "documents")
    # one row per source: bounded presentation sort (the plans layer
    # knows the default group_col is schema-bounded; the operator
    # returns the bare aggregate — ADVICE r10 layering note)
    return corpus_funnel(docs).transform(ordered_bounded, "source")


@register(
    "sim_ivf_search_topk",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cid, embedding AS ca FROM embeddings
        WHERE vec_id % 50 = 0
    ),
    assign AS (
        SELECT vec_id, arg_max(cid, sim) AS cid
        FROM (
            SELECT v.vec_id, c.cid,
                   ROUND({{COS_CA_VA}}, 6)
                   - CAST(c.cid AS DOUBLE) * 1e-12 AS sim
            FROM (SELECT vec_id, embedding AS va FROM embeddings) v
            CROSS JOIN centroids c
        ) s
        GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS qid, embedding AS qa FROM embeddings
          WHERE vec_id < 3),
    probe AS (
        SELECT qid, cid FROM (
            SELECT qid, cid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                        ORDER BY sim DESC, cid) AS pr
            FROM (
                SELECT q.qid, c.cid,
                       ROUND({{COS_QA_CA}}, 6)
                       - CAST(c.cid AS DOUBLE) * 1e-12 AS sim
                FROM q CROSS JOIN centroids c
            ) s
        ) p WHERE pr <= 2
    ),
    bucketed AS (
        SELECT a.vec_id, a.cid, e.embedding AS va
        FROM assign a JOIN embeddings e USING (vec_id)
    ),
    scored AS (
        SELECT q.qid, v.vec_id, ROUND({{COS_QA_VA}}, 6) AS sim
        FROM q JOIN probe USING (qid)
        JOIN bucketed v ON v.cid = probe.cid AND v.vec_id <> q.qid
    ),
    ranked AS (
        SELECT qid, vec_id, sim,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY sim DESC, vec_id) AS INT) AS rk
        FROM scored
    )
    SELECT qid, vec_id, sim, rk FROM ranked WHERE rk <= 3
    ORDER BY qid, rk
    """.replace("{COS_CA_VA}", _COSINE_SQL.replace("qa", "ca"))
       .replace("{COS_QA_CA}", _COSINE_SQL.replace("va", "ca"))
       .replace("{COS_QA_VA}", _COSINE_SQL),
    tags=("similarity", "ann", "ivf", "topk"),
)
def sim_ivf_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF ANN search: coarse-assign the corpus to 10 centroids,
    probe each query's nprobe=2 nearest buckets, exact top-3 inside.

    Scale: centroids broadcast twice (assignment + probe selection),
    the probed fraction of the corpus is ~nprobe/n_centroids, and
    ranking is a windowed rank pushdown per query — never a global
    sort. This is the search half of sim_ivf_bucketed's build half.
    """
    from myduckserver_spark.operators.similarity import ivf_search

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding")
    )
    qs = emb.filter(F.col("vec_id") < 3)
    return ivf_search(emb, qs, cent, k=3, nprobe=2).transform(
        ordered_bounded, "qid", "rk"  # k x |queries| rows: bounded
    )


@register(
    "tx_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS INT) AS n_bpe_tokens,
           CAST(len(string_split(trim(text), ' ')) AS INT) AS n_ws_tokens,
           ROUND(CAST(len(regexp_extract_all(text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS DOUBLE)
                / len(string_split(trim(text), ' ')), 6) AS bpe_per_word
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "tokens", "bpe"),
)
def tx_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: alpha runs, digit runs, and single
    punctuation marks each count as one token (the GPT-2 pre-tokenizer
    shape without the merges table) — the budget estimator a training
    pipeline runs before paying for real tokenization.

    Scale: map-only regexp_extract_all; no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
    n_ws = F.size(F.split(F.trim("text"), " "))
    return docs.select(
        "doc_id",
        n_bpe.cast("int").alias("n_bpe_tokens"),
        n_ws.cast("int").alias("n_ws_tokens"),
        F.round(n_bpe.cast("double") / n_ws, 6).alias("bpe_per_word"),
    ).transform(ordered_adaptive, "doc_id")


@register(
    "tx_keyword_search_tf",
    oracle="""
    SELECT doc_id,
           CAST(len(list_intersect(string_split(lower(text), ' '),
                ['model', 'data', 'training'])) AS INT) AS n_terms,
           CAST(len(list_filter(string_split(lower(text), ' '),
                t -> t IN ('model', 'data', 'training'))) AS INT) AS tf
    FROM documents
    WHERE len(list_intersect(string_split(lower(text), ' '),
              ['model', 'data', 'training'])) >= 2
    ORDER BY tf DESC, doc_id
    LIMIT 50
    """,
    tags=("text", "fulltext", "search"),
)
def tx_keyword_search_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword search with term-presence + term-frequency ranking —
    the engine's fulltext fallback (MATCH...AGAINST shims to the same
    token-overlap score; reference fulltext is GMS-side,
    TestFulltextIndexes main_test.go:1879).

    Scale: map-only scoring + top-k; a real 100 TB deployment would
    add an inverted-index pre-filter (same shape as dd_ngram_jaccard's
    posting join) before scoring.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(F.lit("model"), F.lit("data"), F.lit("training"))
    toks = F.split(F.lower("text"), " ")
    n_terms = F.size(F.array_intersect(toks, terms)).cast("int")
    tf = F.size(F.filter(toks, lambda t: F.array_contains(terms, t))).cast(
        "int"
    )
    return (
        docs.select(
            "doc_id", n_terms.alias("n_terms"), tf.alias("tf")
        )
        .filter(F.col("n_terms") >= 2)
        .orderBy(F.desc("tf"), "doc_id")
        .limit(50)
    )


@register(
    "tx_bm25_search",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS dl,
             list_filter(string_split(lower(trim(text)), ' '),
                         t -> t IN ('data', 'join', 'window')) AS hit
      FROM documents
    ),
    tf_tab AS (
      SELECT doc_id, dl, t AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, dl, unnest(hit) AS t FROM base)
      GROUP BY doc_id, dl, t
    ),
    df_tab AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf_tab GROUP BY term
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(dl) AS BIGINT) AS sum_dl
      FROM base
    ),
    scored AS (
      SELECT doc_id,
             CAST(count(*) AS INT) AS n_terms,
             SUM(CAST(ROUND(
               ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * 2.2
                  / (CAST(tf AS DOUBLE)
                     + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE)
                              / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
               * 1e9) AS BIGINT)) AS s9
      FROM tf_tab JOIN df_tab USING (term) CROSS JOIN stats
      GROUP BY doc_id
    )
    SELECT doc_id, n_terms, ROUND(CAST(s9 AS DOUBLE) / 1e9, 6) AS score
    FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 50
    """,
    tags=("text", "fulltext", "bm25"),
)
def tx_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 full-text ranking (k1=1.2, b=0.75) for the query
    terms {data, join, window} — the real-FTS upgrade over
    tx_keyword_search_tf's token-overlap score. See
    operators/text.bm25_rank for the determinism and scale notes.
    """
    from myduckserver_spark.operators.text import bm25_rank

    docs = load_table(spark, sf_dir, "documents")
    return bm25_rank(docs, ["data", "join", "window"], k=50)


@register(
    "tx_match_bm25_scalar",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(len(string_split(lower(trim(text)), ' ')) AS DOUBLE) AS dl,
             string_split(lower(trim(text)), ' ') AS toks
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
      FROM base
    ),
    dfs AS (
      SELECT
        CAST(count(*) FILTER (list_contains(toks, 'data')) AS DOUBLE) AS dfa,
        CAST(count(*) FILTER (list_contains(toks, 'join')) AS DOUBLE) AS dfb,
        CAST(count(*) FILTER (list_contains(toks, 'window')) AS DOUBLE) AS dfc
      FROM base
    ),
    scored AS (
      SELECT doc_id,
        ROUND(
          (ln(1.0 + (n - dfa + 0.5) / (dfa + 0.5))
             * (CAST(len(list_filter(toks, t -> t = 'data')) AS DOUBLE) * 2.2)
             / (CAST(len(list_filter(toks, t -> t = 'data')) AS DOUBLE)
                + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
        + (ln(1.0 + (n - dfb + 0.5) / (dfb + 0.5))
             * (CAST(len(list_filter(toks, t -> t = 'join')) AS DOUBLE) * 2.2)
             / (CAST(len(list_filter(toks, t -> t = 'join')) AS DOUBLE)
                + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
        + (ln(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
             * (CAST(len(list_filter(toks, t -> t = 'window')) AS DOUBLE) * 2.2)
             / (CAST(len(list_filter(toks, t -> t = 'window')) AS DOUBLE)
                + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
        , 6) AS score
      FROM base CROSS JOIN stats CROSS JOIN dfs
    )
    SELECT doc_id, score FROM scored
    WHERE score > 0
    ORDER BY score DESC, doc_id
    LIMIT 50
    """,
    tags=("text", "fulltext", "bm25", "match"),
)
def tx_match_bm25_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's MATCH...AGAINST natural-language path under the
    oracle gate: corpus constants (per-term df, N, avgdl) resolved
    driver-side exactly like engine._rewrite_match_bm25 resolves them
    from a FULLTEXT INDEX, inlined as literals into the row-local BM25
    scalar (operators/text.bm25_scalar_sql), ranked with a 6-dp round
    + doc_id tiebreak. The oracle recomputes the same constants in SQL
    — pinning that the index-derived constant inlining matches a
    from-scratch BM25 evaluation.

    Scale: constant resolution reads a few term-keyed index rows (or
    two tiny aggregates without an index); the per-row tf/dl arithmetic
    is map-only in the scan. Same design as operators/dimjoin.py.
    """
    from myduckserver_spark.operators.dimjoin import _MEMO
    from myduckserver_spark.operators.text import bm25_idf, bm25_scalar_sql

    terms = ["data", "join", "window"]
    docs = load_table(spark, sf_dir, "documents", narrow=True)
    ck = ("ftconsts", id(spark), sf_dir, tuple(terms))
    consts = _MEMO.get(ck)
    if consts is None:
        row = docs.selectExpr(
            "CAST(size(split(lower(trim(text)), ' ')) AS DOUBLE) AS dl",
            *[
                f"CASE WHEN array_contains(split(lower(trim(text)), ' '),"
                f" '{t}') THEN 1 ELSE 0 END AS h{j}"
                for j, t in enumerate(terms)
            ],
        ).selectExpr(
            "CAST(COUNT(1) AS DOUBLE) AS n",
            "CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE) AS avgdl",
            *[f"CAST(SUM(h{j}) AS DOUBLE) AS df{j}" for j in range(len(terms))],
        ).collect()[0]
        consts = _MEMO[ck] = row
    idf = {
        t: bm25_idf(int(consts["n"]), int(consts[f"df{j}"]))
        for j, t in enumerate(terms)
    }
    score_sql = bm25_scalar_sql("text", terms, idf, float(consts["avgdl"]))
    return (
        docs.selectExpr("doc_id", f"ROUND({score_sql}, 6) AS score")
        .filter("score > 0")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
    )


@register(
    "tx_match_boolean",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             string_split(lower(text), ' ') AS toks,
             concat(' ', lower(text), ' ') AS padded
      FROM documents
    ), m AS (
      SELECT doc_id,
        list_contains(toks, 'data') AS h_data,
        list_contains(toks, 'slow') AS h_slow,
        list_contains(toks, 'merge') AS h_merge,
        instr(padded, ' window window ') > 0 AS h_phrase,
        len(list_filter(toks, t -> t LIKE 'vec%')) > 0 AS h_vec
      FROM b
    )
    SELECT doc_id,
      CAST((CASE WHEN h_data THEN 1 ELSE 0 END)
         + (CASE WHEN h_merge THEN 1 ELSE 0 END)
         + (CASE WHEN h_phrase THEN 1 ELSE 0 END)
         + (CASE WHEN h_vec THEN 1 ELSE 0 END) AS DOUBLE) AS score
    FROM m
    WHERE h_data AND NOT h_slow
    ORDER BY score DESC, doc_id
    LIMIT 100
    """,
    tags=("text", "fulltext", "boolean-mode", "match"),
)
def tx_match_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH ... AGAINST(... IN BOOLEAN MODE) operator grammar under
    the oracle gate: `+data` required, `-slow` excluded, bare `merge`
    optional, `"window window"` phrase, `vec*` prefix — the MySQL text
    goes through the FULL dialect front door (translate_mysql →
    mysql_compat._ft_bool_sql) in BOTH select-item (score) and
    predicate position, and must value-match an independent DuckDB
    reconstruction of MySQL's documented boolean-mode semantics
    (reference fulltext corpus: GMS TestFulltextIndexes,
    main_test.go:1879).

    Scale: map-only token tests in the scan + top-k; a 100 TB
    deployment would pre-filter required terms through the inverted
    fulltext index before scoring (same shape as the BM25 path)."""
    from myduckserver_spark.functions.mysql_compat import translate_mysql

    load_table(spark, sf_dir, "documents", narrow=True) \
        .createOrReplaceTempView("documents")
    against = "'+data -slow merge \"window window\" vec*' IN BOOLEAN MODE"
    return spark.sql(translate_mysql(f"""
        SELECT doc_id,
               MATCH(text) AGAINST({against}) AS score
        FROM documents
        WHERE MATCH(text) AGAINST({against})
        ORDER BY score DESC, doc_id
        LIMIT 100
    """))


@register(
    "tx_tfidf_top_terms",
    oracle="""
    WITH base AS (
      SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
      FROM documents
    ),
    tf_tab AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM base GROUP BY doc_id, term
    ),
    df_tab AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM tf_tab GROUP BY term
    ),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    weighted AS (
      SELECT doc_id, term,
             CAST(ROUND(CAST(tf AS DOUBLE)
               * ln((1.0 + CAST(n_docs AS DOUBLE))
                    / (1.0 + CAST(df AS DOUBLE))) * 1e9) AS BIGINT) AS w9
      FROM tf_tab JOIN df_tab USING (term) CROSS JOIN stats
    ),
    ranked AS (
      SELECT doc_id, term, w9,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY w9 DESC, term ASC) AS INT) AS rk
      FROM weighted
    )
    SELECT doc_id, rk, term, ROUND(CAST(w9 AS DOUBLE) / 1e9, 6) AS weight
    FROM ranked WHERE rk <= 3
    ORDER BY doc_id, rk
    """,
    tags=("text", "tfidf", "keywords"),
)
def tx_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-3 terms per document by smoothed
    tf-idf weight. See operators/text.tfidf_top_terms for the
    determinism (integer-scaled ranking) and scale notes.
    """
    from myduckserver_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_n=3)
