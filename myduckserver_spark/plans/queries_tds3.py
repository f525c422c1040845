"""Training-data-pipeline queries, wave 3 (beyond-reference operators).

Sequence packing, PII redaction, repetition-based quality, event
transition mining, and connected-components dedup clustering — the
remaining corpus-management primitives a 100 TB pretraining pipeline
runs after the wave-1/2 dedup + sampling stages. Determinism comes from
stable keys and exact integer/decimal math, never engine RNG.

Scale notes are per-query; the common theme: every shuffle is on a
natural key (lang, block key, fingerprint), star-edges keep candidate
graphs linear in corpus size, and the one iterative operator
(connected components) converges in O(diameter) rounds with a
checkpoint per round to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import bcount, o_bcount
from myduckserver_spark.plans.registry import register
from myduckserver_spark.tables import load_table

PACK_BUDGET = 256  # tokens per packed training sequence


@register(
    "tds_pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT lang, doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
                   AS n_tok
        FROM documents
        WHERE length(trim(text)) > 0
    ), packed AS (
        SELECT lang, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tok) / {PACK_BUDGET}.0)
                   AS BIGINT) AS pack_id
        FROM toks
    )
    SELECT lang, pack_id,
           {o_bcount("n_docs")},
           CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
    FROM packed
    GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
    tags=("training-data", "packing"),
)
def tds_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: assign docs to fixed-budget
    training sequences (256 whitespace tokens) in stable doc_id order
    per language; report per-pack doc count and token fill.

    This is the standard pretraining packing step (concatenate the
    corpus, cut every N tokens) expressed as pack_id =
    floor(running_token_sum_before_doc / budget). Scale: one shuffle on
    lang; the running sum is a streaming per-group window (ROWS frame),
    so no global sort. At 100 TB, pack within (lang, shard) instead of
    lang alone to bound per-group size — same plan shape.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        "lang",
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_tok"),
    )
    cum = F.sum("n_tok").over(
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.select(
        "lang",
        "n_tok",
        F.floor((cum - F.col("n_tok")) / F.lit(float(PACK_BUDGET)))
        .cast("bigint")
        .alias("pack_id"),
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(bcount("n_docs"), F.sum("n_tok").cast("bigint").alias("pack_tokens"))
        .orderBy("lang", "pack_id")
    )


# The synthetic corpus has no real PII, so the query *constructs* a
# deterministic contact suffix per doc (same expression on both
# engines), then must strip it back out — this exercises the redaction
# operator end-to-end with nonzero counts.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "tx_pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT source,
               text || ' contact user' || CAST(doc_id AS VARCHAR) || '@'
                    || source || '.org or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    ), red AS (
        SELECT source,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
                   AS n_email,
               CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT)
                   AS n_phone,
               CAST(length(t) - length(
                   regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]',
                                                 'g'),
                                  '{_PHONE_RE}', '[PHONE]', 'g')
               ) AS BIGINT) AS chars_redacted
        FROM aug
    )
    SELECT source,
           {o_bcount("n_docs")},
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(chars_redacted) AS BIGINT) AS chars_redacted
    FROM red
    GROUP BY source
    ORDER BY source
    """,
    tags=("training-data", "text"),
)
def tx_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: find-and-replace emails/phone numbers, report
    per-source match counts and characters removed.

    Spark regexp_replace is replace-all by default (DuckDB needs the
    'g' flag — the oracle carries it). Scale: pure map-side regex work
    + one aggregation shuffle on source; the regexes are anchored to
    token shapes, so no catastrophic backtracking.
    """
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@"),
            F.col("source"),
            F.lit(".org or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    both = F.regexp_replace(
        F.regexp_replace("t", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    red = aug.select(
        "source",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_email"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phone"),
        (F.length("t") - F.length(both)).cast("bigint").alias("chars_redacted"),
    )
    return (
        red.groupBy("source")
        .agg(
            bcount("n_docs"),
            F.sum("n_email").cast("bigint").alias("emails"),
            F.sum("n_phone").cast("bigint").alias("phones"),
            F.sum("chars_redacted").cast("bigint").alias("chars_redacted"),
        )
        .orderBy("source")
    )


@register(
    "tx_repetition_ratio",
    oracle="""
    WITH d AS (
        SELECT lang,
               CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                    AS BIGINT) AS nw,
               CAST(len(list_distinct(
                    regexp_split_to_array(lower(trim(text)), '\\s+')))
                    AS BIGINT) AS nd
        FROM documents
        WHERE length(trim(text)) > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS total_words,
           CAST(SUM(nw - nd) AS BIGINT) AS dup_words,
           CAST(SUM(CASE WHEN nd * 2 <= nw THEN 1 ELSE 0 END) AS BIGINT)
               AS high_rep_docs
    FROM d
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("training-data", "text", "quality"),
)
def tx_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: per-language duplicate-word
    mass and the count of docs where >=50% of words are repeats (the
    usual drop threshold for degenerate/boilerplate text).

    All outputs are integer sums (no float ratios), so the oracle hash
    is exact by construction. Scale: map-side tokenize + one shuffle on
    lang; the CASE threshold uses integer compare (nd*2 <= nw), not a
    division.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim("text")), r"\s+")
    d = docs.filter(F.length(F.trim("text")) > 0).select(
        "lang",
        F.size(words).cast("bigint").alias("nw"),
        F.size(F.array_distinct(words)).cast("bigint").alias("nd"),
    )
    return (
        d.groupBy("lang")
        .agg(
            bcount("n_docs"),
            F.sum("nw").cast("bigint").alias("total_words"),
            F.sum(F.col("nw") - F.col("nd")).cast("bigint").alias("dup_words"),
            F.sum(
                F.when(F.col("nd") * 2 <= F.col("nw"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("high_rep_docs"),
        )
        .orderBy("lang")
    )


@register(
    "ev_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY n DESC, prev_type, next_type
    LIMIT 20
    """,
    tags=("events", "sequence"),
)
def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (first-order Markov counts): for each
    user's time-ordered stream, count (previous event -> next event)
    pairs; top 20 transitions. The sequence-mining primitive behind
    next-action models and funnel discovery.

    Scale: one shuffle on user_id for the LAG window (per-user streams
    sort within partitions), then one aggregation shuffle on the tiny
    (prev, next) key space; top-20 is TakeOrdered, no global sort.
    """
    events = load_table(spark, sf_dir, "events")
    seq = events.select(
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(bcount("n"))
        .orderBy(F.col("n").desc(), "prev_type", "next_type")
        .limit(20)
    )


@register(
    "dd_connected_components",
    oracle="""
    WITH RECURSIVE docs2 AS (
        SELECT doc_id,
               regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        FROM documents
        WHERE len(regexp_split_to_array(lower(trim(text)), '\\s+')) >= 2
    ), keys AS (
        SELECT doc_id,
               list_extract(w, 1) || ' ' || list_extract(w, 2) AS k
        FROM docs2
        UNION ALL
        SELECT doc_id,
               list_extract(w, len(w) - 1) || ' ' || list_extract(w, len(w))
                   AS k
        FROM docs2
    ), stars AS (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY k) AS mn
        FROM keys
    ), edges0 AS (
        SELECT DISTINCT doc_id AS src, mn AS dst
        FROM stars WHERE doc_id <> mn
    ), edges AS (
        SELECT src, dst FROM edges0
        UNION
        SELECT dst AS src, src AS dst FROM edges0
    ), walk(node, label) AS (
        SELECT doc_id, doc_id FROM docs2
        UNION
        SELECT e.dst, wk.label
        FROM walk wk JOIN edges e ON e.src = wk.node
    ), comp AS (
        SELECT node, MIN(label) AS component FROM walk GROUP BY node
    )
    SELECT component, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM comp
    GROUP BY component
    HAVING COUNT(*) >= 2
    ORDER BY component
    """,
    tags=("dedup", "training-data", "iterative"),
)
def dd_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components dedup clustering: block docs by their first-2
    and last-2 words, star-connect each block to its min doc_id, then
    min-label propagation to a fixpoint. Components (>=2 docs, labeled
    by min doc_id) are the transitive near-dup groups — the step that
    turns pairwise candidate hits into keep-one-per-group decisions
    (reference analog: the LSH candidate pairs of dd_minhash_lsh feed
    exactly this in a production dedup).

    Scale: star edges keep the graph LINEAR in corpus size (no
    quadratic within-block pair join); propagation rounds = graph
    diameter (small for blocking graphs), each round one join shuffle
    on node with a localCheckpoint to cut lineage. The DuckDB oracle
    computes the same fixpoint with WITH RECURSIVE.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    ).filter(F.size("w") >= 2)
    pre = d.select(
        "doc_id",
        F.concat_ws(" ", F.expr("element_at(w, 1)"), F.expr("element_at(w, 2)"))
        .alias("k"),
    )
    suf = d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.expr("element_at(w, size(w) - 1)"),
            F.expr("element_at(w, size(w))"),
        ).alias("k"),
    )
    keys = pre.unionAll(suf)
    stars = keys.select(
        "doc_id", F.min("doc_id").over(W.partitionBy("k")).alias("mn")
    )
    edges0 = (
        stars.filter(F.col("doc_id") != F.col("mn"))
        .select(F.col("doc_id").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )
    edges = edges0.unionAll(
        edges0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    labels = d.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
    ).localCheckpoint(eager=True)
    # Min-label propagation. Convergence check is an aggregate (sum of
    # labels strictly decreases until fixpoint), not a row diff join.
    # One action per round: the checkpoint is LAZY and the sum collect
    # materializes it as a side effect of the same job, so each round
    # costs one shuffle round-trip instead of two full executions
    # (eager ckpt + separate sum re-read; measured 140 -> 112 jobs at
    # sf0.01 over the 28 rounds, identical labels).
    prev_sum = None
    for _ in range(32):  # diameter bound (sf0.01 converges in 28)
        cand = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), F.col("label")
        )
        labels = (
            labels.unionAll(cand)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return (
        labels.groupBy(F.col("label").alias("component"))
        .agg(bcount("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy("component")
    )
