"""Text-analysis operators: token stats, quality scoring, language ID,
fingerprinting. All map-only column math (zero shuffle) — the standard
pre-training corpus filter pass at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "es": ("el", "la", "de"),
    "fr": ("le", "la", "et"),
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), " ")


def token_count(text_col: str = "text") -> Column:
    return F.size(tokens(text_col)).cast("int")


def bpe_ish_token_count(text_col: str = "text") -> Column:
    """Sub-word-ish token count: split on word boundaries AND digit
    runs (a BPE-flavored overestimate of whitespace tokens)."""
    return F.size(
        F.filter(
            F.split(F.col(text_col), r"[\s]+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"),
            lambda t: t != "",
        )
    ).cast("int")


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """Heuristic quality signals; use with df.withColumns(...)."""
    n_chars = F.length(text_col)
    toks = tokens(text_col)
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    return {
        "n_chars": n_chars.cast("int"),
        "n_tokens": F.size(toks).cast("int"),
        "alpha_ratio": F.round(
            F.length(F.regexp_replace(text_col, "[^a-z]", "")).cast("double")
            / n_chars,
            6,
        ),
        "stopword_ratio": F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast(
                "double"
            )
            / F.size(toks),
            6,
        ),
        "mean_token_len": F.round(n_chars.cast("double") / F.size(toks), 6),
    }


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 100_000,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """Gopher-style quality gate (length + stopword floor)."""
    cols = quality_columns(text_col)
    return (
        df.withColumns(cols)
        .filter(
            (F.col("n_chars") >= min_chars)
            & (F.col("n_chars") <= max_chars)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
        )
        .drop(*cols.keys())
    )


def langid_column(text_col: str = "text") -> Column:
    """Best-scoring language by stopword hits; 'und' if no hits.

    Deterministic tie-break: highest language key (array_max compares
    (hits, lang) structs lexicographically).
    """
    toks = tokens(text_col)
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(
                    "hits"
                ),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")


def fingerprint(text_col: str = "text") -> Column:
    """Normalized content fingerprint (strip non-alnum, md5)."""
    return F.md5(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))


def rolling_hash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Winnowing-style chunk fingerprints: md5 of overlapping char
    windows — the building block for partial-overlap detection."""
    starts = F.sequence(
        F.lit(0),
        F.greatest((F.length(text_col) - window), F.lit(0)),
        F.lit(stride),
    )
    return df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                starts,
                lambda s: F.md5(F.col(text_col).substr(s + 1, F.lit(window))),
            )
        ).alias("chunk_fp"),
    ).distinct()


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 50,
) -> DataFrame:
    """Okapi BM25 ranking over a document corpus — real full-text
    relevance (the engine analog of MySQL MATCH...AGAINST IN NATURAL
    LANGUAGE MODE and DuckDB's FTS extension, both of which rank by
    BM25-family scores; reference fulltext surface:
    main_test.go:1879 TestFulltextIndexes).

    Returns (doc_id, n_terms, score) for the top-k docs matching >= 1
    query term; score descending, doc_id ascending tiebreak.

    Determinism: per-term partial scores are scaled by 1e9 and summed
    as BIGINT (exact + associative, so partition order can't change the
    result); the final score is one division back to DOUBLE. idf uses
    the Robertson/Lucene form ln(1 + (N-df+0.5)/(df+0.5)), always >= 0.

    Scale: tokenize is map-only; tf is one shuffle keyed (doc, term)
    restricted to the query terms (posting-list build, never the full
    vocabulary); df aggregates |terms| rows; corpus stats (N, avgdl)
    are a 2-value broadcast. The scoring join is doc-keyed — at 100 TB
    this is the classic distributed inverted-index probe with no
    all-pairs anywhere.
    """
    term_arr = F.array(*[F.lit(t) for t in terms])
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("__toks"),
    ).select(
        "doc_id",
        F.size("__toks").cast("long").alias("dl"),
        F.filter("__toks", lambda t: F.array_contains(term_arr, t)).alias(
            "__hit"
        ),
    )
    # posting lists: tf per (doc, term), query terms only
    tf_tab = (
        base.select("doc_id", "dl", F.explode("__hit").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_tab = tf_tab.groupBy("term").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    n_docs = F.col("n_docs").cast("double")
    avgdl = F.col("sum_dl").cast("double") / n_docs
    idf = F.log(
        F.lit(1.0)
        + (n_docs - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    part = idf * (
        tf_d
        * (1.0 + k1)
        / (tf_d + k1 * (1.0 - b + b * dl_d / avgdl))
    )
    scored = (
        tf_tab.join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(part * 1e9).cast("long").alias("__s9"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_terms"),
            (F.sum("__s9").cast("double") / 1e9).alias("score"),
        )
        .select("doc_id", "n_terms", F.round("score", 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def tfidf_top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 3,
    max_df_ratio: float = 1.0,
) -> DataFrame:
    """Per-document TF-IDF keyword extraction: the top_n terms by
    tf * ln((1+N)/(1+df)) weight (sklearn's smoothed idf), weight
    descending with term-ascending tiebreak.

    Determinism: weights are scaled by 1e9 and ranked as BIGINT, so
    ranking never depends on float formatting; the reported weight is
    one division back to DOUBLE.

    Scale: tf is one shuffle keyed (doc, term); df aggregates to
    vocabulary size (words, not documents) and joins back broadcast
    after the optional max_df_ratio stopword prune; the final rank is
    a window partitioned by doc. No all-pairs, no driver collection.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf_tab = base.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_tab = tf_tab.groupBy("term").agg(
        F.count_distinct("doc_id").cast("long").alias("df")
    )
    stats = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    if max_df_ratio < 1.0:
        df_tab = df_tab.crossJoin(F.broadcast(stats)).filter(
            F.col("df").cast("double")
            <= F.lit(max_df_ratio) * F.col("n_docs").cast("double")
        ).select("term", "df")
    w9 = F.round(
        F.col("tf").cast("double")
        * F.log(
            (F.lit(1.0) + F.col("n_docs").cast("double"))
            / (F.lit(1.0) + F.col("df").cast("double"))
        )
        * 1e9
    ).cast("long")
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("__w9"), F.asc("term")
    )
    return (
        tf_tab.join(F.broadcast(df_tab), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", w9.alias("__w9"))
        .withColumn("rk", F.row_number().over(win).cast("int"))
        .filter(F.col("rk") <= top_n)
        .select(
            "doc_id",
            "rk",
            "term",
            F.round(F.col("__w9").cast("double") / 1e9, 6).alias("weight"),
        )
        .orderBy("doc_id", "rk")
    )


# ---------------------------------------------------------------- fulltext
#
# Real MATCH...AGAINST relevance (reference: TestFulltextIndexes
# main_test.go:1879; go-mysql-server computes relevancy from fulltext
# index tables). The engine path (engine._rewrite_match_bm25) resolves
# a declared FULLTEXT INDEX into per-term document frequencies + corpus
# stats and inlines them as literals into a row-local Okapi BM25 scalar
# — the same constant-inlining strategy as operators/dimjoin.py, and
# the same split of work as a real fulltext engine: corpus statistics
# live in the index (built once, updated on write), per-row term
# frequencies are computed in the scan.

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_idf(n_docs: int, df: int) -> float:
    """Robertson/Lucene idf: ln(1 + (N - df + 0.5)/(df + 0.5)) >= 0."""
    import math

    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tokens_sql(text_sql: str, dialect: str = "spark") -> str:
    """SQL twin of `tokens` (split(lower(trim(x)), ' ')) per dialect."""
    if dialect == "spark":
        return f"split(lower(trim({text_sql})), ' ')"
    return f"string_split(lower(trim({text_sql})), ' ')"


def bm25_scalar_sql(
    text_sql: str,
    terms: list[str],
    idf: dict[str, float],
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    dialect: str = "spark",
) -> str:
    """Row-local BM25 score as a SQL scalar with corpus constants
    (idf per term, avgdl) inlined as literals. Term partials are added
    in fixed textual order, and every constant is a Python-repr'd
    double parsed identically by Spark and DuckDB, so the score is
    bit-deterministic given equal tf/dl — rank stability then only
    needs a ROUND(...,6) + id tiebreak like the other scored queries.
    """
    toks = tokens_sql(text_sql, dialect)
    size_fn = "size" if dialect == "spark" else "len"
    filt_fn = "filter" if dialect == "spark" else "list_filter"
    dl = f"CAST({size_fn}({toks}) AS DOUBLE)"
    parts = []
    for j, t in enumerate(terms):
        lit = t.replace("'", "''")
        tf = (
            f"CAST({size_fn}({filt_fn}({toks},"
            f" __ft{j} -> __ft{j} = '{lit}')) AS DOUBLE)"
        )
        parts.append(
            f"({idf[t]!r} * ({tf} * {k1 + 1.0!r})"
            f" / ({tf} + {k1!r} * (1.0 - {b!r} + {b!r} * {dl} / {avgdl!r})))"
        )
    return "(" + " + ".join(parts) + ")" if parts else "0.0"
