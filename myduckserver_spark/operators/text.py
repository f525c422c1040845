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
