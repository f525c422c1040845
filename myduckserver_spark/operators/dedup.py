"""Deduplication operators for training-data pipelines.

All engine-portable (md5-based hashing) and shuffle-bounded:
- exact: hash-groupBy on a normalized fingerprint,
- MinHash+LSH: shingle → minhash → band → bucket self-join,
- SimHash: 60-bit signature + banded hamming candidate pairs,
- n-gram Jaccard: inverted-index self-join (exact similarity).

Scale design: no operator ever compares all pairs — every self-join is
keyed (band signature, hash chunk, or shingle), which is what makes
near-dup feasible at 100 TB. No collect(); everything is a DataFrame →
DataFrame transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document (built-in fns only)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle")
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint."""
    fp = F.md5(F.lower(F.trim(F.col(text_col)))).alias("fp")
    keep = (
        df.select(F.col(id_col), fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keep, id_col, "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, seed, minhash): permutation-min sketch per seed.

    minhash_i = lexicographic MIN of md5(i + ':' + shingle) — a valid
    min-over-permutation since md5 orders shingles pseudo-randomly per
    seed, and identical across engines/runs.
    """
    sh = word_shingles(df, text_col, id_col, shingle_n)
    seeds = sh.sparkSession.range(num_hashes).select(
        F.col("id").cast("int").alias("seed")
    )
    return (
        sh.crossJoin(F.broadcast(seeds))
        .groupBy(id_col, "seed")
        .agg(
            F.min(
                F.md5(
                    F.concat(
                        F.col("seed").cast("string"), F.lit(":"), F.col("shingle")
                    )
                )
            ).alias("minhash")
        )
    )


def lsh_bands(
    signatures: DataFrame, id_col: str = "doc_id", rows_per_band: int = 2
) -> DataFrame:
    """(id, band, band_sig): md5 over the band's ordered minhashes."""
    return (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.array_sort(
                        F.collect_list(F.struct("seed", "minhash"))
                    ).getField("minhash"),
                )
            ).alias("band_sig")
        )
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket."""
    bands = lsh_bands(
        minhash_signatures(df, text_col, id_col, num_hashes, shingle_n),
        id_col,
        rows_per_band,
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing ≥1 shingle."""
    sh = word_shingles(df, text_col, id_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        pairs.join(sa, F.col(f"sa.{id_col}") == F.col("doc_a"))
        .join(sb, F.col(f"sb.{id_col}") == F.col("doc_b"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """(id, simhash): sum of ±1 bit votes over token hashes.

    Token hash = first 15 md5 hex chars → 60-bit int (sign-safe in a
    BIGINT). Map-side ×bits expansion, one keyed shuffle.
    """
    tokens = (
        df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), " "))
            ).alias("token"),
        )
        .filter(F.col("token") != "")
        .select(
            F.col(id_col),
            F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long").alias("h"),
        )
    )
    bitpos = tokens.sparkSession.range(bits).select(
        F.col("id").cast("int").alias("bit_pos")
    )
    scores = (
        tokens.crossJoin(F.broadcast(bitpos))
        .groupBy(id_col, "bit_pos")
        .agg(
            F.sum(F.when(F.expr("(h >> bit_pos) & 1") == 1, 1).otherwise(-1)).alias(
                "score"
            )
        )
    )
    return scores.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("score") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit_pos)")
            ).otherwise(F.lit(0).cast("long"))
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_near_pairs(
    sim: DataFrame, id_col: str = "doc_id", max_hamming: int = 3, chunks: int = 4
) -> DataFrame:
    """Hamming-close pairs via chunk banding (pigeonhole: hamming ≤
    chunks-1 ⟹ some chunk identical), then exact hamming filter.

    Scale: the self-join is keyed on (chunk index, chunk value) — the
    standard simhash dedup index shape, no all-pairs compare.
    """
    chunk_bits = 60 // chunks
    idx = sim.sparkSession.range(chunks).select(F.col("id").cast("int").alias("ci"))
    chunked = sim.crossJoin(F.broadcast(idx)).select(
        F.col(id_col),
        "simhash",
        "ci",
        F.expr(
            f"(simhash >> (ci * {chunk_bits})) & {(1 << chunk_bits) - 1}"
        ).alias("chunk"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("sh_a ^ sh_b"))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
