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


# Fixed 2-universal hash family constants for minhash seeds
# (arbitrary values < p; shared verbatim by the DuckDB oracle SQL).
MINHASH_P = 2147483647  # 2^31 - 1, prime
MINHASH_A = [
    1103515245, 1103533621, 1234567891, 1856947721,
    2027382347, 756073813, 892174501, 1679606101,
    1500450271, 2038074743, 1289374951, 987654323,
    1212121213, 1717171717, 1444444447, 1999999991,
]
MINHASH_B = [
    12345, 987654321, 192837465, 1029384756,
    564738291, 1122334455, 2046913579, 777000111,
    313222271, 1598235853, 444333221, 909090911,
    135792468, 246813579, 1357997531, 864208642,
]


def shingle_array(text_col: str = "text", n: int = 3):
    """Column of distinct word n-gram shingles (row-local, no shuffle).
    Built from the SQL-text twin in ONE Py4J round-trip (the Column-
    object formulation cost ~10 driver calls per use)."""
    return F.expr(shingle_expr_sql(text_col, n))


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document (built-in fns only)."""
    return df.select(
        F.col(id_col), F.explode(shingle_array(text_col, n)).alias("shingle")
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
    sig = minhash_signature_array(df, text_col, id_col, num_hashes, shingle_n)
    return sig.select(
        F.col(id_col),
        F.posexplode("sig").alias("seed", "minhash"),
    ).select(id_col, F.col("seed").cast("int"), "minhash")


def minhash_signature_array(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<bigint>) — the whole sketch computed row-local.

    No shuffle and no row blowup: the signature is computed inside two
    chained projections. (An earlier formulation exploded shingles ×
    seeds and aggregated twice — two shuffles of 8× the shingle count;
    at 100 TB this version is a pure map stage that scales with input
    splits.)

    Per-seed hashes are a 2-universal linear family over one digest:
    g_i(s) = (a_i·h(s) + b_i) mod p, with h = the first 28 bits of
    md5(s) and p = 2^31−1. One md5 per shingle instead of
    `num_hashes`, integer (not string) mins, and h < p < 2^31 keeps
    a_i·h + b_i < 2^59 — exact BIGINT arithmetic in every engine (the
    DuckDB oracle computes the identical value via
    CAST('0x'||substr(md5,..) AS BIGINT)). Unlike the cheaper
    h1 + i·h2 double-hash, the random (a_i, b_i) draws make the per-
    seed minima near-independent, which is what keeps LSH candidate
    sets tight.

    Shape notes (measured on Spark 4.1.2, sf0.1 documents):
    - md5/conv runs ONCE per shingle into an `hs` bigint array, then
      each seed takes an `array_min(transform(hs, ...))` — a single
      multiply-add-mod per element. The earlier single
      `aggregate(...)` fold allocated a fresh num_hashes-long array
      per shingle step and re-built the (a, b) literal arrays per
      element; higher-order fns are interpreted (never codegen'd), so
      that garbage made runtimes swing 0.4s→3.6s under GC pressure.
      This form is ~10× steadier (0.3s flat).
    - Each per-seed lambda gets a DISTINCT variable name (h0, h1, …):
      identical nested lambda variables across expressions in one
      projection collide after Catalyst inlines them and produce
      garbage values (observed on Spark 4.1.2 with shared `(m, i)`
      lambdas).
    """
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"num_hashes > {len(MINHASH_A)} not supported")
    # words hoisted into their own projection: the interpreted shingle
    # lambda otherwise re-evaluates the split per sequence element
    # (measured ~28% of the signature map at sf0.1; value-identical)
    shingled = df.select(
        F.col(id_col), F.expr(words_expr_sql(text_col)).alias("__w")
    ).select(
        F.col(id_col),
        F.expr(shingle_from_words_sql("__w", shingle_n)).alias("shingles"),
    ).filter(F.col("shingles").isNotNull())  # NULL text sketches nothing
    # (explode() dropped those rows in the unbatched formulation)
    hashed = shingled.select(
        F.col(id_col),
        F.expr(
            "transform(shingles, s -> cast(conv(substr(md5(s), 1, 7), 16, 10)"
            " as bigint))"
        ).alias("hs"),
    )
    # One F.expr for the whole signature array (not num_hashes separate
    # Column objects + an F.array): the expression tree is identical
    # after parsing, but building it as a single SQL string is one Py4J
    # round-trip instead of ~20.
    per_seed = ", ".join(
        f"array_min(transform(hs, h{i} -> ({MINHASH_A[i]}L * h{i}"
        f" + {MINHASH_B[i]}L) % {MINHASH_P}))"
        for i in range(num_hashes)
    )
    return hashed.select(
        F.col(id_col), F.expr(f"array({per_seed})").alias("sig")
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
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seed", "minhash"))
                        ).getField("minhash"),
                        lambda m: m.cast("string"),
                    ),
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
    """Candidate near-dup pairs: docs sharing ≥1 LSH band bucket.

    Everything up to the bucket join is row-local (see
    minhash_signature_array): the ONLY shuffle is the self-join keyed
    on (band, band_sig) — same-bucket docs only, the LSH scale
    property — plus the final pair aggregation.
    """
    sig = minhash_signature_array(df, text_col, id_col, num_hashes, shingle_n)
    n_bands = num_hashes // rows_per_band
    # one SQL string for the whole band array (same tree after parsing;
    # ~25 fewer Py4J round-trips per plan build)
    structs = ", ".join(
        "struct({b} AS band, md5(concat_ws('|', {parts})) AS band_sig)".format(
            b=b,
            parts=", ".join(
                f"cast(sig[{b * rows_per_band + k}] as string)"
                for k in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    # Explicit repartition on the bucket key BEFORE the self-join, with
    # shuffle_hash hints: both join children become byte-identical
    # exchanges, so Catalyst plans a ReusedExchange and the signature
    # pipeline (the expensive md5-per-shingle map) runs ONCE, not once
    # per side (a broadcast self-join recomputed it in the build job —
    # measured 616→468 ms at sf0.1). Same shape at 100 TB: one
    # signature pass, one bucket shuffle, co-partitioned join.
    bands = (
        sig.select(
            F.col(id_col), F.expr(f"explode(array({structs}))").alias("bb")
        )
        .select(
            id_col,
            F.col("bb.band").alias("band"),
            F.col("bb.band_sig").alias("band_sig"),
        )
        .repartition("band", "band_sig")
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.hint("shuffle_hash")
        .join(
            b.hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


def minhash_lsh_candidates_sql(
    view: str,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
) -> str:
    """SQL-text twin of :func:`minhash_lsh_candidates` — the identical
    plan (row-local signature pipeline → band explode → DISTRIBUTE BY
    bucket key → shuffle-hash self-join with a ReusedExchange →
    pair aggregation) rendered as ONE SQL string over a registered
    view. The build is a single spark.sql() round-trip instead of ~30
    Py4J calls with per-call JVM expression parsing (the q1/q3 lever
    from round 5 applied to the dedup family).

    The `bands` CTE is referenced twice; Spark inlines CTEs (no
    materialization), and because both inlined subtrees are
    byte-identical up to the DISTRIBUTE BY exchange, ReuseExchange
    dedups them — the expensive md5-per-shingle signature map runs
    ONCE, exactly like the DataFrame build's explicit repartition.
    Per-seed lambda variables keep DISTINCT names (h0, h1, …): shared
    nested lambda names across expressions in one projection collide
    after Catalyst inlines them (Spark 4.1.2, see
    minhash_signature_array).
    """
    if num_hashes > len(MINHASH_A):
        raise ValueError(f"num_hashes > {len(MINHASH_A)} not supported")
    n_bands = num_hashes // rows_per_band
    per_seed = ", ".join(
        f"array_min(transform(hs, h{i} -> ({MINHASH_A[i]}L * h{i}"
        f" + {MINHASH_B[i]}L) % {MINHASH_P}))"
        for i in range(num_hashes)
    )
    structs = ", ".join(
        "struct({b} AS band, md5(concat_ws('|', {parts})) AS band_sig)".format(
            b=b,
            parts=", ".join(
                f"cast(sig[{b * rows_per_band + k}] as string)"
                for k in range(rows_per_band)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
    WITH bands AS (
        SELECT {id_col}, bb.band AS band, bb.band_sig AS band_sig
        FROM (
            SELECT {id_col}, explode(array({structs})) AS bb
            FROM (
                SELECT {id_col}, array({per_seed}) AS sig
                FROM (
                    SELECT {id_col},
                           transform(shingles,
                                     s -> cast(conv(substr(md5(s), 1, 7),
                                               16, 10) as bigint)) AS hs
                    FROM (SELECT {id_col},
                                 {shingle_from_words_sql("__w", shingle_n)}
                                   AS shingles
                          FROM (SELECT {id_col},
                                       {words_expr_sql(text_col)} AS __w
                                FROM {view}))
                    WHERE shingles IS NOT NULL
                ) __hashed
            ) __sig
        ) __bb
        DISTRIBUTE BY band, band_sig
    )
    SELECT /*+ SHUFFLE_HASH(a, b) */
           a.{id_col} AS doc_a, b.{id_col} AS doc_b,
           CAST(COUNT(1) AS BIGINT) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig
     AND a.{id_col} < b.{id_col}
    GROUP BY a.{id_col}, b.{id_col}
    """


def shingle_hash_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sh: bigint) — one row per distinct shingle, keyed by the
    first 60 bits of md5(shingle) instead of the shingle text.

    The hash is computed map-side once per shingle; the inverted-index
    join then shuffles/compares 8-byte keys instead of ~20-char strings
    (~2x on the self-join stage). Both engines derive the identical
    bigint from md5 hex, and any (astronomically rare, ~2^-61 per pair)
    collision affects both engines identically — the oracle compare
    stays exact.
    """
    return df.select(
        F.col(id_col), F.expr(words_expr_sql(text_col)).alias("__w")
    ).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(" + shingle_from_words_sql("__w", n) + ","
                " s -> cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint))"
            )
        ).alias("sh"),
    )


def words_expr_sql(text_col: str) -> str:
    """The tokenization every shingle/minhash path shares."""
    return f"split(lower(trim({text_col})), ' ')"


def shingle_expr_sql(text_col: str, n: int) -> str:
    """SQL-text twin of shingle_array (for use inside F.expr lambdas).

    Prefer the two-step words-hoisted form (words_expr_sql +
    shingle_from_words_sql) on hot paths: with this single-expression
    form the interpreted lambda re-evaluates the split per sequence
    element (measured: shingle+md5 stage 162-183ms → 123-131ms at
    sf0.1 after hoisting — ~28% of the signature map)."""
    words = words_expr_sql(text_col)
    return (
        f"array_distinct(transform(sequence(0, greatest(size({words}) - {n},"
        f" 0)), i -> concat_ws(' ', slice({words}, i + 1, {n}))))"
    )


def shingle_from_words_sql(words_col: str, n: int) -> str:
    """Shingles from a PRE-COMPUTED words array column — the hoisted
    half of shingle_expr_sql (identical values; the split runs once per
    row instead of once per sequence element in interpreted eval)."""
    return (
        f"array_distinct(transform(sequence(0, greatest(size({words_col})"
        f" - {n}, 0)), i -> concat_ws(' ', slice({words_col}, i + 1, {n}))))"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing ≥1 shingle."""
    sh = shingle_hash_rows(df, text_col, id_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
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


def span_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
    stride: int = 10,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, keep_cols..., span_hash): md5 over every `span_words`-word
    window at `stride` word offsets — the exact-substring granularity
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"): duplicated SPANS across documents are the memorize-
    prone unit that document-level dedup (exact or near) cannot see.

    Scale: pure map-side explosion, ~len/stride spans per document; no
    shuffle here — the downstream groupBy(span_hash) is the one keyed
    shuffle, the same cost class as exact_dedup's fingerprint pass.
    """
    # words hoisted into a projection (same lever as the minhash
    # signature map): the interpreted span lambda otherwise re-splits
    # the text per sequence element
    ws = f"split(trim({text_col}), '\\\\s+')"
    spans = F.expr(
        f"transform(sequence(1, size(__ws) - {span_words - 1}, {stride}),"
        f" i -> md5(array_join(slice(__ws, i, {span_words}), ' ')))"
    )
    return (
        df.select("*", F.expr(ws).alias("__ws"))
        .filter(F.expr(f"size(__ws) >= {span_words}"))
        .select(id_col, *keep_cols, F.explode(spans).alias("span_hash"))
    )


def duplicate_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    span_words: int = 20,
    stride: int = 10,
) -> DataFrame:
    """Per-group exact-substring duplication profile:
    (group, n_spans, n_dup_spans) where a span is "dup" when its hash
    occurs in ≥2 DISTINCT documents. The n_dup/n_spans ratio is the
    signal a 100 TB pipeline uses to decide whether span-level removal
    is worth a rewrite pass over a source.

    Scale: one groupBy(span_hash) with map-side combine for the dup
    set, one hash-keyed join back (dup hashes only — the set shrinks
    with true duplication), one per-group rollup.
    """
    spans = span_hashes(
        df, text_col, id_col, span_words, stride, keep_cols=(group_col,)
    )
    dup = (
        spans.groupBy("span_hash")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("span_hash")
    )
    total = spans.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans")
    )
    dups = (
        spans.join(dup, "span_hash")
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_spans"))
    )
    return (
        total.join(dups, group_col, "left")
        .select(
            group_col,
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias(
                "n_dup_spans"
            ),
        )
    )
