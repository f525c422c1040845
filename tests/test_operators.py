"""Unit tests for the reusable operator library (dedup / similarity /
text / multimodal) — behavior the oracle gate can't capture directly."""

from pyspark.sql import functions as F

from myduckserver_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from myduckserver_spark.operators.multimodal import (
    attach_media,
    decode_images,
    frame_sample,
    media_stats,
)
from myduckserver_spark.operators.similarity import cosine_topk, ivf_search
from myduckserver_spark.operators.text import (
    bpe_ish_token_count,
    langid_column,
    quality_filter,
    rolling_hash_fingerprints,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
    (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
    (4, "completely different content about spark engines and data"),
    (5, "der hund und die katze und der vogel"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(spark):
    out = exact_dedup(_docs(spark))
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3, 4, 5]  # 2 removed as dup of 1


def test_minhash_lsh_finds_exact_and_near_dups(spark):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(_docs(spark)).collect()
    }
    assert (1, 2) in pairs  # identical docs share all bands
    assert (4, 5) not in pairs  # unrelated docs don't


def test_ngram_jaccard_scores(spark):
    out = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.1).collect()
    }
    assert out[(1, 2)] == 1.0  # identical
    assert 0.1 < out[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in out


def test_simhash_identical_docs_equal_near_docs_close(spark):
    sh = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    assert sh[1] == sh[2]
    near = simhash_near_pairs(simhash(_docs(spark)), max_hamming=20)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in near.collect()}
    assert pairs[(1, 2)] == 0


def test_cosine_topk_self_similarity(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [0.9, 0.1, 0.0], 0),
            (3, [0.0, 1.0, 0.0], 1),
            (4, [0.0, 0.0, 1.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 1), k=2).collect()
    ranked = [(r.vec_id, r.rk) for r in out]
    assert ranked[0] == (2, 1)  # nearest neighbor of e1 is e2


def test_cosine_topk_np_matches_hof_twin(spark):
    # the Arrow-batched numpy matmul path must reproduce the
    # higher-order-function baseline exactly (same ROUND(sim,6) rank
    # key, id tiebreak, self-match exclusion) on real data
    from myduckserver_spark.operators.similarity import cosine_topk_np
    from myduckserver_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(tuple(r) for r in cosine_topk(emb, q, k=5).collect())
    b = sorted(tuple(r) for r in cosine_topk_np(emb, q, k=5).collect())
    assert a == b and len(a) == 25


def test_ivf_search_finds_in_bucket_neighbor(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),   # centroid A
            (50, [0.0, 1.0], 1),  # centroid B
            (1, [0.99, 0.14], 0),
            (2, [0.98, 0.2], 0),
            (51, [0.1, 0.99], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    cent = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    res = ivf_search(emb, emb.filter(F.col("vec_id") == 1), cent, k=2, nprobe=1)
    got = {r.vec_id for r in res.collect()}
    assert 2 in got          # same-bucket neighbor found
    assert 51 not in got     # other bucket never touched (nprobe=1)


def test_quality_filter_drops_junk(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog " * 5),
            (2, "x"),                       # too short
            (3, "zz qq ww ee rr tt yy " * 10),  # no stopwords
        ],
        "doc_id long, text string",
    )
    kept = [r.doc_id for r in quality_filter(df, min_chars=50).collect()]
    assert kept == [1]


def test_langid_and_bpe_tokens(spark):
    df = _docs(spark).withColumns(
        {"lang_pred": langid_column(), "n_bpe": bpe_ish_token_count()}
    )
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].lang_pred == "en"
    assert rows[5].lang_pred == "de"
    assert rows[1].n_bpe >= 12


def test_rolling_hash_shared_chunks_for_overlap(spark):
    fps = rolling_hash_fingerprints(_docs(spark), window=16, stride=8)
    a = {r.chunk_fp for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.chunk_fp for r in fps.filter(F.col("doc_id") == 2).collect()}
    d = {r.chunk_fp for r in fps.filter(F.col("doc_id") == 4).collect()}
    assert a == b            # identical docs → identical chunk sets
    assert not (a & d)       # unrelated docs share nothing


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG fake payload bytes"), (2, b"RIFF other bytes xx")],
        "doc_id long, raw binary",
    )
    media = attach_media(df, "raw", fmt="png")
    assert media.schema["media"].dataType.simpleString().startswith("struct<data:binary")

    decoded = {r.doc_id: r for r in decode_images(media).collect()}
    assert decoded[1].n_bytes == 23
    assert 16 <= decoded[1].width < 80 and 16 <= decoded[1].height < 80
    # deterministic: same input → same fake dims
    again = {r.doc_id: r for r in decode_images(media).collect()}
    assert again[1].width == decoded[1].width

    frames = frame_sample(media, every_n=1)
    assert frames.count() >= 2

    stats = {r.format: r.n for r in media_stats(media).collect()}
    assert stats == {"png": 2}


def test_media_stats_prunes_payload_column(spark, tmp_path):
    """Metadata-only op must not read media.data from parquet."""
    df = spark.createDataFrame(
        [(1, b"payload" * 1000)], "doc_id long, raw binary"
    )
    p = str(tmp_path / "media_parquet")
    attach_media(df, "raw", fmt="png").write.parquet(p)
    plan = media_stats(spark.read.parquet(p))._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "data" not in rs[0]

def test_multimodal_resize_and_features(spark):
    from myduckserver_spark.operators.multimodal import (
        extract_features,
        resize_images,
    )

    df = spark.createDataFrame(
        [(1, bytes(range(200))), (2, b"")], "doc_id long, raw binary"
    )
    media = attach_media(df, "raw", fmt="png")

    resized = {r.doc_id: r for r in
               resize_images(media, max_side=32).collect()}
    assert max(resized[1].new_width, resized[1].new_height) <= 32
    assert resized[1].payload  # passthrough payload survives
    assert resized[2].new_width == 0  # empty media decodes to 0x0

    feats = {r.doc_id: r.features for r in
             extract_features(media, dim=8).collect()}
    assert len(feats[1]) == 8
    assert abs(sum(feats[1]) - 1.0) < 1e-5   # normalized histogram
    assert feats[2] == [0.0] * 8
    # deterministic across runs
    again = {r.doc_id: r.features for r in
             extract_features(media, dim=8).collect()}
    assert again == feats


def test_corpus_funnel_monotone(spark, sf_dir):
    """clean_corpus stages only ever drop rows; funnel is monotone."""
    from myduckserver_spark.operators.pipeline import corpus_funnel
    from myduckserver_spark.tables import load_table

    rows = corpus_funnel(load_table(spark, sf_dir, "documents")).collect()
    assert rows, "funnel empty"
    for r in rows:
        assert r.n_raw >= r.n_quality >= r.n_exact >= r.n_clean >= 0
    total_raw = sum(r.n_raw for r in rows)
    total_clean = sum(r.n_clean for r in rows)
    assert 0 < total_clean <= total_raw


def test_duplicate_span_stats(spark):
    """Exact-substring span dedup (Lee et al. 2022 granularity): spans
    shared across >=2 docs count as duplicated; short docs are skipped;
    groups with no dups report 0."""
    from myduckserver_spark.operators.dedup import (
        duplicate_span_stats,
        span_hashes,
    )

    w = " ".join  # readable word-stream builder
    shared = w(f"s{i}" for i in range(20))  # one exact 20-word span
    rows = [
        (1, shared + " " + w(f"a{i}" for i in range(10)), "web"),
        (2, w(f"b{i}" for i in range(10)) + " " + shared, "web"),
        (3, w(f"c{i}" for i in range(40)), "books"),
        (4, "too short", "books"),  # < span_words: no spans at all
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING, source STRING")
    got = {
        r.source: (r.n_spans, r.n_dup_spans)
        for r in duplicate_span_stats(df, span_words=20, stride=10).collect()
    }
    # doc1: 30 words -> spans at 1, 11 (2); doc2: 30 words -> 2;
    # the span AT the shared text is position-aligned only where the
    # window lands exactly on it: doc1 span@1 == doc2 span@11
    assert got["web"][0] == 4 and got["web"][1] == 2
    assert got["books"] == (3, 0)
    # stride honored: span starts at 1, 11, 21 for a 40-word doc
    sp = span_hashes(
        df.filter("doc_id = 3"), span_words=20, stride=10
    ).count()
    assert sp == 3
