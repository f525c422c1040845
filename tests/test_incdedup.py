"""Incremental dedup against a persisted fingerprint/band store
(operators/incdedup.py): batch-2 duplicates of batch-1 docs are
dropped without rescanning batch 1, the store accumulates, and the
LSH geometry agrees with the batch-mode operator."""

import pytest

from myduckserver_spark.catalog import Catalog
from myduckserver_spark.operators.incdedup import (
    exact_incremental,
    minhash_incremental,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_incremental_across_batches(spark, cat):
    b1 = _docs(spark, [(1, "alpha beta"), (2, "gamma delta"),
                       (3, "alpha beta")])  # 3 dups 1 in-batch
    s1 = exact_incremental(cat, b1, store_name="fp_s")
    assert sorted(r.doc_id for r in s1.collect()) == [1, 2]
    # batch 2: one dup of batch 1, one fresh, one dup of a DROPPED doc
    b2 = _docs(spark, [(10, "alpha beta"), (11, "epsilon zeta")])
    s2 = exact_incremental(cat, b2, store_name="fp_s")
    assert sorted(r.doc_id for r in s2.collect()) == [11]
    # store holds all three distinct fingerprints now
    assert cat.table("fp_s").read().count() == 3


def test_exact_incremental_no_commit_leaves_store(spark, cat):
    b1 = _docs(spark, [(1, "one two")])
    exact_incremental(cat, b1, store_name="fp_nc")
    v = cat.table("fp_nc").version
    s = exact_incremental(
        cat, _docs(spark, [(2, "three four")]), store_name="fp_nc",
        commit=False,
    )
    assert s.count() == 1
    assert cat.table("fp_nc").version == v  # dry run: no store write


def test_minhash_incremental_near_dup_across_batches(spark, cat):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    near = base.replace("tonight", "today")  # near-dup, not exact
    far = ("completely different words about spark shuffles and "
           "partition pruning at terabyte scale with broadcast joins")
    s1 = minhash_incremental(
        cat, _docs(spark, [(1, base), (2, far)]), store_name="band_s"
    )
    assert sorted(r.doc_id for r in s1.collect()) == [1, 2]
    novel = ("entirely new material regarding medieval castle "
             "construction techniques masonry arches and moats")
    s2 = minhash_incremental(
        cat, _docs(spark, [(10, near), (11, novel)]), store_name="band_s"
    )
    ids = sorted(r.doc_id for r in s2.collect())
    assert 10 not in ids  # near-dup of batch-1 doc 1 → dropped
    assert 11 in ids


def test_minhash_incremental_in_batch_dup(spark, cat):
    t = ("many shared tokens in this quite long sentence that "
         "describes nothing in particular but repeats heavily")
    s = minhash_incremental(
        cat, _docs(spark, [(5, t), (6, t)]), store_name="band_b"
    )
    assert [r.doc_id for r in s.collect()] == [5]  # lowest id survives


def test_streaming_ingest_dedups_across_microbatches(spark, cat, tmp_path):
    """foreachBatch + incremental store: duplicates arriving in LATER
    micro-batches are dropped against fingerprints persisted by
    earlier ones — the streaming form of continuous corpus curation
    (state lives in the catalog store, not in memory)."""
    import os
    import time

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    b1 = _docs(spark, [(1, "stream alpha"), (2, "stream beta")])
    b2 = _docs(spark, [(3, "stream alpha"), (4, "stream gamma")])
    b1.write.parquet(os.path.join(src, "b1"))
    time.sleep(1.1)  # distinct mtimes → two file-source triggers
    b2.write.parquet(os.path.join(src, "b2"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src + "/*")
    )
    out = []

    def sink(batch_df, batch_id):
        kept = exact_incremental(cat, batch_df, store_name="fp_stream")
        out.extend(r.doc_id for r in kept.collect())

    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    assert sorted(out) == [1, 2, 4]  # doc 3 deduped against the store
    assert cat.table("fp_stream").read().count() == 3


def test_span_incremental(spark, tmp_path):
    """Incremental exact-substring dedup: a later batch's document
    whose spans mostly already exist in the store is dropped; fresh
    documents survive and extend the store."""
    from myduckserver_spark.catalog import Catalog
    from myduckserver_spark.operators.incdedup import span_incremental

    cat = Catalog(spark, str(tmp_path / "wh"))
    mk = lambda *rows: spark.createDataFrame(
        list(rows), "doc_id INT, text STRING"
    )
    w = lambda pfx, n: " ".join(f"{pfx}{i}" for i in range(n))
    b1 = mk((1, w("a", 40)), (2, w("b", 40)))
    s1 = span_incremental(cat, b1, span_words=20, stride=10)
    assert sorted(r.doc_id for r in s1.collect()) == [1, 2]
    # batch 2: doc 3 repeats doc 1's text verbatim (100% dup spans),
    # doc 4 shares nothing, doc 5 is sub-span-length (always survives)
    b2 = mk((3, w("a", 40)), (4, w("c", 40)), (5, "tiny doc"))
    s2 = span_incremental(cat, b2, span_words=20, stride=10)
    assert sorted(r.doc_id for r in s2.collect()) == [4, 5]
    # idempotent re-ingest: doc 4's spans are now stored
    s3 = span_incremental(cat, mk((6, w("c", 40))), span_words=20, stride=10)
    assert [r.doc_id for r in s3.collect()] == []
