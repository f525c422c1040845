"""Persisted IVF vector index (operators/vindex.py + CREATE VECTOR
INDEX front door): build determinism, probe-limited search, recall vs
the exact brute force, staleness contract, DROP cleanup."""

import os

import pytest
from pyspark.sql import functions as F

from myduckserver_spark.engine import Engine, OkResult
from myduckserver_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def veng(spark, sf_dir, tmp_path_factory):
    e = Engine(spark, str(tmp_path_factory.mktemp("vwh")))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    e.catalog.create_table("vecs", emb)
    meta = e.table_meta("vecs")
    meta.primary_key = ["vec_id"]
    e._save_meta("vecs", meta)
    r = e.execute(
        "CREATE VECTOR INDEX emb_idx ON vecs (embedding) WITH (nlist = 8)"
    )
    assert isinstance(r, OkResult)
    return e, emb


def _query_vec(emb, vid):
    return list(emb.filter(F.col("vec_id") == vid).collect()[0].embedding)


def test_full_probe_matches_bruteforce(veng):
    e, emb = veng
    q = _query_vec(emb, 7)
    got = [
        r.vec_id
        for r in e.vector_search("vecs", "emb_idx", q, k=5, nprobe=8)
        .collect()
    ]
    queries = emb.filter(F.col("vec_id") == 7)
    want = [
        r.vec_id
        for r in cosine_topk(emb, queries, k=6).orderBy("rk").collect()
    ]
    # brute force excludes self (qid != id); index search includes the
    # vector itself as its own best match — drop it before comparing.
    assert got[0] == 7
    assert got[1:5] == want[:4]


def test_probe_limits_scanned_buckets(veng):
    e, emb = veng
    q = _query_vec(emb, 7)
    df = e.vector_search("vecs", "emb_idx", q, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "cid" in plan and "PushedFilters" in plan  # filter reaches scan
    hits = df.collect()
    assert len(hits) == 5 and hits[0].vec_id == 7  # self is in its bucket


def test_recall_at_nprobe2(veng):
    e, emb = veng
    qids = [3, 11, 42, 99, 123]
    recalls = []
    for qid in qids:
        q = _query_vec(emb, qid)
        ann = {
            r.vec_id
            for r in e.vector_search("vecs", "emb_idx", q, k=6, nprobe=2)
            .collect()
        } - {qid}
        queries = emb.filter(F.col("vec_id") == qid)
        exact = {
            r.vec_id for r in cosine_topk(emb, queries, k=5).collect()
        }
        recalls.append(len(ann & exact) / 5)
    # near-orthogonal synthetic vectors are ANN's worst case; probing
    # 2/8 buckets must still beat the 25%-of-corpus random floor
    assert sum(recalls) / len(recalls) >= 0.3


def test_stale_index_reconciles_incrementally(veng, spark):
    """DML past the build version is absorbed by a diff-bounded
    reconcile (table_changes → reassign touched rows), not a rebuild:
    an inserted vector becomes findable, a deleted one vanishes."""
    e, emb = veng
    q = _query_vec(emb, 7)
    # insert an exact copy of vector 7 under a new id
    new_row = emb.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        "embedding",
        "label",
    )
    t = e.catalog.table("vecs")
    t.overwrite(t.read().unionByName(new_row))
    hits = e.vector_search("vecs", "emb_idx", q, k=3, nprobe=8).collect()
    ids = [r.vec_id for r in hits]
    assert 100007 in ids and 7 in ids  # the clone ties with the original
    assert e.table_meta("vecs").indexes["emb_idx"][
        "table_version"
    ] == e.catalog.table("vecs").version
    # delete the clone: next search reconciles it away
    t = e.catalog.table("vecs")
    t.overwrite(t.read().filter(F.col("vec_id") != 100007))
    ids2 = [
        r.vec_id
        for r in e.vector_search("vecs", "emb_idx", q, k=3, nprobe=8)
        .collect()
    ]
    assert 100007 not in ids2 and 7 in ids2
    # explicit rebuild still works
    e.execute(
        "CREATE OR REPLACE VECTOR INDEX emb_idx ON vecs (embedding) "
        "WITH (nlist = 8)"
    )
    assert len(e.vector_search("vecs", "emb_idx", q, k=3).collect()) == 3


def test_show_indexes_and_drop_cleanup(veng):
    e, _ = veng
    shown = e.execute("SHOW INDEXES FROM vecs").collect()
    assert any("emb_idx" in str(r) for r in shown)
    assert "__vidx_vecs_emb_idx_centroids" in e.catalog.list_tables()
    e.execute("DROP INDEX emb_idx ON vecs")
    assert "__vidx_vecs_emb_idx_centroids" not in e.catalog.list_tables()
    assert "__vidx_vecs_emb_idx_assign" not in e.catalog.list_tables()
    with pytest.raises(ValueError, match="no vector index"):
        e.vector_search("vecs", "emb_idx", [0.0] * 64)


def test_vector_search_sql_front_door(veng):
    e, emb = veng
    # the drop-cleanup test above removed the index; rebuild it
    e.execute(
        "CREATE OR REPLACE VECTOR INDEX emb_idx ON vecs (embedding) "
        "WITH (nlist = 8)"
    )
    q = _query_vec(emb, 7)
    arr = ", ".join(str(float(x)) for x in q)
    rows = e.sql(
        f"SELECT vec_id, sim FROM VECTOR_SEARCH('vecs', 'emb_idx', "
        f"ARRAY[{arr}], 5, 8) ORDER BY sim DESC, vec_id"
    ).collect()
    assert len(rows) == 5
    assert rows[0].vec_id in (7, 100007)  # self (or its clone) ranks first


def test_drift_flags_stale_and_optimize_retrains(spark, tmp_path_factory):
    """Centroid-drift trigger: a reconciled batch that reassigns most
    updated rows flips stale_centroids; the next OPTIMIZE retrains
    (full deterministic k-means), clears the flag, and restores
    probe-1 recall vs brute force."""
    e = Engine(spark, str(tmp_path_factory.mktemp("vdrift")))
    # two tight 2-D clusters; ids interleaved so the deterministic
    # init (first nlist rows in pk order) seeds one centroid in each
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, [10.0 + (i % 5) * 0.01, 0.0], "a"))
        else:
            rows.append((i, [0.0, 10.0 + (i % 5) * 0.01], "b"))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    e.catalog.create_table("vecs", emb)
    meta = e.table_meta("vecs")
    meta.primary_key = ["vec_id"]
    e._save_meta("vecs", meta)
    e.execute("CREATE VECTOR INDEX emb_idx ON vecs (embedding) "
              "WITH (nlist = 2)")

    # heavy drift: every even id moves to a NEW location [-10, 0] —
    # nearer the other centroid, so the reconcile reassigns all 20
    t = e.catalog.table("vecs")
    moved = t.read().selectExpr(
        "vec_id",
        "CASE WHEN vec_id % 2 = 0 THEN array(-10.0D, 0.0D) "
        "ELSE embedding END AS embedding",
        "label",
    )
    t.overwrite(moved)
    q = [-10.0, 0.0]
    e.vector_search("vecs", "emb_idx", q, k=5, nprobe=2).collect()
    props = e.table_meta("vecs").indexes["emb_idx"]
    assert props.get("stale_centroids") is True
    assert props["drift_seen"] >= 20
    assert props["drift_moved"] / props["drift_seen"] >= 0.5

    # OPTIMIZE retrains, clears the flag and counters
    r = e.execute("OPTIMIZE TABLE vecs")
    assert "retrained vector indexes: emb_idx" in r.info
    props = e.table_meta("vecs").indexes["emb_idx"]
    assert props.get("stale_centroids") is False
    assert props["drift_seen"] == 0 and props["drift_moved"] == 0

    # recall restored at nprobe=1: the single nearest bucket holds the
    # drifted cluster, and top-k matches exact brute force
    qdf = spark.createDataFrame([(999, q)],
                                "vec_id long, embedding array<double>")
    want = [r.vec_id for r in
            cosine_topk(t.read(), qdf, k=5).orderBy("rk").collect()]
    got = [r.vec_id for r in
           e.vector_search("vecs", "emb_idx", q, k=5, nprobe=1).collect()]
    assert set(got) == set(want)
    # buckets balanced again after retrain (20/20, not 40/0)
    sizes = sorted(
        r.n for r in e.catalog.table("__vidx_vecs_emb_idx_assign").read()
        .groupBy("cid").count().withColumnRenamed("count", "n").collect()
    )
    assert sizes == [20, 20]


def test_sql_first_vector_workflow(spark, tmp_path):
    """Array column types in DDL (pg elem[], ARRAY<elem>, pgvector
    VECTOR(n)) enable the pure-SQL vector path: CREATE TABLE with an
    embedding column -> INSERT array literals (cast to the declared
    element type) -> CREATE VECTOR INDEX -> VECTOR_SEARCH, no
    DataFrame API needed (probe battery round 9)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE emb (id INT PRIMARY KEY, v FLOAT[])")
    e.execute("INSERT INTO emb VALUES (1, array(0.1, 0.2)), "
              "(2, array(0.9, 0.8)), (3, array(0.2, 0.1))")
    e.execute("CREATE VECTOR INDEX vi ON emb (v) WITH (nlist=1)")
    rows = e.execute(
        "SELECT id, sim FROM VECTOR_SEARCH('emb', 'vi', "
        "ARRAY[0.1, 0.2], 2, 1) ORDER BY sim DESC"
    ).collect()
    assert rows[0].id == 1 and rows[0].sim == 1.0 and len(rows) == 2
    e.execute("CREATE TABLE emb2 (id INT PRIMARY KEY, v VECTOR(2))")
    e.execute("CREATE TABLE emb3 (id INT PRIMARY KEY, w ARRAY<DOUBLE>)")
    e.execute("INSERT INTO emb3 VALUES (1, array(1.5, 2.5))")
    assert e.execute("SELECT w FROM emb3").collect()[0].w == [1.5, 2.5]


def test_build_ivf_pins_centroids_once(spark, sf_dir):
    """build_ivf materializes the k-means result: the returned
    centroid frame is a pinned scan (no Aggregate in its plan), so the
    caller's two snapshot writes (centroids, assignment) cannot
    re-execute the iterative corpus-wide k-means chain."""
    from myduckserver_spark.operators.vindex import build_ivf

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    cent, assign = build_ivf(emb, "vec_id", "embedding", nlist=4, iters=2)
    cent_plan = cent._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in cent_plan and "Join" not in cent_plan
    assert cent.count() == 4
    # the assignment still assigns every corpus row to a built centroid
    n = emb.count()
    assert assign.count() == n
    cids = {r.cid for r in cent.select("cid").collect()}
    assert {r.cid for r in assign.select("cid").distinct().collect()} <= cids
