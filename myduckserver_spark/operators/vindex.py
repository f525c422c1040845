"""Persisted IVF vector index: build / probe over catalog tables.

The reference materializes ART indexes inside DuckDB's storage
(catalog/table.go); the Spark-side analog for embedding columns is an
IVF structure persisted as two catalog tables:

    __vidx_<table>_<name>_centroids   (cid INT, vec ARRAY<DOUBLE>)
    __vidx_<table>_<name>_assign      (<pk>, cid INT)   -- sorted by cid

Build is deterministic Lloyd k-means (init = first nlist rows in PK
order, fixed iteration count). Search collects the tiny centroid table
to the driver, picks the nprobe nearest buckets for the query vector,
and scans ONLY those buckets: the assign table is written sorted by
cid, so parquet row-group min/max stats skip every other bucket on
disk — the same data-skipping story as OPTIMIZE/ZORDER (catalog.py).

Staleness contract: the index records the table version it was built
from; a search against a moved version raises (rebuild with REINDEX /
CREATE OR REPLACE). The reference's ART indexes are auto-maintained
inside DuckDB; explicit rebuild is the honest Spark-side equivalent —
auto-maintenance would hide a full shuffle inside every DML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from myduckserver_spark.operators.similarity import (
    _dot,
    _dvec,
    _norm,
    ivf_assign,
)


def build_ivf(
    df: DataFrame,
    pk_col: str,
    vec_col: str,
    nlist: int = 8,
    iters: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF build: returns (centroids, assignment).

    Init takes the first `nlist` rows in PK order (reprocessing-stable,
    no RNG — the same policy as every sampler in this repo); `iters`
    Lloyd rounds of assign → per-dimension mean. Empty clusters keep
    their previous centroid. Each round is one broadcast assign plus
    one (cid, dim) aggregation — no all-pairs anywhere.
    """
    base = df.select(pk_col, vec_col)
    # The init window ranks only the limit(nlist) rows — bounded by the
    # index config, never the data — so a single partition is correct;
    # the non-foldable constant partition key (globalrank's pid%1
    # trick) just declares that to WindowExec instead of tripping its
    # "No Partition Defined" serial-scan warning on every index build.
    w = W.partitionBy(F.expr(f"CAST({pk_col} AS BIGINT) % 1")).orderBy(
        pk_col
    )
    cent = (
        base.orderBy(pk_col)
        .limit(nlist)
        .withColumn("cid", F.row_number().over(w).cast("int") - 1)
        .select("cid", _dvec(F.col(vec_col)).alias("vec"))
    )
    for _ in range(iters):
        assign = ivf_assign(
            base, cent.select("cid", F.col("vec").alias(vec_col)),
            id_col=pk_col, vec_col=vec_col,
        )
        means = (
            assign.join(base, pk_col)
            .select("cid", F.posexplode(_dvec(F.col(vec_col))))
            .groupBy("cid", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("vec")
            )
        )
        # empty clusters keep the previous centroid
        cent = (
            cent.select("cid", F.col("vec").alias("__old"))
            .join(means, "cid", "left")
            .select(
                "cid", F.coalesce(F.col("vec"), F.col("__old")).alias("vec")
            )
        )
    # cent is nlist rows but its DAG is `iters` corpus-wide k-means
    # rounds — and the caller writes cent AND final_assign as two
    # separate snapshots, which would re-execute the whole k-means
    # chain for the second write. Pin the tiny result once so both
    # consumers (and final_assign below) read 8 rows, not the DAG.
    cent = cent.localCheckpoint(eager=True)
    final_assign = ivf_assign(
        base, cent.select("cid", F.col("vec").alias(vec_col)),
        id_col=pk_col, vec_col=vec_col,
    )
    # sorted by cid: parquet row-group stats make bucket scans skip
    # every other bucket (data-skipping, see module doc)
    return cent, final_assign.orderBy("cid", pk_col)


def probe_cids(centroids_rows: list, query_vec: list[float], nprobe: int):
    """Driver-side probe selection: nearest nprobe centroids by cosine
    (the centroid table is tiny by construction — nlist rows)."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    scored = []
    for r in centroids_rows:
        v = list(r["vec"])
        d = sum(a * b for a, b in zip(query_vec, v))
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        scored.append((d / (qn * n), -r["cid"]))
    scored.sort(reverse=True)
    return [-c for _, c in scored[:nprobe]]


def search(
    table_df: DataFrame,
    assign_df: DataFrame,
    pk_col: str,
    vec_col: str,
    query_vec: list[float],
    cids: list[int],
    k: int = 5,
) -> DataFrame:
    """Scan only the probed buckets and rank by cosine; the cid filter
    reaches the assign table's parquet scan (PushedFilters) and its
    row-group stats skip non-probed buckets on disk."""
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    hits = assign_df.filter(F.col("cid").isin([int(c) for c in cids]))
    cand = table_df.join(hits.select(pk_col), pk_col)
    dv = _dvec(F.col(vec_col))
    sim = F.round(
        _dot(dv, qlit) / (_norm(dv) * _norm(qlit)), 6
    )
    return (
        cand.select(pk_col, sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(pk_col))
        .limit(k)
    )
