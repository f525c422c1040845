"""Bucketed storage for co-located (shuffle-free) joins.

The reference's DuckDB storage keeps one ART-indexed file per table and
joins locally; on a cluster the analogous "data already lives where the
join needs it" property comes from bucketing: both sides hash-
partitioned into the same number of buckets on the join key AT WRITE
TIME, so a sort-merge join reads matching buckets pairwise with NO
exchange. This is the 100 TB answer for fact-to-fact joins that recur
on the same key (orders ⋈ lineitem): pay the shuffle once when
writing, never again per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-bucketed) table.

    Sorting within buckets lets sort-merge join skip its sort too —
    the join degenerates to a zipped merge scan.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; the planner elides both
    exchanges (verify with .explain(): no Exchange below SortMergeJoin).
    """
    on = [on] if isinstance(on, str) else on
    return spark.table(left_table).join(spark.table(right_table), on, how)
