"""Banded range (interval) join.

Matches left and right rows with the same key whose timestamps fall
within a window: right_ts ∈ [left_ts + lower, left_ts + upper].
DuckDB executes this with its IEJoin/range-join operator on the
Postgres surface; Spark's only native plan for the naive encoding
(equi-join on key + range filter) pairs EVERY same-key row before
filtering — O(L·R) per key.

The scale strategy is band bucketing: quantize time into cells of
width = (upper - lower). A right row at t can only match left rows in
its own or the adjacent cell, so emitting each LEFT row into the 2
(or ceil(span/width)+1) cells it can see and joining on
(key, cell) bounds every comparison to a band. Shuffle keys carry the
cell, so hot keys also spread across ~time-range/width reducers —
band bucketing is simultaneously the skew treatment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myduckserver_spark.plans.helpers import ts_micros


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    how: str = "inner",
) -> DataFrame:
    """Pairs (l, r) with equal `by` keys and
    r.right_ts in [l.left_ts + lower_s, l.left_ts + upper_s] (seconds).

    Returns left columns + right columns (right ts column suffixed
    `_r` if the name collides). Inner join only pairs; use the result
    for counting/aggregating matched pairs.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must be > lower_s")
    if how != "inner":
        raise ValueError("only inner interval joins are supported")
    by = [by] if isinstance(by, str) else list(by)
    width = upper_s - lower_s

    l_sec = ts_micros(F.col(left_ts)) / 1_000_000.0
    r_sec = ts_micros(F.col(right_ts)) / 1_000_000.0

    # Each left row's admissible right window is exactly `width` wide,
    # so it overlaps at most 2 cells of size `width`: the cell of its
    # window start and the next. Duplicate LEFT rows into both cells;
    # right rows stay single. (Duplicating the smaller-cardinality
    # side is the standard cost choice; swap roles upstream if needed.)
    win_start_cell = F.floor((l_sec + lower_s) / width)
    l2 = left.withColumn(
        "__cell", F.explode(F.array(win_start_cell, win_start_cell + 1))
    )
    r2 = right.withColumn("__cell", F.floor(r_sec / width))
    rcols = [
        F.col(c).alias(c + "_r")
        if (c in left.columns and c not in by)
        else F.col(c)
        for c in right.columns
    ]
    r2 = r2.select(*rcols, "__cell")
    rts = right_ts + "_r" if right_ts in left.columns else right_ts

    r_sec_out = ts_micros(F.col(rts)) / 1_000_000.0
    cond = (
        (r_sec_out >= l_sec + lower_s)
        & (r_sec_out <= l_sec + upper_s)
    )
    # No pair can match twice: the right row lives in exactly ONE cell,
    # and the join requires the duplicated left row to land in it.
    return l2.join(r2, by + ["__cell"], "inner").filter(cond).drop("__cell")
