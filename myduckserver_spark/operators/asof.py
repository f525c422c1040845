"""As-of (backward) join — the temporal join the reference's users run
via DuckDB's ASOF JOIN on the Postgres surface (full DuckDB SQL
passthrough; see SURVEY.md §2 note on pg passthrough operators).

Spark has no ASOF JOIN operator, so the naive encoding is
equi-join(by) + range filter + aggregate. That materializes every
(left, earlier-right) pair before reducing — O(L·R) per key, which
detonates on active keys at 100 TB. This operator instead merges both
sides into one keyed stream and carries the latest right value forward
with a running window:

    union → shuffle once on `by` → sort by (ts, side) → last(ignorenulls)

O((L+R) log(L+R)) per key, one shuffle, no pair blowup — the same
merge-scan plan a native ASOF JOIN executes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    allow_exact_match: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    `right_ts` <= `left_ts` (or < when allow_exact_match=False) within
    the same `by` group.

    Returns all left columns plus `<right_ts><suffix>` and
    `<c><suffix>` for each requested right value column; NULL when no
    earlier right row exists.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or []

    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r2 = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            *by,
            F.col(right_ts).alias("__ts"),
            F.lit(0 if allow_exact_match else 1).alias("__side"),
            payload.alias("__payload"),
        )
    )
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1 if allow_exact_match else 0).alias("__side"),
        F.lit(None).cast(r2.schema["__payload"].dataType).alias("__payload"),
    )
    merged = l2.unionByName(r2, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts iff exact matches
    # count. One shuffle: the window partitions on `by` only.
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The window MUST be computed before the side filter (a window
    # column built after .filter() would only ever see left rows).
    with_match = merged.withColumn(
        "__matched", F.last("__payload", ignorenulls=True).over(w)
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols.append(
        F.col("__matched").getField(right_ts).alias(right_ts + suffix)
    )
    for c in value_cols:
        out_cols.append(F.col("__matched").getField(c).alias(c + suffix))
    # NULL left ts needs no special case: NULLS FIRST ordering means
    # such rows see no right payload, mirroring `right_ts <= NULL`.
    out = with_match.filter(F.col("__side") == (1 if allow_exact_match else 0))
    return out.select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    allow_exact_match: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the SMALLEST
    `right_ts` >= `left_ts` (or > when allow_exact_match=False) within
    the same `by` group — the mirror of asof_join_backward, carrying
    the NEXT right value backward with a forward-looking window.

    Same scale story: union → one shuffle on `by` → sort → first()
    over [current, unbounded following]; O((L+R) log(L+R)) per key.
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or []

    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r2 = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            *by,
            F.col(right_ts).alias("__ts"),
            # exact matches count -> right at equal ts sorts AFTER the
            # left row, inside its [current, following) window; exact
            # excluded -> right sorts before and falls out of it.
            F.lit(1 if allow_exact_match else 0).alias("__side"),
            payload.alias("__payload"),
        )
    )
    l2 = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(0 if allow_exact_match else 1).alias("__side"),
        F.lit(None).cast(r2.schema["__payload"].dataType).alias("__payload"),
    )
    merged = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    with_match = merged.withColumn(
        "__matched",
        # NULL left ts matches nothing (`NULL <= right_ts` is never
        # true); NULLS FIRST would otherwise hand it the whole stream.
        F.when(
            F.col("__ts").isNotNull(),
            F.first("__payload", ignorenulls=True).over(w),
        ),
    )
    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols.append(
        F.col("__matched").getField(right_ts).alias(right_ts + suffix)
    )
    for c in value_cols:
        out_cols.append(F.col("__matched").getField(c).alias(c + suffix))
    out = with_match.filter(
        F.col("__side") == (0 if allow_exact_match else 1)
    )
    return out.select(*out_cols)
