"""Shared determinism helpers for oracle-matched queries.

Why DECIMAL internally: double summation is non-associative, and Spark's
partial aggregation order differs run-to-run and engine-to-engine.
Casting each row to DECIMAL(18,6) makes the sum exact and associative,
so Spark and DuckDB produce bit-identical results regardless of
partitioning. This is the Spark-side analog of the reference's
exact-decimal handling at the row seam (reference: backend/iter.go:125-133).

Why DOUBLE at the output seam: the correctness gate fetches Spark results
via Arrow/pandas (DECIMAL -> Python Decimal objects) and the DuckDB oracle
via pandas (DECIMAL -> float64), so a DECIMAL-typed *output* column can
never hash-match even when values are identical. Every final projection
therefore rounds the exact decimal to scale 2 and casts to DOUBLE.
Rounding first keeps the conversion exact: after ROUND(x, 2) the unscaled
value is |x|*100 < 2^53 for any realistic aggregate, so decimal->double is
a single correctly-rounded IEEE operation in both engines (DuckDB divides
the exact integer by a power of ten; Java BigDecimal.doubleValue does the
same) — bit-identical on both sides. Spark ROUND and DuckDB ROUND both
round half away from zero on decimals, so the rounding itself agrees too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC_IN = "decimal(18,6)"
DEC_OUT = "decimal(38,6)"


def dec(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(DEC_IN)


def dout(c: Column) -> Column:
    """Canonical hash-stable output for an exact-decimal expression."""
    return F.round(c, 2).cast("double")


def dsum(c: Column | str, alias: str) -> Column:
    """Exact decimal sum, emitted as canonical DOUBLE (see module doc)."""
    return dout(F.sum(dec(c))).alias(alias)


def davg(c: Column | str, alias: str) -> Column:
    """Deterministic double average: exact decimal sum rounded to an
    exactly-convertible scale, one exact cast, one IEEE divide."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.round(F.sum(dec(c)), 3).cast("double") / F.count(F.lit(1))).alias(alias)


def bcount(alias: str) -> Column:
    return F.count(F.lit(1)).cast("long").alias(alias)


def ts_micros(c: Column | str) -> Column:
    """Epoch microseconds that accepts both TIMESTAMP and TIMESTAMP_NTZ.

    Parquet files without timezone annotation read as TIMESTAMP_NTZ on
    Spark 4, which `unix_micros` rejects. With the session pinned to UTC
    (session.py) the cast to TIMESTAMP is numerically a no-op, so this is
    safe for either input type.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))


# Oracle-side (DuckDB SQL) equivalents — keep textually parallel.
def o_dout(expr: str) -> str:
    return f"CAST(ROUND({expr}, 2) AS DOUBLE)"


def o_dsum(expr: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), 2) AS DOUBLE) AS {alias}"
    )


def o_davg(expr: str, alias: str) -> str:
    return (
        f"(CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), 3) AS DOUBLE)"
        f" / COUNT(*)) AS {alias}"
    )


def o_bcount(alias: str) -> str:
    return f"CAST(COUNT(*) AS BIGINT) AS {alias}"


def ordered_bounded(df, *cols):
    """Presentation sort for a result whose cardinality is BOUNDED by
    the query itself (group-by over low-cardinality keys: return flags,
    nations, histogram buckets) — not proportional to input size.

    A plain ``orderBy`` plans Exchange rangepartitioning, which runs a
    separate range-bounds sampling job per execution (~0.1 s of fixed
    latency locally; one extra stage on a cluster). For a bounded
    output, ``coalesce(1)`` narrow-deps the aggregate's few output
    partitions into one and sorts within it: same ordered result, no
    sampling job, no exchange. This is exactly the shape AQE's
    partition coalescing converges to for a tiny final sort — made
    static here because bounded cardinality is knowable at plan time.

    Use ONLY when the row count is bounded at any data scale; results
    proportional to input (per-document scores, per-customer top-k)
    must keep the distributed ``orderBy``.

    The bounded contract is enforceable: with MDS_ASSERT_BOUNDED set
    (the oracle sweep sets it), the result is counted and a result
    over the bound fails loudly — a misuse on a proportional result
    would otherwise silently serialize the final stage at scale.
    """
    import os

    from pyspark.sql import Column

    exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
    assert all(isinstance(c, Column) for c in exprs)
    out = df.coalesce(1).sortWithinPartitions(*exprs)
    bound = os.environ.get("MDS_ASSERT_BOUNDED")
    if bound:
        n = out.count()
        assert n <= int(bound), (
            f"ordered_bounded misuse: {n} rows exceeds the bounded-"
            f"cardinality contract ({bound}); use ordered_adaptive"
        )
    return out


# ------------------------------------------------------------ fixed point
#
# The decimal path above is exact but slow in Spark's hot loop: a sum
# buffer of DECIMAL(28,6) exceeds the 18-digit compact range, so every
# row pays a Java BigDecimal deserialize/add/serialize in the UnsafeRow
# aggregate buffer (measured: ~245 ms of q1's 460 ms at sf0.1 — DuckDB
# does the same sums on int128 in hardware). The fixed-point helpers
# below compute the SAME exact values on int64:
#
#   per row   : sl6(x) = the exact int64 image of CAST(x AS DECIMAL(18,6))
#               (pure double multiply+add+truncate — whole-stage codegen,
#               no BigDecimal)
#   partial   : SUM(long) — wraps only if a single partition's group sum
#               exceeds 9.2e18/1e6 ≈ 9.2e12 in value, impossible for
#               128 MB partitions of money-scale values
#   final     : the cross-partition merge runs in DECIMAL(38,0) — exact
#               and overflow-graceful at ANY total, but touches only
#               n_partitions × n_groups rows, so BigDecimal cost is nil
#
# Two regimes: `fp_sum` (single-level) when the GROUP SIZE is bounded by
# the schema (per-order, per-customer aggregates — a group never exceeds
# ~1e4 rows at any SF, so the long sum can't overflow); `fp_groupby`
# (two-level with a partition-id pre-aggregate) when groups grow with
# the data (per-flag, global) and only the tiny final merge may exceed
# int64. Rounding: sl6 rounds half-up (toward +inf), identical to both
# engines' double→decimal cast for non-negative inputs; every summed
# measure in this repo is non-negative.

SL_FACTOR = 1_000_000  # the DECIMAL(18,6) value grid


def sl6(c: Column | str) -> Column:
    """Exact int64 image of CAST(c AS DECIMAL(18,6)): floor(x*1e6+0.5).
    Exact for 0 <= x < ~9e9 (x*1e6+0.5 stays under 2^53)."""
    c = F.col(c) if isinstance(c, str) else c
    return (c * SL_FACTOR + F.lit(0.5)).cast("long")


def sl_val(c: Column) -> Column:
    """Scaled-long (or its decimal image) -> exact DECIMAL(38,6) value.
    Use on FINAL aggregated rows only (decimal division per row)."""
    return c.cast("decimal(38,0)") / F.lit(SL_FACTOR).cast("decimal(7,0)")


def fp_sum(c: Column | str, alias: str) -> Column:
    """Drop-in for `dsum` when the group size is schema-bounded (per-
    order, per-customer): exact fixed-point sum emitted as canonical
    rounded DOUBLE. Value-identical to SUM(CAST(c AS DECIMAL(18,6)))."""
    return dout(sl_val(F.sum(sl6(c)))).alias(alias)


def fp_groupby(df, keys, sums=(), avgs=(), counts=()):
    """Exact fixed-point aggregation for groups that GROW with the data
    (q1's return-flag groups, global sums): long partial sums per input
    partition, decimal merge across partitions.

    keys: group column names; sums/avgs: (alias, column-name-or-SQL-
    expression-string) pairs; counts: aliases for COUNT(*). Output
    columns: keys, then sums (dsum-canonical 2-dp DOUBLE), avgs (davg
    semantics), counts (BIGINT) — value-identical to the decimal
    helpers above. Expressions are SQL strings (not Column trees) so
    the whole four-step plan builds in a handful of Py4J round-trips:
    a Column-object formulation measured ~150 driver round-trips
    (~0.1 s of pure plan-build latency per query).
    """
    sums, avgs, counts = list(sums), list(avgs), list(counts)
    scaled = sums + avgs
    proj = df.selectExpr(
        "SPARK_PARTITION_ID() AS __fp_pid",
        *keys,
        *[
            f"CAST(({e}) * {SL_FACTOR}.0 + 0.5 AS BIGINT) AS __fp_{a}"
            for a, e in scaled
        ],
    )
    part = proj.groupBy("__fp_pid", *keys).agg(
        F.expr("COUNT(1) AS __fp_n"),
        *[F.expr(f"SUM(__fp_{a}) AS __fp_{a}") for a, _ in scaled],
    )
    # coalesce(1): the per-(partition, group) partials are tiny
    # (n_partitions x n_groups rows), and SinglePartition satisfies the
    # final groupBy's required distribution, so the decimal merge runs
    # in the SAME stage as the first aggregation's reduce — no second
    # exchange, no extra stage. One merge task handling n_partitions x
    # n_groups short rows is negligible even at 100 TB for the
    # low-cardinality keys this helper is for (grows-with-data groups
    # with high-cardinality KEYS belong in fp_sum's bounded regime
    # instead).
    fin = part.coalesce(1).groupBy(*keys).agg(
        F.expr("CAST(COALESCE(SUM(__fp_n), 0) AS BIGINT) AS __fp_n"),
        *[
            F.expr(f"SUM(CAST(__fp_{a} AS DECIMAL(38,0))) AS __fp_{a}")
            for a, _ in scaled
        ],
    )
    val = (
        "(CAST(__fp_{a} AS DECIMAL(38,0)) / CAST({f} AS DECIMAL(7,0)))"
    ).format
    out = list(keys)
    out += [
        f"CAST(ROUND({val(a=a, f=SL_FACTOR)}, 2) AS DOUBLE) AS {a}"
        for a, _ in sums
    ]
    out += [
        f"(CAST(ROUND({val(a=a, f=SL_FACTOR)}, 3) AS DOUBLE) / __fp_n) AS {a}"
        for a, _ in avgs
    ]
    out += [f"__fp_n AS {a}" for a in counts]
    return fin.selectExpr(*out)


def hint_small(*aliases: str) -> str:
    """SQL-text twin of `build_small`: a profile-gated BROADCAST hint
    comment for generated-SQL builds. Empty at cluster scale (AQE owns
    build-side selection from runtime statistics); under the measured
    small-working-set profile it pins the named aliases as build sides
    exactly like build_small does for DataFrame builds."""
    from myduckserver_spark.tables import serving_small

    return (f"/*+ BROADCAST({', '.join(aliases)}) */ "
            if serving_small() else "")


def build_small(df):
    """Mark `df` as the intended hash-BUILD side of a fact join.

    Under the measured small-working-set serving profile
    (tables.serving_profile — AQE off, static planning) this attaches
    an explicit broadcast hint: the static planner's size estimates
    for DERIVED inputs (joins, filtered scans, aggregates) are
    unreliable and were observed to pick the data-proportional fact
    side as the build — e.g. broadcasting a 64 MiB, 600k-row lineitem
    scan per execution (q5, ~0.4 s/run of pure hash-build cost).

    At cluster scale the profile keeps AQE on and this is a no-op:
    runtime statistics pick the build side, so a data-proportional
    input is never statically pinned — the same static-for-small /
    dynamic-for-large split serving_profile applies everywhere else.
    Statistics-driven, not a hardcoded shape.
    """
    from myduckserver_spark.tables import serving_small

    return F.broadcast(df) if serving_small() else df


def ordered_adaptive(df, *cols):
    """Presentation sort for results PROPORTIONAL to the input (dedup
    survivors, per-document scores, per-user rollups) — unlike
    `ordered_bounded`, the cardinality is not schema-bounded, so the
    safe cluster plan is a distributed range sort (with its per-run
    range-bounds sampling job). When the serving profile has measured a
    small working set (tables.serving_profile), the whole result fits
    one task trivially and the coalesce(1) sort skips the sampling job
    — the same static-for-small / dynamic-for-large split the profile
    already applies to AQE. Statistics-driven, not a hardcoded shape:
    a 100 TB session never takes the single-task branch.
    """
    from myduckserver_spark.tables import serving_small

    if serving_small():
        # repartition(1), NOT coalesce(1): coalesce back-propagates and
        # would serialize the whole upstream compute stage (a window or
        # map pipeline) into one task; the round-robin exchange keeps
        # the compute wide and only the final small sort is single-task.
        exprs = [F.col(c) if isinstance(c, str) else c for c in cols]
        return df.repartition(1).sortWithinPartitions(*exprs)
    return df.orderBy(*cols)


# SQL-text twins of the fixed-point helpers (single-Py4J-call builds).
def sl6_sql(expr: str) -> str:
    return f"CAST(({expr}) * {SL_FACTOR}.0 + 0.5 AS BIGINT)"


def sl_val_sql(expr: str) -> str:
    return (
        f"(CAST({expr} AS DECIMAL(38,0)) / CAST({SL_FACTOR} AS DECIMAL(7,0)))"
    )


def fp_sum_sql(expr: str, alias: str) -> str:
    """SQL-text twin of fp_sum (bounded-group exact fixed-point sum)."""
    return (
        f"CAST(ROUND({sl_val_sql(f'SUM({sl6_sql(expr)})')}, 2) AS DOUBLE)"
        f" AS {alias}"
    )


def fp_groupby_sql(view, keys, sums=(), avgs=(), counts=(), where=""):
    """SQL-text twin of `fp_groupby`: the identical four-step exact
    fixed-point plan (scaled-long project → per-(input-partition, group)
    long partials → decimal merge → canonical DOUBLE emit) rendered as
    ONE SQL string over a registered view. Same physical plan, but the
    build is a single spark.sql() round-trip instead of ~25 Py4J calls
    with per-call JVM expression parsing (measured on q1 at sf0.1:
    218 ms → 171 ms end-to-end, value-identical result). This is the
    reference's own serving architecture — generate SQL text, let the
    engine plan it (transpiler/translate.go:102) — pointed at Catalyst.

    The coalesce(1)-in-same-stage merge trick from fp_groupby is not
    SQL-expressible, so the merge here is a regular tiny shuffle on the
    group keys: n_input_partitions × n_groups short rows, negligible at
    any scale for the bounded-cardinality keys this helper targets.
    """
    sums, avgs, counts = list(sums), list(avgs), list(counts)
    scaled = sums + avgs
    kl = ", ".join(keys)
    kpfx = f"{kl}, " if keys else ""
    proj = ", ".join(
        f"{sl6_sql(e)} AS __fp_{a}" for a, e in scaled
    )
    part_aggs = ", ".join(
        f"SUM(__fp_{a}) AS __fp_{a}" for a, _ in scaled
    )
    fin_aggs = ", ".join(
        f"SUM(CAST(__fp_{a} AS DECIMAL(38,0))) AS __fp_{a}" for a, _ in scaled
    )
    out = list(keys)
    out += [
        f"CAST(ROUND({sl_val_sql(f'__fp_{a}')}, 2) AS DOUBLE) AS {a}"
        for a, _ in sums
    ]
    out += [
        f"(CAST(ROUND({sl_val_sql(f'__fp_{a}')}, 3) AS DOUBLE) / __fp_n)"
        f" AS {a}"
        for a, _ in avgs
    ]
    out += [f"__fp_n AS {a}" for a in counts]
    where_sql = f"WHERE {where}" if where else ""
    fin_group = f"GROUP BY {kl}" if keys else ""
    return f"""
    SELECT {", ".join(out)}
    FROM (
      SELECT {kpfx}CAST(COALESCE(SUM(__fp_pn), 0) AS BIGINT) AS __fp_n,
             {fin_aggs}
      FROM (
        SELECT __fp_pid, {kpfx}COUNT(1) AS __fp_pn, {part_aggs}
        FROM (
          SELECT SPARK_PARTITION_ID() AS __fp_pid, {kpfx}{proj}
          FROM {view} {where_sql}
        ) __fp_proj
        GROUP BY {kpfx}__fp_pid
      ) __fp_part
      {fin_group}
    ) __fp_fin
    """
