"""Suite checksum queries: one gate row per operator *family*.

The driver's correctness gate checks queries() entries in order and has
finite budget — round 1 checked exactly the first 50 of 152, leaving
102 operators without a hard correctness signal. A suite query fixes
that by folding N member queries into ONE gate-checkable result:

    (op STRING, n_rows BIGINT, fp BIGINT)   -- one row per member

where ``fp`` is an order-insensitive fingerprint of the member's full
result set, computed by BOTH engines with the same integer-only
algorithm, so the driver's hash compare transitively verifies every
member's rows:

    per row:   s  = concat_ws(0x1F, canonical(col) for col in sorted(cols))
               h  = first 10 hex digits of md5(s) as integer (40 bits)
    per query: fp = SUM(h)  (associative -> partition-order independent)

Canonical column forms are integer/string only (doubles scaled by 1e6
and rounded to BIGINT; timestamps as epoch micros) because float
formatting differs across engines while float *values* are bit-equal.
40-bit row hashes keep SUM far from BIGINT overflow (< 2^63 for up to
~8M rows) while making a silent per-row collision astronomically
unlikely across a whole suite.

The DuckDB side of each member is generated from the committed
``suite_kinds.json`` (scripts/gen_suite_kinds.py probes the oracle's
LIMIT-0 schema); the Spark side derives the same canonicalization from
the member DataFrame's schema at run time and refuses to run if the two
disagree — schema drift fails loudly in the sweep, not silently in the
driver.

Reference scope note: these suites gate the same §2 surface inventoried
in SURVEY.md; they add no new semantics of their own.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from myduckserver_spark.plans.registry import REGISTRY, register

_SEP = "\x1f"
_NULL = "∅"  # '∅' — cannot collide with any canonical value

with open(os.path.join(os.path.dirname(__file__), "suite_kinds.json")) as _f:
    _KINDS: dict[str, dict[str, str]] = json.load(_f)


# --------------------------------------------------------- Spark-side canon


def _spark_kind(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "dbl"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "ts"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.ArrayType):
        inner = _spark_kind(dt.elementType)
        mapped = {"int": "arrint", "dbl": "arrdbl", "str": "arrstr"}.get(inner)
        if mapped:
            return mapped
    raise ValueError(f"suite: unsupported output type {dt}")


def _canon_spark(name: str, kind: str):
    c = F.col(name)
    if kind == "int":
        e = c.cast("long").cast("string")
    elif kind == "dbl":
        e = F.round(c.cast("double") * 1000000).cast("long").cast("string")
    elif kind == "bool":
        e = c.cast("int").cast("string")
    elif kind == "ts":
        e = F.unix_micros(c.cast("timestamp")).cast("string")
    elif kind == "str":
        e = c
    elif kind == "bin":
        e = F.hex(c)
    elif kind == "arrint":
        e = F.array_join(
            F.transform(c, lambda x: x.cast("long").cast("string")), ",", _NULL
        )
    elif kind == "arrdbl":
        e = F.array_join(
            F.transform(
                c,
                lambda x: F.round(x.cast("double") * 1000000)
                .cast("long")
                .cast("string"),
            ),
            ",",
            _NULL,
        )
    elif kind == "arrstr":
        e = F.array_join(c, ",", _NULL)
    else:
        raise ValueError(f"suite: unknown kind {kind}")
    return F.coalesce(e, F.lit(_NULL))


def _member_summary(df: DataFrame, name: str) -> DataFrame:
    want = _KINDS[name]
    got = {f.name: _spark_kind(f.dataType) for f in df.schema.fields}
    if got != want:
        raise ValueError(
            f"suite member {name}: spark kinds {got} != oracle kinds {want} — "
            "rerun scripts/gen_suite_kinds.py or fix the query"
        )
    cols = sorted(want)
    s = F.concat_ws(_SEP, *[_canon_spark(c, want[c]) for c in cols])
    h = (
        F.conv(F.substring(F.md5(F.col("__s").cast("binary")), 1, 10), 16, 10)
        .cast("long")
    )
    return df.select(s.alias("__s")).select(h.alias("__h")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum("__h"), F.lit(0)).cast("long").alias("fp"),
    ).select(F.lit(name).alias("op"), "n_rows", "fp")


# -------------------------------------------------------- DuckDB-side canon


def _canon_duck(name: str, kind: str) -> str:
    c = f'"{name}"'
    if kind == "int":
        e = f"CAST(CAST({c} AS BIGINT) AS VARCHAR)"
    elif kind == "dbl":
        e = f"CAST(CAST(ROUND(CAST({c} AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)"
    elif kind == "bool":
        e = f"CAST(CAST({c} AS INT) AS VARCHAR)"
    elif kind == "ts":
        e = f"CAST(epoch_us(CAST({c} AS TIMESTAMP)) AS VARCHAR)"
    elif kind == "str":
        e = c
    elif kind == "bin":
        e = f"hex({c})"
    elif kind == "arrint":
        e = (
            f"array_to_string(list_transform({c}, x -> COALESCE(CAST(CAST(x AS "
            f"BIGINT) AS VARCHAR), '{_NULL}')), ',')"
        )
    elif kind == "arrdbl":
        e = (
            f"array_to_string(list_transform({c}, x -> COALESCE(CAST(CAST("
            f"ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR), "
            f"'{_NULL}')), ',')"
        )
    elif kind == "arrstr":
        e = (
            f"array_to_string(list_transform({c}, x -> COALESCE(x, '{_NULL}')), ',')"
        )
    else:
        raise ValueError(f"suite: unknown kind {kind}")
    return f"COALESCE({e}, '{_NULL}')"


def _member_oracle(name: str) -> str:
    oracle = REGISTRY[name].oracle
    kinds = _KINDS[name]
    cols = sorted(kinds)
    canon = ", ".join(_canon_duck(c, kinds[c]) for c in cols)
    return (
        f"SELECT '{name}' AS op, CAST(COUNT(*) AS BIGINT) AS n_rows,\n"
        f"       CAST(COALESCE(SUM(CAST(('0x' || substr(md5("
        f"concat_ws(chr(31), {canon})), 1, 10)) AS BIGINT)), 0) AS BIGINT) AS fp\n"
        f"FROM (\n{oracle}\n) __m_{name}"
    )


# ---------------------------------------------------------------- assembly


def _suite_spark(members: tuple[str, ...]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        parts = [
            _member_summary(REGISTRY[m].spark(spark, sf_dir), m) for m in members
        ]
        return reduce(DataFrame.unionAll, parts).orderBy("op")

    return fn


def _suite_oracle(members: tuple[str, ...]) -> str:
    body = "\nUNION ALL\n".join(_member_oracle(m) for m in members)
    return f"SELECT * FROM (\n{body}\n) ORDER BY op"


def register_suite(suite_name: str, members: tuple[str, ...], doc: str) -> None:
    for m in members:
        if m not in REGISTRY:
            raise KeyError(f"suite {suite_name}: unknown member {m}")
        if REGISTRY[m].oracle is None:
            raise ValueError(f"suite {suite_name}: member {m} has no oracle")
        if m not in _KINDS:
            raise KeyError(
                f"suite {suite_name}: {m} missing from suite_kinds.json — "
                "run scripts/gen_suite_kinds.py"
            )
    fn = _suite_spark(members)
    fn.__doc__ = doc
    register(suite_name, oracle=_suite_oracle(members), tags=("suite",))(fn)


# ------------------------------------------------------- suite definitions

SUITES: dict[str, tuple[str, ...]] = {
    # Remaining TPC-H shapes beyond the individually-gated core five.
    "suite_tpch_rest": (
        "q2_min_cost_supplier", "q4_order_priority", "q5_local_supplier_volume",
        "q7_nation_volume", "q8_market_share", "q9_product_profit",
        "q10_returned_items", "q11_important_stock", "q12_priority_lines",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_cnt",
        "q17_small_qty_revenue", "q19_disjunctive", "q20_promotion_suppliers",
        "q21_suppliers_kept_waiting", "q22_wealthy_inactive",
    ),
    # Window-function coverage beyond running-total frames.
    "suite_windows": (
        "w_top3_orders_per_customer", "w_rank_dense_ntile", "w_lead_lag",
        "w_range_frame_value", "w_first_last_value", "w_named_window",
        "w_distribution", "w_partition_only", "w_qualify_top2_per_region",
        "w_gap_fill_ignore_nulls", "w_groups_frame",
    ),
    # Scalar/aggregate function shims (string/math/case/stats/regex...).
    "suite_functions": (
        "f_string_suite", "f_string_suite2", "f_math_suite", "f_case_bucketing",
        "f_stats_suite", "f_percentile_exact", "f_bitwise", "f_try_cast",
        "f_regexp_extract", "f_struct_field", "f_median_mode", "f_regr_suite",
        "g_bool_aggs", "f_mysql_client_fns",
    ),
    # Date/JSON parse + nested-data coverage.
    "suite_dates_json": (
        "f_date_parse_roundtrip", "f_date_arith", "ev_json_multi_field",
        "ev_from_json_struct", "f_json_table_explode", "f_json_extract",
        "f_explode_words",
        "f_array_ops", "f_array_agg_sorted", "f_string_agg_ordered",
    ),
    # Set-op ALL variants, misc join shapes, VALUES, DISTINCT ON.
    "suite_setops_joins": (
        "s_intersect", "s_except", "s_union_by_name", "s_intersect_all",
        "s_except_all", "s_union_distinct", "v_values_join", "j_natural_star",
        "j_right_outer", "j_skew_salted", "c_distinct",
        "d_distinct_on_latest_order",
    ),
    # Grouping/aggregation extras + SQL-text shapes.
    "suite_grouping_misc": (
        "g_cube", "g_groupby_all", "g_conditional_pivot", "g_unpivot_status",
        "g_multi_distinct", "g_filter_clause", "g_grouping_flags",
        "g_max_by_extremes", "g_having_no_groupby", "c_case_in_groupby",
        "o_orderby_expression", "sq_scalar_above_avg_price",
        "sq_exists_in_select_list", "c_recursive_month_spine",
        "apx_ndv_by_flag",
    ),
    # Engine statement front door (CTAS/INSERT/REPLACE/IGNORE/ON
    # DUPLICATE/UPDATE/DELETE/defaults, DDL+information_schema,
    # PREPARE/EXECUTE) — each member drives real Engine.execute
    # statements and returns final table state.
    "suite_engine": (
        "eng_dml_lifecycle", "eng_upsert_semantics",
        "eng_ddl_catalog", "eng_prepared_exec",
        "eng_table_changes", "eng_partitioned_prune", "eng_vector_search",
        "eng_rowcap_dml", "cdc_condense", "eng_view_dml",
        "eng_on_dup_batch",
    ),
    # Event-stream analytics (batch twins of the streaming operators).
    "suite_events": (
        "ev_tumbling_hour", "ev_sessionize", "ev_session_window_bounds",
        "ev_hopping_hour", "ev_view_to_purchase_1h", "ev_funnel",
        "ev_retention", "ev_transition_matrix",
    ),
    # Text-analysis / corpus-statistics operators.
    "suite_text": (
        "tx_token_stats", "tx_langid_ngram", "tx_fingerprint",
        "tx_bpe_token_count", "tx_bigram_topk", "tx_length_profile",
        "tx_pii_redact", "tx_repetition_ratio", "tx_boilerplate_trigrams",
        "tx_common_token_ratio", "tx_keyword_search_tf", "tx_bm25_search",
        "tx_tfidf_top_terms", "tx_chunk_overlap", "tx_match_bm25_scalar",
        "tx_match_boolean",
    ),
    # Training-data pipeline: sampling, splits, packing, caps, dedup keep-best.
    "suite_training_data": (
        "tds_clean_corpus", "tds_stratified_sample", "tds_train_split",
        "tds_contamination", "tds_mixture_weights", "tds_token_budget",
        "tds_pack_sequences", "tds_domain_cap", "dd_keep_best",
        "dd_connected_components", "dd_ngram_jaccard", "samp_hash_bucket",
        "sem_classify_docs", "dd_span_dup_stats",
    ),
    # Embedding ops + multimodal plumbing.
    "suite_embeddings_mm": (
        "emb_kmeans_assign", "emb_quantize_int8", "emb_centroid_by_label",
        "sim_ivf_bucketed", "mm_frame_sample", "mm_byte_histogram",
        "mm_resize_geometry", "mm_audio_meta", "mm_video_meta",
        "emb_matryoshka",
        "sim_srp_lsh_buckets",
    ),
    # Postgres-dialect front door extras.
    "suite_pg_dialect": (
        "pg_distinct_on", "pg_string_agg_region", "pg_series_bucket_histogram",
        "pg_filter_lateral", "pg_sequence_lifecycle", "pg_any_array",
        "pg_within_group", "pg_tsearch_match", "pg_json_ops",
        "pg_upsert_conditional", "pg_dml_cte_move",
    ),
}


def register_all_suites() -> None:
    if "suite_tpch_rest" in REGISTRY:
        return
    for name, members in SUITES.items():
        register_suite(
            name,
            members,
            f"Checksum suite over {len(members)} member queries: "
            + ", ".join(members),
        )
