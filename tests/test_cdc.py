"""CDC condense/apply semantics — the FIXTURES.md §5 scenario matrix
(reference delta/controller.go:150-190, 654-697 behavior)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from myduckserver_spark.catalog import Catalog
from myduckserver_spark.operators.cdc import (
    ACTION_DELETE,
    ACTION_INSERT,
    ACTION_UPDATE,
    apply_cdc,
    condense,
)

DELTA_COLS = "pk1 int, pk2 string, v double, ts string, action tinyint, " \
    "txn_tag string, txn_server binary, txn_group string, txn_seq long, txn_stmt long"


def _delta_row(pk1, pk2, v, action, seq, stmt=0, group="b1"):
    return (pk1, pk2, v, "2024-01-01", action, "", b"", group, seq, stmt)


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "2023-01-01"),
            (2, "b", 20.0, "2023-01-01"),
            (3, "c", 30.0, "2023-01-01"),
            (4, "d", 40.0, "2023-01-01"),
        ],
        "pk1 int, pk2 string, v double, ts string",
    )


def _final_state(df):
    return sorted(
        (r.pk1, r.pk2, r.v) for r in df.select("pk1", "pk2", "v").collect()
    )


def test_scenario_matrix(spark, base):
    """One batch covering all four flush fast-path cases at once:
    insert-only key, delete-only key, insert+update+update (LWW),
    update-then-delete, delete-then-reinsert."""
    delta = spark.createDataFrame(
        [
            # new key inserted, then updated twice → last write wins
            _delta_row(10, "x", 1.0, ACTION_INSERT, 1),
            _delta_row(10, "x", 2.0, ACTION_UPDATE, 2),
            _delta_row(10, "x", 3.0, ACTION_UPDATE, 3),
            # existing key deleted
            _delta_row(2, "b", 0.0, ACTION_DELETE, 4),
            # existing key updated then deleted → gone
            _delta_row(3, "c", 99.0, ACTION_UPDATE, 5),
            _delta_row(3, "c", 0.0, ACTION_DELETE, 6),
            # existing key deleted then re-inserted in same batch → new value
            _delta_row(4, "d", 44.0, ACTION_DELETE, 7),
            _delta_row(4, "d", 45.0, ACTION_INSERT, 8),
            # plain insert of a second new key
            _delta_row(11, "y", 7.0, ACTION_INSERT, 9),
        ],
        DELTA_COLS,
    )
    out = apply_cdc(base, delta, ["pk1", "pk2"])
    assert _final_state(out) == [
        (1, "a", 10.0),   # untouched
        (4, "d", 45.0),   # delete+reinsert
        (10, "x", 3.0),   # LWW of two updates
        (11, "y", 7.0),   # plain insert
    ]


def test_same_position_delete_insert_ordering(spark, base):
    """delete(0) < insert(2) at the SAME txn position → insert wins
    (the action-ordinal tiebreak, delta/controller.go:672-673)."""
    delta = spark.createDataFrame(
        [
            _delta_row(2, "b", 0.0, ACTION_DELETE, 5, stmt=0),
            _delta_row(2, "b", 21.0, ACTION_INSERT, 5, stmt=0),
        ],
        DELTA_COLS,
    )
    net = condense(delta, ["pk1", "pk2"]).collect()
    assert len(net) == 1 and net[0]["action"] == ACTION_INSERT
    out = apply_cdc(base, delta, ["pk1", "pk2"])
    assert (2, "b", 21.0) in _final_state(out)


def test_insert_only_fast_path(spark, base):
    delta = spark.createDataFrame(
        [_delta_row(20, "n", 5.0, ACTION_INSERT, 1)], DELTA_COLS
    )
    out = apply_cdc(base, delta, ["pk1", "pk2"])
    assert len(_final_state(out)) == 5
    # fast path: no join in the plan (pure union)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_delete_only_fast_path(spark, base):
    delta = spark.createDataFrame(
        [
            _delta_row(1, "a", 0.0, ACTION_DELETE, 1),
            _delta_row(2, "b", 0.0, ACTION_DELETE, 2),
        ],
        DELTA_COLS,
    )
    out = apply_cdc(base, delta, ["pk1", "pk2"])
    assert _final_state(out) == [(3, "c", 30.0), (4, "d", 40.0)]


def test_composite_pk_no_cross_key_bleed(spark, base):
    """Same pk1, different pk2 must be independent keys."""
    delta = spark.createDataFrame(
        [_delta_row(1, "ZZ", 111.0, ACTION_INSERT, 1)], DELTA_COLS
    )
    out = apply_cdc(base, delta, ["pk1", "pk2"])
    st = _final_state(out)
    assert (1, "a", 10.0) in st and (1, "ZZ", 111.0) in st


def test_versioned_table_and_idempotent_merge(spark, base, tmp_path):
    cat = Catalog(spark, str(tmp_path / "warehouse"))
    t = cat.create_table("kv", base)
    assert t.version == 0 and cat.list_tables() == ["kv"]

    delta = spark.createDataFrame(
        [_delta_row(1, "a", 100.0, ACTION_UPDATE, 1)], DELTA_COLS
    )
    assert t.merge_batch(delta, ["pk1", "pk2"], txn_app_id="app", txn_version=7)
    assert t.version == 1
    assert (1, "a", 100.0) in _final_state(t.read())

    # retry of the same epoch is a no-op (exactly-once)
    assert not t.merge_batch(delta, ["pk1", "pk2"], txn_app_id="app", txn_version=7)
    assert t.version == 1

    # next epoch applies
    delta2 = spark.createDataFrame(
        [_delta_row(1, "a", 200.0, ACTION_UPDATE, 2)], DELTA_COLS
    )
    assert t.merge_batch(delta2, ["pk1", "pk2"], txn_app_id="app", txn_version=8)
    assert (1, "a", 200.0) in _final_state(t.read())


def test_streaming_cdc_end_to_end(spark, base, tmp_path):
    """File-source CDC stream → foreachBatch merge → versioned table."""
    from pyspark.sql.types import _parse_datatype_string

    from myduckserver_spark.streaming.cdc_stream import start_cdc_stream

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("kv", base)

    src = str(tmp_path / "cdc_in")
    os.makedirs(src)
    schema = _parse_datatype_string(DELTA_COLS)
    batch1 = spark.createDataFrame(
        [
            _delta_row(1, "a", 500.0, ACTION_UPDATE, 1),
            _delta_row(2, "b", 0.0, ACTION_DELETE, 2),
            _delta_row(30, "s", 3.0, ACTION_INSERT, 3),
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    q = start_cdc_stream(
        spark, src, schema, t, ["pk1", "pk2"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    st = _final_state(t.read())
    assert (1, "a", 500.0) in st
    assert all(r[0] != 2 for r in st)
    assert (30, "s", 3.0) in st


def test_read_barrier_read_your_writes(spark, tmp_path):
    """Rows written to the CDC source dir are visible after
    read_barrier() returns (reference flush-before-read,
    backend/executor.go:54-61)."""
    import os

    from pyspark.sql import Row, functions as F
    from pyspark.sql import types as T

    from myduckserver_spark.catalog import Catalog
    from myduckserver_spark.streaming.cdc_stream import (
        read_barrier,
        start_cdc_stream,
    )

    cat = Catalog(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, "a")], "id bigint, val string"
    )
    table = cat.create_table("rb_t", base)

    delta_schema = T.StructType(
        [
            T.StructField("action", T.ByteType()),
            T.StructField("txn_group", T.LongType()),
            T.StructField("txn_seq", T.LongType()),
            T.StructField("txn_stmt", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("val", T.StringType()),
        ]
    )
    src = str(tmp_path / "cdc_src")
    os.makedirs(src)
    q = start_cdc_stream(
        spark, src, delta_schema, table, ["id"],
        str(tmp_path / "ckpt"), trigger_seconds=0.1,
    )
    try:
        spark.createDataFrame(
            [(2, 1, 1, 1, 2, "b")], delta_schema
        ).coalesce(1).write.mode("append").parquet(src)
        read_barrier(q)
        vals = {r.id: r.val for r in table.read().collect()}
        assert vals == {1: "a", 2: "b"}
    finally:
        q.stop()
