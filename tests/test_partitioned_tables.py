"""Hive-partitioned engine tables: CREATE TABLE ... PARTITION BY lays
out snapshots as value directories, reads prune partitions
(PartitionFilters at the scan), DML rewrites preserve the layout, and
column order/types survive the partition round trip."""

import os

import pytest
from pyspark.sql import functions as F

from myduckserver_spark.engine import Engine


@pytest.fixture()
def peng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE ev (id INT PRIMARY KEY, region VARCHAR(10), "
        "v DOUBLE) PARTITIONED BY (region)"
    )
    e.execute(
        "INSERT INTO ev VALUES (1, 'eu', 1.0), (2, 'us', 2.0), "
        "(3, 'eu', 3.0), (4, 'ap', 4.0)"
    )
    return e


def test_partition_directories_on_disk(peng):
    t = peng.catalog.table("ev")
    snap = os.path.join(t.dir, f"v{t.version}")
    dirs = {d for d in os.listdir(snap) if d.startswith("region=")}
    assert dirs == {"region=eu", "region=us", "region=ap"}


def test_column_order_and_types_roundtrip(peng):
    df = peng.execute("SELECT * FROM ev ORDER BY id")
    assert df.columns == ["id", "region", "v"]  # declared order, not hive
    rows = [tuple(r) for r in df.collect()]
    assert rows == [
        (1, "eu", 1.0), (2, "us", 2.0), (3, "eu", 3.0), (4, "ap", 4.0)
    ]


def test_partition_pruning_in_plan(peng):
    df = peng.sql("SELECT id, v FROM ev WHERE region = 'eu'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "region" in plan
    # the eu-only scan must not read the us/ap directories
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_dml_preserves_partitioning(peng):
    peng.execute("UPDATE ev SET v = v + 10 WHERE region = 'us'")
    peng.execute("DELETE FROM ev WHERE region = 'ap'")
    t = peng.catalog.table("ev")
    snap = os.path.join(t.dir, f"v{t.version}")
    dirs = {d for d in os.listdir(snap) if d.startswith("region=")}
    assert dirs == {"region=eu", "region=us"}
    rows = {r.id: r.v for r in peng.execute("SELECT * FROM ev").collect()}
    assert rows == {1: 1.0, 2: 12.0, 3: 3.0}


def test_delete_all_rows_keeps_schema(peng):
    peng.execute("DELETE FROM ev")
    df = peng.execute("SELECT * FROM ev")
    assert df.columns == ["id", "region", "v"] and df.count() == 0
    # and the table is still writable afterwards
    peng.execute("INSERT INTO ev VALUES (9, 'eu', 9.0)")
    assert peng.execute("SELECT * FROM ev").count() == 1


def test_integer_partition_column_type(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh2"))
    e.execute(
        "CREATE TABLE m (id INT PRIMARY KEY, yr INT, x DOUBLE) "
        "PARTITIONED BY (yr)"
    )
    e.execute("INSERT INTO m VALUES (1, 2023, 0.5), (2, 2024, 1.5)")
    df = e.execute("SELECT * FROM m ORDER BY id")
    assert dict(df.dtypes)["yr"] == "int"  # not the inference default
    assert [r.yr for r in df.collect()] == [2023, 2024]


def test_show_create_table_renders_partitioning(peng):
    ddl = peng.execute("SHOW CREATE TABLE ev").collect()[0][1]
    # the value-layout spelling round-trips (PARTITION BY KEY is a
    # dropped distribution hint since round 10)
    assert "PARTITIONED BY (`region`)" in ddl


def test_ctas_partitioned(peng):
    peng.execute(
        "CREATE TABLE ev2 PARTITIONED BY (region) AS "
        "SELECT * FROM ev WHERE v >= 1.0"
    )
    t = peng.catalog.table("ev2")
    snap = os.path.join(t.dir, f"v{t.version}")
    assert any(d.startswith("region=") for d in os.listdir(snap))
    df = peng.sql("SELECT id FROM ev2 WHERE region = 'eu'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_optimize_preserves_partitioning(peng):
    peng.execute("OPTIMIZE ev")
    t = peng.catalog.table("ev")
    snap = os.path.join(t.dir, f"v{t.version}")
    assert any(d.startswith("region=") for d in os.listdir(snap))
    df = peng.sql("SELECT id FROM ev WHERE region = 'eu'")
    assert "PartitionFilters" in (
        df._jdf.queryExecution().executedPlan().toString()
    )
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_update_pruned_rewrite_links_untouched_files(peng):
    """A predicate-pruned UPDATE rewrites ONLY the files that hold
    matching rows; every other data file is carried into the new
    snapshot by hard link (same inode), not rewritten — the Delta-style
    unchanged-AddFile reuse on the versioned-pointer layout."""
    t = peng.catalog.table("ev")
    v0 = t.version
    before = {f: os.stat(os.path.join(t.snapshot_dir(v0), f)).st_ino
              for f in t.data_files(v0)}
    assert len(before) >= 3  # one file per region dir
    peng.execute("UPDATE ev SET v = v + 10 WHERE region = 'eu'")
    t = peng.catalog.table("ev")
    v1 = t.version
    assert v1 == v0 + 1
    after = {f: os.stat(os.path.join(t.snapshot_dir(v1), f)).st_ino
             for f in t.data_files(v1)}
    carried = [f for f in after
               if f in before and after[f] == before[f]]
    rewritten = [f for f in after if f not in before]
    # untouched partitions (us, ap) carried by link; eu rewritten
    assert any(f.startswith("region=us") for f in carried)
    assert any(f.startswith("region=ap") for f in carried)
    assert all(f.startswith("region=eu") for f in rewritten)
    assert len(rewritten) < len(before)
    # values correct
    rows = {r.id: r.v for r in
            peng.execute("SELECT id, v FROM ev ORDER BY id").collect()}
    assert rows == {1: 11.0, 2: 2.0, 3: 13.0, 4: 4.0}


def test_delete_pruned_rewrite(peng):
    t = peng.catalog.table("ev")
    v0 = t.version
    before = {f: os.stat(os.path.join(t.snapshot_dir(v0), f)).st_ino
              for f in t.data_files(v0)}
    r = peng.execute("DELETE FROM ev WHERE region = 'us'")
    assert r.affected_rows == 1
    t = peng.catalog.table("ev")
    after = {f: os.stat(os.path.join(t.snapshot_dir(t.version), f)).st_ino
             for f in t.data_files(t.version)}
    carried = [f for f in after if f in before and after[f] == before[f]]
    assert any(f.startswith("region=eu") for f in carried)
    assert any(f.startswith("region=ap") for f in carried)
    assert not any(f.startswith("region=us") for f in after)
    assert sorted(
        r.id for r in peng.execute("SELECT id FROM ev").collect()
    ) == [1, 3, 4]


def test_update_of_partition_column_falls_back_to_full_rewrite(peng):
    """SET on a hive-partition column can move rows across partition
    directories — the pruned path must not claim it."""
    peng.execute("UPDATE ev SET region = 'eu' WHERE id = 2")
    rows = {r.id: r.region for r in
            peng.execute("SELECT id, region FROM ev").collect()}
    assert rows[2] == "eu"
    t = peng.catalog.table("ev")
    assert not any(
        f.startswith("region=us") for f in t.data_files(t.version)
    )


def test_vacuum_after_pruned_rewrite_keeps_linked_data(peng):
    """VACUUM removes old version dirs; hard-linked files in the new
    snapshot must survive (inode refcount keeps the data alive)."""
    peng.execute("UPDATE ev SET v = v + 1 WHERE region = 'eu'")
    t = peng.catalog.table("ev")
    removed = t.vacuum(keep_last=1)
    assert removed >= 1
    rows = {r.id: r.v for r in
            peng.execute("SELECT id, v FROM ev ORDER BY id").collect()}
    assert rows == {1: 2.0, 2: 2.0, 3: 4.0, 4: 4.0}
