"""Replica controller statements (reference
binlogreplication/binlog_replica_controller.go): CHANGE REPLICATION
SOURCE TO persists config, START REPLICA attaches the multi-table CDC
applier over a LOCAL feed (file:// — no network stack in a library
engine), the HOST pumps via Engine.replica_poll() (host-owns-timing,
like run_event), STOP flushes and halts, RESET ALL forgets the config.
Positions ride the per-table exactly-once markers, so a restarted
engine resumes where the last atomic commit left off."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T  # noqa: F401 (schema literals below)

from myduckserver_spark.engine import Engine
from myduckserver_spark.operators.cdc import ACTION_INSERT, ACTION_UPDATE
from myduckserver_spark.streaming.cdc_source import FileCdcFeed
from myduckserver_spark.streaming.log_feed import PartitionedLogFeed


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE acct (id BIGINT PRIMARY KEY, v DOUBLE)")
    e.execute("INSERT INTO acct VALUES (1, 10.0), (2, 20.0)")
    e.execute("CREATE TABLE alog (id BIGINT PRIMARY KEY, v DOUBLE)")
    e.execute("INSERT INTO alog VALUES (1, 0.0)")
    return e


def _state(e, t):
    return sorted((r.id, r.v) for r in
                  e.execute(f"SELECT * FROM {t}").collect())


def test_start_requires_configuration(eng):
    with pytest.raises(ValueError, match="not configured as a replica"):
        eng.execute("START REPLICA")
    eng.execute("CHANGE REPLICATION SOURCE TO SOURCE_HOST = 'file:///x'")
    with pytest.raises(ValueError, match="Empty username"):
        eng.execute("START REPLICA")


def test_network_source_rejected_honestly(eng, tmp_path):
    eng.execute("CHANGE REPLICATION SOURCE TO SOURCE_HOST = 'db.example',"
                " SOURCE_PORT = 3306, SOURCE_USER = 'repl'")
    with pytest.raises(NotImplementedError, match="wire/connector"):
        eng.execute("START REPLICA")


def test_replication_lifecycle_file_feed(eng, tmp_path):
    feed = FileCdcFeed(str(tmp_path / "feed"))
    feed.append(ACTION_UPDATE, {"id": 1, "v": 11.0}, table="acct",
                txn_seq=0)
    feed.append(ACTION_INSERT, {"id": 2, "v": 2.0}, table="alog",
                txn_seq=1)
    # legacy CHANGE MASTER TO spelling maps MASTER_* -> SOURCE_*
    eng.execute(f"CHANGE MASTER TO MASTER_HOST = "
                f"'file://{tmp_path / 'feed'}', MASTER_USER = 'repl'")
    eng.execute("START REPLICA")  # initial catch-up applies both
    assert _state(eng, "acct") == [(1, 11.0), (2, 20.0)]
    assert _state(eng, "alog") == [(1, 0.0), (2, 2.0)]
    # both tables share the atomic commit's marker
    a = eng.catalog.table("acct").last_txn_version("replica")
    b = eng.catalog.table("alog").last_txn_version("replica")
    assert a == b > 0
    # host pump picks up new events
    feed.append(ACTION_UPDATE, {"id": 2, "v": 22.0}, table="alog",
                txn_seq=2)
    results = eng.replica_poll()
    assert any(r.applied for r in results)
    assert _state(eng, "alog") == [(1, 0.0), (2, 22.0)]
    # config changes require a stopped replica
    with pytest.raises(ValueError, match="STOP REPLICA first"):
        eng.execute("CHANGE REPLICATION SOURCE TO SOURCE_PORT = 3307")
    eng.execute("STOP REPLICA")
    with pytest.raises(ValueError, match="not running"):
        eng.replica_poll()
    # RESET ALL forgets the config (MySQL semantics)
    eng.execute("RESET REPLICA ALL")
    with pytest.raises(ValueError, match="not configured"):
        eng.execute("START REPLICA")


def test_restart_resumes_from_markers(eng, spark, tmp_path):
    """Engine restart with running config: replica_poll rebuilds the
    applier lazily and the exactly-once markers prevent re-apply."""
    feed = FileCdcFeed(str(tmp_path / "feed"))
    feed.append(ACTION_UPDATE, {"id": 1, "v": 11.0}, table="acct")
    eng.execute(f"CHANGE REPLICATION SOURCE TO SOURCE_HOST = "
                f"'file://{tmp_path / 'feed'}', SOURCE_USER = 'repl'")
    eng.execute("START REPLICA")
    assert _state(eng, "acct") == [(1, 11.0), (2, 20.0)]
    pos = eng.catalog.table("acct").last_txn_version("replica")
    # new engine over the same warehouse: running=true persisted
    e2 = Engine(spark, eng._warehouse)
    feed.append(ACTION_UPDATE, {"id": 1, "v": 12.0}, table="acct")
    e2.replica_poll()
    assert _state(e2, "acct") == [(1, 12.0), (2, 20.0)]
    assert e2.catalog.table("acct").last_txn_version("replica") > pos


def test_partitioned_log_source(eng, tmp_path):
    """SOURCE_HOST pointing at a PartitionedLogFeed directory binds the
    Kafka-shaped adapter: the offset VECTOR commits with the data."""
    log = PartitionedLogFeed(str(tmp_path / "plog"), num_partitions=3)
    log.append(ACTION_UPDATE, {"id": 1, "v": 11.0}, key=1, table="acct")
    log.append(ACTION_INSERT, {"id": 2, "v": 2.0}, key=2, table="alog")
    eng.execute(f"CHANGE REPLICATION SOURCE TO SOURCE_HOST = "
                f"'file://{tmp_path / 'plog'}', SOURCE_USER = 'repl'")
    eng.execute("START REPLICA")
    assert _state(eng, "acct") == [(1, 11.0), (2, 20.0)]
    assert _state(eng, "alog") == [(1, 0.0), (2, 2.0)]
    state = eng.catalog.table("acct").last_txn_state("replica")
    assert sum(state["offsets"].values()) == 2


def test_change_replication_filter(eng, tmp_path):
    """REPLICATE_IGNORE_TABLE drops a table's events (consumed, never
    applied — MySQL filter semantics); filters are NOT persisted,
    matching the reference (binlog_replica_controller.go:351)."""
    feed = FileCdcFeed(str(tmp_path / "feed"))
    feed.append(ACTION_UPDATE, {"id": 1, "v": 11.0}, table="acct",
                txn_seq=0)
    feed.append(ACTION_INSERT, {"id": 9, "v": 9.0}, table="alog",
                txn_seq=1)
    eng.execute("CHANGE REPLICATION FILTER "
                "REPLICATE_IGNORE_TABLE = (alog)")
    eng.execute(f"CHANGE REPLICATION SOURCE TO SOURCE_HOST = "
                f"'file://{tmp_path / 'feed'}', SOURCE_USER = 'repl'")
    eng.execute("START REPLICA")
    assert _state(eng, "acct") == [(1, 11.0), (2, 20.0)]
    # alog untouched: its event was consumed but filtered
    assert _state(eng, "alog") == [(1, 0.0)]
    # DO_TABLE narrows to an allowlist
    eng.execute("STOP REPLICA")
    eng.execute("CHANGE REPLICATION FILTER REPLICATE_DO_TABLE = (alog), "
                "REPLICATE_IGNORE_TABLE = ()")
    eng.execute("START REPLICA")
    feed.append(ACTION_UPDATE, {"id": 1, "v": 99.0}, table="acct",
                txn_seq=2)
    feed.append(ACTION_INSERT, {"id": 9, "v": 9.0}, table="alog",
                txn_seq=3)
    eng.replica_poll()
    assert _state(eng, "acct") == [(1, 11.0), (2, 20.0)]  # filtered out
    assert _state(eng, "alog") == [(1, 0.0), (9, 9.0)]
