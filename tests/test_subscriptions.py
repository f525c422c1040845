"""CREATE/ALTER/DROP SUBSCRIPTION lifecycle (reference:
pgserver/subscription_handler.go:18-66 grammar, :162-238 lifecycle):
create → rows flow on tick → disable stops the flow → re-enable
resumes exactly-once from the committed position → drop removes it.
"""

from __future__ import annotations

import pytest

from myduckserver_spark import statements as st
from myduckserver_spark.engine import Engine
from myduckserver_spark.operators.cdc import ACTION_INSERT, ACTION_UPDATE
from myduckserver_spark.streaming.cdc_source import FileCdcFeed


def test_parse_subscription_statements():
    s = st.parse_statement(
        "CREATE SUBSCRIPTION mysub "
        "CONNECTION 'dbname= host=127.0.0.1 port=5432 user=postgres "
        "password=root' PUBLICATION mypub"
    )
    assert isinstance(s, st.SubscriptionStmt)
    assert (s.action, s.name, s.publication) == ("create", "mysub", "mypub")
    # reference defaults fill empty dbname/port
    assert s.connection["host"] == "127.0.0.1"
    assert s.connection["port"] == "5432"
    a = st.parse_statement("ALTER SUBSCRIPTION mysub disable")
    assert (a.action, a.name) == ("disable", "mysub")
    e = st.parse_statement("ALTER SUBSCRIPTION mysub ENABLE")
    assert (e.action, e.name) == ("enable", "mysub")
    d = st.parse_statement("DROP SUBSCRIPTION mysub")
    assert (d.action, d.name) == ("drop", "mysub")


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE repl_t (id INT PRIMARY KEY, v DOUBLE)")
    e.execute("INSERT INTO repl_t VALUES (1, 1.0)")
    return e


def _state(eng):
    return sorted(
        (r.id, r.v)
        for r in eng.catalog.table("repl_t").read().collect()
    )


def test_subscription_lifecycle(eng, tmp_path):
    feed_root = str(tmp_path / "feed")
    feed = FileCdcFeed(feed_root)
    eng.execute(
        f"CREATE SUBSCRIPTION s1 CONNECTION 'path={feed_root} "
        "table=repl_t' PUBLICATION pub1"
    )
    # created enabled: events flow on the next tick
    feed.append(ACTION_INSERT, {"id": 2, "v": 2.0})
    feed.append(ACTION_UPDATE, {"id": 1, "v": 1.5})
    applied = eng.subscription_tick()
    assert applied["s1"] == 2
    assert _state(eng) == [(1, 1.5), (2, 2.0)]

    # disable: new events do NOT apply
    eng.execute("ALTER SUBSCRIPTION s1 DISABLE")
    feed.append(ACTION_INSERT, {"id": 3, "v": 3.0})
    assert eng.subscription_tick() == {}
    assert _state(eng) == [(1, 1.5), (2, 2.0)]

    # re-enable: resumes from the committed position — the missed event
    # applies ONCE, nothing replays
    eng.execute("ALTER SUBSCRIPTION s1 ENABLE")
    applied = eng.subscription_tick()
    assert applied["s1"] == 1
    assert _state(eng) == [(1, 1.5), (2, 2.0), (3, 3.0)]
    assert eng.subscription_tick() == {"s1": 0}  # idempotent

    # drop: subscription is gone; further ALTER raises
    eng.execute("DROP SUBSCRIPTION s1")
    assert eng.subscription_tick() == {}
    with pytest.raises(ValueError):
        eng.execute("ALTER SUBSCRIPTION s1 ENABLE")


def test_subscription_validation(eng, tmp_path):
    with pytest.raises(ValueError):  # missing path/table keys
        eng.execute(
            "CREATE SUBSCRIPTION bad CONNECTION 'host=127.0.0.1' "
            "PUBLICATION p"
        )
    feed_root = str(tmp_path / "feed2")
    eng.execute(
        f"CREATE SUBSCRIPTION s2 CONNECTION 'path={feed_root} "
        "table=repl_t'"
    )
    with pytest.raises(ValueError):  # duplicate name
        eng.execute(
            f"CREATE SUBSCRIPTION s2 CONNECTION 'path={feed_root} "
            "table=repl_t'"
        )


def test_subscription_survives_engine_reopen(eng, spark, tmp_path):
    feed_root = str(tmp_path / "feed3")
    feed = FileCdcFeed(feed_root)
    eng.execute(
        f"CREATE SUBSCRIPTION s3 CONNECTION 'path={feed_root} "
        "table=repl_t'"
    )
    feed.append(ACTION_INSERT, {"id": 9, "v": 9.0})
    # a NEW engine over the same warehouse sees the subscription
    e2 = Engine(spark, str(tmp_path / "wh"))
    applied = e2.subscription_tick()
    assert applied["s3"] == 1
    assert (9, 9.0) in _state(e2)


def test_show_subscriptions(eng, tmp_path):
    feed_root = str(tmp_path / "feed_show")
    feed = FileCdcFeed(feed_root)
    eng.execute(
        f"CREATE SUBSCRIPTION shown CONNECTION 'path={feed_root} "
        "table=repl_t' PUBLICATION pubx"
    )
    rows = eng.execute("SHOW SUBSCRIPTIONS").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.Subscription, r.Publication, r.Target, r.Enabled) == (
        "shown", "pubx", "repl_t", True,
    )
    assert r.Position == 0
    feed.append(ACTION_INSERT, {"id": 7, "v": 7.0})
    eng.subscription_tick()
    r = eng.execute("SHOW SUBSCRIPTIONS").collect()[0]
    assert r.Position > 0  # committed resume position advanced
    eng.execute("ALTER SUBSCRIPTION shown DISABLE")
    assert eng.execute("SHOW SUBSCRIPTIONS").collect()[0].Enabled is False


def test_background_replication_loop(eng, tmp_path):
    import time

    feed_root = str(tmp_path / "feed_bg")
    feed = FileCdcFeed(feed_root)
    eng.execute(
        f"CREATE SUBSCRIPTION bg CONNECTION 'path={feed_root} "
        "table=repl_t'"
    )
    eng.start_replication(interval=0.05)
    try:
        feed.append(ACTION_INSERT, {"id": 21, "v": 21.0})
        deadline = time.monotonic() + 20
        while time.monotonic() < deadline:
            if (21, 21.0) in _state(eng):
                break
            time.sleep(0.1)
        assert (21, 21.0) in _state(eng), eng.replication_errors
        assert eng.replication_errors == []
    finally:
        eng.stop_replication()
    # loop is stopped: further events stay unapplied
    feed.append(ACTION_INSERT, {"id": 22, "v": 22.0})
    time.sleep(0.3)
    assert (22, 22.0) not in _state(eng)
