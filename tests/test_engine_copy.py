"""LOAD DATA INFILE / COPY TO / COPY FROM through the SQL front door
(reference: LOAD DATA rewrite backend/loaddata.go:56-227; COPY parse
pgserver/copy.go:14-48, writer datawriter.go:49-139)."""

import glob
import os

import pytest

from myduckserver_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE t (id INT PRIMARY KEY, name VARCHAR(40), score DOUBLE)"
    )
    return e


def test_load_data_defaults_tab(engine, tmp_path):
    p = tmp_path / "in.tsv"
    p.write_text("1\tann\t1.5\n2\tbob\t2.5\n")
    r = engine.execute(f"LOAD DATA INFILE '{p}' INTO TABLE t")
    assert r.affected_rows == 2
    rows = {x.id: (x.name, x.score)
            for x in engine.execute("SELECT * FROM t").collect()}
    assert rows == {1: ("ann", 1.5), 2: ("bob", 2.5)}


def test_load_data_csv_options_skip_and_columns(engine, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("header line\n10,'x'\n20,'y'\n")
    r = engine.execute(
        f"LOAD DATA INFILE '{p}' INTO TABLE t "
        "FIELDS TERMINATED BY ',' ENCLOSED BY '''' "
        "IGNORE 1 LINES (id, name)"
    )
    assert r.affected_rows == 2
    rows = {x.id: (x.name, x.score)
            for x in engine.execute("SELECT * FROM t").collect()}
    assert rows == {10: ("x", None), 20: ("y", None)}


def test_load_data_replace_by_pk(engine, tmp_path):
    engine.execute("INSERT INTO t VALUES (1, 'old', 0.0)")
    p = tmp_path / "r.tsv"
    p.write_text("1\tnew\t9.9\n")
    engine.execute(f"LOAD DATA INFILE '{p}' REPLACE INTO TABLE t")
    assert engine.execute(
        "SELECT name FROM t WHERE id = 1").collect()[0].name == "new"


def test_copy_to_csv_and_back(engine, tmp_path):
    engine.execute("INSERT INTO t VALUES (1, 'a', 1.0), (2, 'b', NULL)")
    out = tmp_path / "out_csv"
    r = engine.execute(
        f"COPY t TO '{out}' (FORMAT CSV, HEADER, DELIMITER ';', NULL 'NIL')"
    )
    assert r.affected_rows == 2
    data = "".join(
        open(f).read() for f in sorted(glob.glob(os.path.join(out, "*.csv")))
    )
    assert "id;name;score" in data and "NIL" in data

    engine.execute("TRUNCATE TABLE t")
    r = engine.execute(
        f"COPY t FROM '{out}' (FORMAT CSV, HEADER, DELIMITER ';', NULL 'NIL')"
    )
    assert r.affected_rows == 2
    rows = {x.id: x.score for x in engine.execute("SELECT * FROM t").collect()}
    assert rows == {1: 1.0, 2: None}


def test_copy_query_to_parquet_roundtrip(engine, tmp_path):
    engine.execute("INSERT INTO t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    out = tmp_path / "out_pq"
    engine.execute(
        f"COPY (SELECT id, score FROM t WHERE score > 1.5) TO '{out}' "
        "(FORMAT PARQUET)"
    )
    df = engine.spark.read.parquet(str(out))
    assert [tuple(r) for r in df.collect()] == [(2, 2.0)]


def test_copy_arrow_roundtrip(spark, tmp_path):
    """COPY ... TO/FROM (FORMAT ARROW): Arrow IPC stream files through
    the statement router (reference pgserver/arrowwriter.go:66-135,
    arrowloader.go:25-105)."""
    from myduckserver_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_arrow"))
    eng.execute("CREATE TABLE src (id BIGINT, name VARCHAR(20))")
    eng.execute("INSERT INTO src VALUES (1, 'a'), (2, 'b'), (3, NULL)")
    ipc = str(tmp_path / "out.arrows")
    r = eng.execute(f"COPY src TO '{ipc}' (FORMAT ARROW)")
    assert r.affected_rows == 3

    eng.execute("CREATE TABLE dst (id BIGINT, name VARCHAR(20))")
    r2 = eng.execute(f"COPY dst FROM '{ipc}' (FORMAT ARROW)")
    assert r2.affected_rows == 3
    rows = sorted(
        eng.sql("SELECT id, name FROM dst").collect(), key=lambda r: r.id
    )
    assert [(r.id, r.name) for r in rows] == [(1, "a"), (2, "b"), (3, None)]
