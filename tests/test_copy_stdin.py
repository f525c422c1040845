"""Chunked COPY FROM STDIN (reference: pgserver/dataloader.go:156-256
FIFO pipeline; backend/loaddata.go:67-100). Chunks split arbitrarily —
mid-line, mid-CRLF — and must reassemble exactly; text mode uses
tab + \\N + no quoting; CSV mode honors quotes."""

from __future__ import annotations

import os

import pytest

from myduckserver_spark.engine import Engine
from myduckserver_spark.sources.csv import spool_chunks


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "wh"))
    e.create_table("people", [("id", "INT"), ("name", "VARCHAR(40)"), ("score", "DOUBLE")])
    return e


def _rows(engine):
    return sorted(
        (r.id, r.name, r.score)
        for r in engine.sql("SELECT * FROM people").collect()
    )


def test_text_mode_roundtrip_with_nulls(engine):
    # pg text format: tab-separated, \N = NULL
    stream = "1\talice\t3.5\n2\t\\N\t4.0\n3\tcarol\t\\N\n"
    # deliver in awkward chunk splits (mid-line)
    chunks = [stream[:5], stream[5:17], stream[17:]]
    r = engine.copy_from_stdin("people", chunks, fmt="text")
    assert r.affected_rows == 3
    assert _rows(engine) == [
        (1, "alice", 3.5),
        (2, None, 4.0),
        (3, "carol", None),
    ]


def test_crlf_split_between_chunks(engine):
    # CRLF line endings with the \r\n split ACROSS a chunk boundary
    chunks = [b"1\talice\t1.0\r", b"\n2\tbob\t2.0\r\n"]
    r = engine.copy_from_stdin("people", chunks, fmt="text")
    assert r.affected_rows == 2
    assert _rows(engine) == [(1, "alice", 1.0), (2, "bob", 2.0)]


def test_csv_mode_quotes_and_header(engine):
    stream = 'id,name,score\n1,"smith, jr",1.5\n2,"say ""hi""",2.5\n'
    r = engine.copy_from_stdin(
        "people", [stream], fmt="csv", header=True
    )
    assert r.affected_rows == 2
    assert _rows(engine) == [(1, "smith, jr", 1.5), (2, 'say "hi"', 2.5)]


def test_missing_trailing_newline(engine):
    r = engine.copy_from_stdin("people", ["1\tx\t0.5"], fmt="text")
    assert r.affected_rows == 1
    assert _rows(engine) == [(1, "x", 0.5)]


def test_column_subset_null_fill(engine):
    r = engine.copy_from_stdin(
        "people", ["5\t9.9\n"], fmt="text", columns=["id", "score"]
    )
    assert r.affected_rows == 1
    assert _rows(engine) == [(5, None, 9.9)]


def test_spool_rotation_line_aligned(tmp_path):
    # tiny part size forces rotation; every part must end on a newline
    lines = [f"{i},row{i}\n" for i in range(100)]
    blob = "".join(lines).encode()
    # deliver as 7-byte chunks (split everywhere)
    chunks = [blob[i : i + 7] for i in range(0, len(blob), 7)]
    parts = spool_chunks(chunks, str(tmp_path / "spool"), part_bytes=100)
    assert len(parts) > 3
    joined = b""
    for p in parts:
        data = open(p, "rb").read()
        assert data.endswith(b"\n")
        joined += data
    assert joined == blob


def test_large_stream_many_chunks(engine):
    n = 5000
    blob = "".join(f"{i}\tname{i}\t{i}.5\n" for i in range(n)).encode()
    chunks = [blob[i : i + 997] for i in range(0, len(blob), 997)]
    r = engine.copy_from_stdin("people", chunks, fmt="text")
    assert r.affected_rows == n
    rows = _rows(engine)
    assert len(rows) == n and rows[0] == (0, "name0", 0.5)
