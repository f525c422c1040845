"""Ingest/export parity: typed CSV options, COPY formats, Arrow IPC,
direct file query (reference backend/loaddata.go, pgserver/copy.go,
pgserver/arrowwriter.go; bats suite copy_tests.bats)."""

import os

from myduckserver_spark.sources.arrow import from_arrow, read_ipc, to_arrow, write_ipc
from myduckserver_spark.sources.csv import copy_to, load_csv
from myduckserver_spark.sources.files import query_file


def test_load_csv_basic(spark, tmp_path):
    # FIXTURES.md §4 load_basic.csv
    p = tmp_path / "basic.csv"
    p.write_text("pk,c1\n1,hi\n2,hello\n")
    df = load_csv(spark, str(p), [("pk", "INT"), ("c1", "VARCHAR(255)")], header=True)
    assert sorted((r.pk, r.c1) for r in df.collect()) == [(1, "hi"), (2, "hello")]
    assert df.schema["pk"].dataType.simpleString() == "int"


def test_load_csv_quoted_nulls_escapes(spark, tmp_path):
    # FIXTURES.md §4 load_quoted.csv: embedded separators/quotes, \\N nulls
    p = tmp_path / "quoted.csv"
    p.write_text(
        'pk,c1\n'
        '1,"a,b"\n'
        '2,"say ""hi"""\n'
        '3,\\N\n'
    )
    df = load_csv(
        spark, str(p), [("pk", "INT"), ("c1", "VARCHAR(255)")],
        header=True, nullstr="\\N", escape='"',
    )
    rows = {r.pk: r.c1 for r in df.collect()}
    assert rows == {1: "a,b", 2: 'say "hi"', 3: None}


def test_load_csv_tsv_and_crlf(spark, tmp_path):
    # FIXTURES.md §4 load_json.tsv + load_crlf.csv shapes
    p = tmp_path / "data.tsv"
    p.write_text('1\tk1\t{"a": 1}\r\n2\tk2\t{"b": [1,2]}\r\n')
    df = load_csv(
        spark, str(p),
        [("code", "VARCHAR(10)"), ("kind", "VARCHAR(10)"), ("body", "JSON")],
        sep="\t", line_sep="\r\n",
    )
    rows = {r.code: r.body for r in df.collect()}
    assert rows["1"] == '{"a": 1}' and rows["2"] == '{"b": [1,2]}'


def test_copy_to_csv_text_mode_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, None)], "i int, s string")
    out = str(tmp_path / "out_csv")
    copy_to(df, out, fmt="csv", text_mode=True)
    # text mode: tab sep, \N nulls (pg COPY defaults)
    content = "".join(
        open(os.path.join(out, f)).read()
        for f in os.listdir(out) if f.endswith(".csv")
    )
    assert "\t" in content and "\\N" in content
    back = load_csv(
        spark, out, [("i", "INT"), ("s", "VARCHAR(10)")], sep="\t", nullstr="\\N"
    )
    assert sorted((r.i, r.s) for r in back.collect()) == [(1, "a"), (2, None)]


def test_copy_to_parquet_and_json(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "i int, s string")
    copy_to(df, str(tmp_path / "p"), fmt="parquet")
    copy_to(df, str(tmp_path / "j"), fmt="json")
    assert spark.read.parquet(str(tmp_path / "p")).count() == 1
    assert spark.read.json(str(tmp_path / "j")).count() == 1


def test_arrow_roundtrip(spark):
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)], "i int, s string, d double")
    t = to_arrow(df)
    assert t.num_rows == 2
    back = from_arrow(spark, t)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_arrow_ipc_file_roundtrip(spark, tmp_path):
    # COPY (FORMAT ARROW) parity: full IPC stream file round-trip
    df = spark.createDataFrame([(i, f"s{i}") for i in range(100)], "i long, s string")
    p = str(tmp_path / "data.arrows")
    write_ipc(df, p)
    back = read_ipc(spark, p)
    assert back.count() == 100
    assert back.schema == df.schema


def test_query_file_direct(spark, tmp_path):
    # SELECT * FROM 'file.parquet' sugar
    df = query_file(spark, "/root/testdata/sf0.001/region.parquet")
    assert df.count() == 5
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,x\n")
    df2 = query_file(spark, str(p))
    assert df2.collect()[0].a == 1


def test_direct_file_query_sql_front_door(spark, tmp_path):
    """SELECT * FROM 'f.parquet' and read_parquet('f') through
    engine.sql (reference: DuckDB direct-file queries advertised in
    docs/tutorial/load-parquet-files.md)."""
    from myduckserver_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_files"))
    p = "/root/testdata/sf0.001/region.parquet"
    n1 = e.sql(f"SELECT COUNT(*) AS n FROM '{p}'").collect()[0].n
    n2 = e.sql(f"SELECT COUNT(*) AS n FROM read_parquet('{p}')").collect()[0].n
    assert n1 == n2 == 5
    joined = e.sql(
        f"SELECT r.r_name FROM '{p}' r JOIN read_parquet('{p}') r2 "
        "ON r.r_regionkey = r2.r_regionkey ORDER BY r.r_name"
    ).collect()
    assert len(joined) == 5
    # a path-looking string NOT in FROM position stays a literal
    lit = e.sql("SELECT 'x.parquet' AS s").collect()[0].s
    assert lit == "x.parquet"
