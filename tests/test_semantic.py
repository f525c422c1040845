"""Semantic operators (operators/semantic.py): prompt dedup, persistent
inference cache, Arrow-batched stub model, join-back correctness."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from myduckserver_spark.catalog import Catalog
from myduckserver_spark.operators.semantic import (
    semantic_filter,
    semantic_map,
    stub_model,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "cat"))


def _df(spark):
    rows = [(i, f"doc {i % 3}") for i in range(9)]  # 3 distinct prompts
    return spark.createDataFrame(rows, "id bigint, text string")


def test_semantic_map_joins_back_every_row(spark):
    out = semantic_map(_df(spark), "text")
    rows = {r.id: r.response for r in out.collect()}
    assert len(rows) == 9
    # identical prompts get identical responses
    assert rows[0] == rows[3] == rows[6]
    # and they equal the stub model's own answer
    assert rows[0] == stub_model(pd.Series(["doc 0"]))[0]


def test_inference_cache_only_pays_misses(spark, cat):
    # the model runs in executor workers; an accumulator is the only
    # driver-visible call counter
    acc = spark.sparkContext.accumulator(0)

    def counting_model(p):
        acc.add(len(p))
        return stub_model(p)

    semantic_map(_df(spark), "text", model_fn=counting_model, catalog=cat)
    assert acc.value == 3  # one inference per DISTINCT prompt, not 9
    # second run over overlapping data: only the new prompt is inferred
    more = spark.createDataFrame(
        [(100, "doc 0"), (101, "doc NEW")], "id bigint, text string"
    )
    before = acc.value
    out = semantic_map(more, "text", model_fn=counting_model, catalog=cat)
    assert out.count() == 2
    assert acc.value - before == 1  # 'doc 0' came from the cache
    assert cat.table("__sem_cache").read().count() == 4


def test_semantic_filter(spark):
    df = _df(spark)
    labels = {t: stub_model(pd.Series([t]))[0]
              for t in ("doc 0", "doc 1", "doc 2")}
    want = labels["doc 2"]
    expect = {t for t, lb in labels.items() if lb == want}
    kept = semantic_filter(df, "text", keep_label=want)
    assert set(r.text for r in kept.collect()) == expect
