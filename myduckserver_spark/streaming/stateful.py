"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no user-facing streaming state (SURVEY.md §2.E);
these are the Spark-native extensions a training-data pipeline needs:

- streaming_dedup: cross-batch exact dedup — the first document with a
  given fingerprint passes, later duplicates (any batch) are dropped.
  State per fingerprint group = one boolean. At 100 TB the state store
  is RocksDB-backed and partitioned by the fingerprint hash, so state
  lookups shard with the shuffle.
- running_user_totals: per-key running aggregates emitted every batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_DEDUP_STATE = StructType([StructField("seen", BooleanType())])


def streaming_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep only the first occurrence of each normalized-text
    fingerprint across the whole stream lifetime."""
    out_schema = StructType(
        [StructField("fp", StringType()), StructField(id_col, LongType())]
    )

    def keep_first(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first_id = None
        for pdf in pdfs:
            batch_min = pdf[id_col].min()
            if first_id is None or batch_min < first_id:
                first_id = batch_min
        if first_id is None:
            return
        state.update((True,))
        yield pd.DataFrame({"fp": [key[0]], id_col: [int(first_id)]})

    with_fp = docs.select(
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fp"), F.col(id_col)
    )
    return with_fp.groupBy("fp").applyInPandasWithState(
        keep_first,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TOTALS_STATE = StructType(
    [StructField("n", LongType()), StructField("total_cents", LongType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (n_events, total_value) per user, emitted on every batch
    the user appears in. Values accumulate in integer cents so state
    merge order can't change the result."""
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_cents", LongType()),
        ]
    )

    def accumulate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(pdf["value"].sum() * 100))
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        accumulate,
        outputStructType=out_schema,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_ttl(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_ms: int = 24 * 3600 * 1000,
) -> DataFrame:
    """Cross-batch dedup on the transformWithStateInPandas API with
    per-key state TTL.

    Same contract as streaming_dedup, plus: a fingerprint not seen for
    `ttl_ms` is forgotten, which BOUNDS state size for unbounded
    streams — the property that keeps a months-long 100 TB ingest from
    accumulating state forever. (applyInPandasWithState offers only
    manual timeout bookkeeping; the newer API attaches TTL to the
    value state itself.)

    Requires protobuf (Spark's transformWithState wire format); raises
    ImportError where that runtime dependency is absent — callers can
    fall back to streaming_dedup.
    """
    import google.protobuf  # noqa: F401  (hard runtime dep of the API)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType(
        [StructField("fp", StringType()), StructField(id_col, LongType())]
    )
    state_schema = StructType([StructField("seen", BooleanType())])

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState("seen", state_schema, ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            if self._seen.exists():
                return iter(())
            first_id = None
            for pdf in rows:
                batch_min = pdf[id_col].min()
                if first_id is None or batch_min < first_id:
                    first_id = int(batch_min)
            self._seen.update((True,))
            yield pd.DataFrame({"fp": [key[0]], id_col: [first_id]})

        def close(self) -> None:
            pass

    with_fp = docs.withColumn(
        "fp", F.md5(F.lower(F.trim(F.col(text_col))))
    ).select("fp", id_col)
    return with_fp.groupBy("fp").transformWithStateInPandas(
        statefulProcessor=FirstSeen(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )
