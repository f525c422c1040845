"""Structured Streaming CDC ingestion.

The reference's replication path (binlog/WAL events → Arrow delta
buffer → batched flush every 200 ms / 128 MB —
reference binlogreplication/binlog_replica_applier.go:837-849,
delta/flush_reason.go:5-24) maps to:

    readStream (CDC file/Kafka source with the augmented schema)
      → foreachBatch( ParquetTable.merge_batch )   # condense + upsert
      → checkpoint + txn markers                   # exactly-once

The trigger interval is the 200 ms analog; maxFilesPerTrigger is the
128 MB batch-size analog. Ordering inside a batch is carried by
(txn_group, txn_seq, txn_stmt), so arrival order never matters —
late/duplicate re-delivery collapses in condense, and foreachBatch
retries are no-ops via the txn marker (the Spark form of the
reference's GTID-in-same-commit exactly-once contract, SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from myduckserver_spark.catalog import ParquetTable


def start_cdc_stream(
    spark: SparkSession,
    source_dir: str,
    delta_schema: StructType,
    table: ParquetTable,
    pk_cols: list[str],
    checkpoint_dir: str,
    trigger_seconds: float = 0.2,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = 128 << 20,
    app_id: str = "cdc",
) -> StreamingQuery:
    """Tail a directory of CDC parquet batches into a versioned table.

    trigger_seconds is the 200 ms time trigger; max_bytes_per_trigger is
    the 128 MB byte trigger (reference
    binlogreplication/binlog_replica_applier.go:837-849) — the file
    source admits whole files up to the byte budget per batch. Spark
    forbids combining it with maxFilesPerTrigger, so passing
    max_files_per_trigger switches the batch bound to file count.
    """
    if max_files_per_trigger is not None and max_bytes_per_trigger is not None:
        raise ValueError(
            "set either max_files_per_trigger or max_bytes_per_trigger, "
            "not both (Spark file source restriction)"
        )
    reader = spark.readStream.schema(delta_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger", int(max_bytes_per_trigger))
    stream = reader.parquet(source_dir)

    def apply_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.merge_batch(
            batch_df, pk_cols, txn_app_id=app_id, txn_version=int(epoch_id)
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{int(trigger_seconds * 1000)} milliseconds")
        .start()
    )


def read_barrier(query: StreamingQuery) -> None:
    """Drain all pending CDC input before serving a read.

    The reference flushes the delta buffer at the top of every query
    build so MySQL-side reads observe their own replicated writes
    (read-your-writes; reference backend/executor.go:54-61). The
    Structured Streaming twin is processAllAvailable(): it blocks until
    every file visible in the source directory has been committed
    through foreachBatch.

    Serving tier note: at scale you either (a) call this only on
    sessions that demand read-your-writes, or (b) skip it and serve
    snapshot-consistent reads from the last committed table version —
    the same two consistency modes the reference offers via its
    flush-on-query toggle.
    """
    query.processAllAvailable()
