"""Event-driven incremental path-index maintenance (T1-T4, SURVEY §2.9).

Reference flow (DatalakePathIndexerFunc/PathIndexerFunc.cs:18-36): Service
Bus delivers BlobCreated batches (500-2000 msgs, ≤10 s wait — host.json) →
project each to a ``PathIndexModel`` row → ``UpsertPathsAsync``.  At-least-
once delivery is made idempotent by the deterministic key + MergeOrUpload.

Spark shape: ``readStream`` → ``foreachBatch`` (W1 dedup + LWW merge).  The
micro-batch boundary is arbitrary (T3's batching policy becomes the trigger),
so the merge is written to be batch-split-invariant: last-writer-wins compares
``fileLastModified`` with the event sequencer as tie-break, which yields the
same final table no matter how the stream is chopped.  ``availableNow``
replaces the reference's drain-termination (T7).

Production sink would be Delta ``MERGE INTO``; on plain parquet the merge is
read → anti-join+union → write-new → atomic swap.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from azuredatalakeindexer_spark.operators.mapper import events_to_path_rows
from azuredatalakeindexer_spark.operators.upsert import dedup_last_writer
from azuredatalakeindexer_spark.schemas import (
    EVENT_TYPE_BLOB_CREATED,
    EVENT_TYPE_BLOB_DELETED,
)


def stream_events(spark: SparkSession, events_dir: str, schema: StructType, max_files_per_trigger: int | None = None) -> DataFrame:
    """T1/T3: the blob-event micro-batch source.

    ``maxFilesPerTrigger`` is the Spark analog of the Service Bus
    ``maxMessageBatchSize`` (host.json) — it bounds each micro-batch.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(events_dir)


def _merge_batch(spark: SparkSession, rows: DataFrame, target_dir: str) -> None:
    """LWW merge of deduped path rows into a parquet table (S6 on files).

    Batch-split invariant: an incoming row replaces an existing row for the
    same key only if (fileLastModified, _seq) is strictly newer — so merging
    {e1} then {e2} equals merging {e1, e2}.
    """
    rows = dedup_last_writer(rows, ["key"], "fileLastModified", tiebreak_col="_seq")
    if os.path.isdir(target_dir) and any(
        f.endswith(".parquet") for f in os.listdir(target_dir)
    ):
        existing = spark.read.parquet(target_dir)
        merged = dedup_last_writer(
            existing.unionByName(rows), ["key"], "fileLastModified", tiebreak_col="_seq"
        )
    else:
        merged = rows
    tmp = target_dir.rstrip("/") + f"__tmp_{uuid.uuid4().hex}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(target_dir):
        shutil.rmtree(target_dir)
    os.replace(tmp, target_dir)


def run_event_stream_upsert(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    path_index_dir: str,
    deleted_index_dir: str,
    checkpoint_dir: str,
    now: str | None = None,
    max_files_per_trigger: int | None = None,
    shuffle_partitions: int | None = None,
) -> None:
    """T1+T2: drain the event stream (availableNow) into the path index and
    the deleted-path index (reference PathIndexerFunc.cs:18-74).

    ``now`` pins the F9 ``lastModified`` stamp for deterministic tests (the
    reference stamps ``DateTimeOffset.UtcNow``, PathIndexerFunc.cs:22).

    ``shuffle_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    drain (restored afterwards): every micro-batch rewrites the merged index
    with one file per shuffle partition, so a session-default 200 turns each
    LWW merge into 200 tiny parquet writes.  Size it to the index volume.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        _run_upsert_drain(
            spark, events_dir, schema, path_index_dir, deleted_index_dir,
            checkpoint_dir, now, max_files_per_trigger,
        )
    finally:
        if shuffle_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run_upsert_drain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    path_index_dir: str,
    deleted_index_dir: str,
    checkpoint_dir: str,
    now: str | None,
    max_files_per_trigger: int | None,
) -> None:
    stream = stream_events(spark, events_dir, schema, max_files_per_trigger)
    stamp = F.lit(now).cast("timestamp") if now else F.current_timestamp()

    def handle(batch: DataFrame, _batch_id: int) -> None:
        batch = batch.cache()
        created = batch.where(F.col("eventType") == EVENT_TYPE_BLOB_CREATED)
        deleted = batch.where(F.col("eventType") == EVENT_TYPE_BLOB_DELETED)
        for df, target in ((created, path_index_dir), (deleted, deleted_index_dir)):
            rows = events_to_path_rows(df, now=stamp, seq_col="event_id")
            _merge_batch(batch.sparkSession, rows, target)
        batch.unpersist()

    (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
