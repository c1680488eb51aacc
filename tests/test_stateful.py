"""applyInPandasWithState: per-key version tracking over the event stream."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.mapper import events_to_path_rows
from azuredatalakeindexer_spark.sources.fixtures import build_blob_events, load_table
from azuredatalakeindexer_spark.streaming.stateful import track_path_versions
from tests.conftest import SF_DIR


def test_stateful_version_tracking(spark, tmp_path):
    ev = build_blob_events(load_table(spark, SF_DIR, "events"))
    created = ev.where(F.col("eventType") == "Microsoft.Storage.BlobCreated")
    src = os.path.join(str(tmp_path), "events")
    created.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    rows = events_to_path_rows(stream, now=F.lit("2024-06-01").cast("timestamp"))
    out = track_path_versions(rows)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("versions")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last update per key (several micro-batches may each emit one)
    emitted = spark.sql(
        "SELECT key, max_by(versions, versions) AS versions, max(lastSeen) AS lastSeen "
        "FROM versions GROUP BY key"
    )
    got = {r["key"]: (r["versions"], r["lastSeen"]) for r in emitted.collect()}

    truth_rows = events_to_path_rows(
        created, now=F.lit("2024-06-01").cast("timestamp")
    ).groupBy("key").agg(
        F.count(F.lit(1)).alias("versions"), F.max("fileLastModified").alias("lastSeen")
    )
    truth = {r["key"]: (r["versions"], r["lastSeen"]) for r in truth_rows.collect()}

    assert got == truth  # state across micro-batches == batch ground truth
