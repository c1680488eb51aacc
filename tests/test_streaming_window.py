"""Event-time windowed aggregation with watermark — the Structured Streaming
idiom that replaces the reference's batch-style watermark carry (T4) when
true stream aggregation is wanted (SURVEY §2.9 mapping note).

Late events beyond the watermark are dropped; on-time events aggregate into
tumbling windows.  Run with availableNow over the fixture events.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR


def test_windowed_agg_with_watermark(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "ts", "event_type", "value")
    src = os.path.join(str(tmp_path), "events")
    ev.repartition(2).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out_dir = os.path.join(str(tmp_path), "out")
    ck = os.path.join(str(tmp_path), "ck")
    (
        agg.select(F.col("w.start").alias("hour"), "event_type", "n")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out_dir)
    # append mode emits only windows sealed by the watermark; compare those
    # against the batch ground truth for the same windows
    truth = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got_rows = {(r["hour"], r["event_type"]): r["n"] for r in got.collect()}
    truth_rows = {(r["hour"], r["event_type"]): r["n"] for r in truth.collect()}
    assert got_rows, "stream produced no sealed windows"
    for k, n in got_rows.items():
        assert truth_rows[k] == n  # every sealed window matches batch truth
