"""Watermarked event-time window aggregation, drained to batch parity.

The standard Structured Streaming shape: ``withWatermark`` + ``window()``
groupBy, append-mode file sink — state for a window is emitted exactly once,
when the watermark passes its end, and late events beyond the watermark are
dropped.

Parity with the batch aggregation therefore depends on ARRIVAL ORDER, not
just on draining: if files arrive shuffled in event time, everything behind
the first batch's max timestamp minus the delay is "late" and silently
dropped — the correct production behavior, and exactly what the test
harness must not do by accident.  The oracle-gated query
(``stream_windowed_counts``) feeds files in chronological slices (the
realistic arrival pattern: event time ≈ arrival order) with the watermark
delay far smaller than a slice, so no event is late, and closes the tail
windows with far-future sentinel rows — after which the emitted output must
EQUAL the batch per-hour aggregation row-for-row.

At scale this is the kappa-architecture path of `events_hourly`: same
logical agg, incremental state, bounded by (windows in flight × groups).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

#: event_type used by harnesses to advance the watermark past the real data
SENTINEL_TYPE = "__sentinel"


def run_stream_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    max_files_per_trigger: int | None = 1,
    state_partitions: int | None = None,
) -> None:
    """One availableNow drain of the event files into hourly (window_start,
    event_type, n) rows, append mode.  Call again after adding newer files
    to flush windows the advancing watermark has since closed.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the drain
    (restored afterwards).  The state store creates one directory per shuffle
    partition at first checkpoint; a session-default 200 means every
    micro-batch commits 200 state files regardless of data volume.  Size it
    to the real group cardinality — standard streaming-job tuning, and the
    dominant cost at small scale."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        _run_drain(
            spark, events_dir, schema, out_dir, checkpoint_dir,
            window_duration, watermark_delay, max_files_per_trigger,
        )
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def _run_drain(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str,
    watermark_delay: str,
    max_files_per_trigger: int | None,
) -> None:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    agg = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    max_files_per_trigger: int | None = 3,
    state_partitions: int | None = None,
) -> None:
    """Streaming sessionization: ``session_window`` with an inactivity gap
    over the watermarked event stream, append mode — the streaming twin of
    the batch ``events_sessionize`` query.

    Session state MERGES across micro-batches (an event inside an open
    session's gap extends it, even if the session started many batches
    ago); a session emits exactly once, when the watermark passes its end
    (last event + gap).  Same drain/sentinel mechanics as the windowed
    aggregation above — and the same chronological-arrival requirement,
    since an event older than the watermark is dropped rather than merged.
    State is one (user, open-session) row regardless of session length, so
    at 100 TB state ∝ concurrently-active users, not history.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(events_dir)
        agg = (
            stream.withWatermark("ts", watermark_delay)
            .groupBy(F.session_window(F.col("ts"), gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                "n_events",
            )
        )
        (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
