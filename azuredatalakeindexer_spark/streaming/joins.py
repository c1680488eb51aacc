"""Watermarked stream-stream interval join (event attribution).

The canonical Structured Streaming join shape: two event streams (here two
filtered views of ONE file stream — Spark plans it as a self-join of the
source), both watermarked, joined on an equality key plus a TIME-RANGE
constraint.  The range bound is what makes the state finite: a left row can
be evicted once the watermark passes ``left.ts + within`` because no future
right row can match it, and symmetric reasoning bounds the right buffer —
without the bound, both sides' state grows forever.

Inner joins emit eagerly (a match is output in the micro-batch where the
second side arrives), so drain completeness does not depend on sentinel
batches the way append-mode window aggregation does
(:mod:`azuredatalakeindexer_spark.streaming.windowed`); the watermark's job
here is state eviction and late-row dropping only.  With chronological
arrival (event time ≈ arrival order) and any positive delay, no match is
lost: a right row matching a left row up to ``within`` earlier finds the
left row still buffered, because eviction needs the watermark to pass
``left.ts + within`` and the watermark trails the right row's own event
time by ``delay``.

At 100 TB this is the attribution path of a clickstream pipeline: state is
bounded by (events inside the watermark horizon × key cardinality), joined
state lives in the state store partitioned by the equality key, and the
only tuning knobs are the horizon (``within`` + ``delay``) and the state
partition count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession
from pyspark.sql.types import StructType


def run_stream_interval_join(
    spark: SparkSession,
    events_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    left_type: str = "view",
    right_type: str = "click",
    within: str = "6 hours",
    watermark_delay: str = "30 minutes",
    max_files_per_trigger: int | None = 3,
    state_partitions: int | None = None,
    join_type: str = "inner",
) -> None:
    """One availableNow drain joining ``left_type`` events to same-user
    ``right_type`` events in ``[left.ts, left.ts + within)``, append mode.

    Output rows: ``(view_id, click_id, user_id, view_ts, click_ts,
    delay_s)``.  ``state_partitions`` pins ``spark.sql.shuffle.partitions``
    for the drain (restored afterwards) — the join state store creates one
    directory per shuffle partition at first checkpoint, so size it to the
    key cardinality, not the session default.

    ``join_type="left_outer"`` additionally emits each unmatched left row
    (null right columns) — but only once the watermark passes
    ``left.ts + within``, because until then a matching right row could
    still arrive.  Like append-mode window aggregation, that emission needs
    a LATER micro-batch after the watermark advances, so harnesses close
    tail windows with far-future sentinel rows and a second drain.  The
    sentinels must carry the real ``left_type``/``right_type`` event types:
    each side's watermark is tracked AFTER its type filter, so a row of a
    type that is filtered out advances neither side (and the global
    watermark is the MIN of both sides under the default
    ``multipleWatermarkPolicy``).  They must also carry a NON-NULL join
    key: the key equality makes Catalyst infer ``isnotnull(key)`` and push
    it below the watermark node, so a null-key sentinel is silently
    filtered before it can advance anything — use an impossible non-null
    key instead.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(events_dir)
        left = (
            stream.where(F.col("event_type") == left_type)
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", watermark_delay)
        )
        right = (
            stream.where(F.col("event_type") == right_type)
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", watermark_delay)
        )
        joined = left.join(
            right,
            F.expr(
                "v_user = c_user AND click_ts >= view_ts "
                f"AND click_ts < view_ts + INTERVAL {within}"
            ),
            join_type,
        ).select(
            "view_id",
            "click_id",
            F.col("v_user").alias("user_id"),
            "view_ts",
            "click_ts",
            (
                F.unix_timestamp("click_ts") - F.unix_timestamp("view_ts")
            ).alias("delay_s"),
        )
        (
            joined.writeStream.format("parquet")
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
