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


def test_watermark_drops_late_events_and_flushes_on_advance(spark, tmp_path):
    """Append-mode watermarked window agg: an event arriving after the
    watermark passed its window is DROPPED (correct production semantics);
    windows flush only when a later batch's watermark passes their end."""
    import os
    from datetime import datetime

    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.streaming.windowed import run_stream_windowed_counts

    d = str(tmp_path / "ev"); os.makedirs(d)

    def add(rows, i):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
        tmp = str(tmp_path / f"s{i}")
        df.coalesce(1).write.parquet(tmp)
        import glob, shutil
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(d, f"f{i:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    t = lambda s: datetime.fromisoformat(s)
    add([(1, t("2024-01-01 10:10:00"), "a")], 0)
    add([(2, t("2024-01-01 14:00:00"), "a")], 1)   # watermark -> 13:30 …
    add([(3, t("2024-01-01 10:20:00"), "a")], 2)   # … but propagates with a
    # one-batch lag, so event 3 is still absorbed (watermark seen: 09:40)
    add([(4, t("2024-01-01 10:25:00"), "a")], 3)   # NOW late -> dropped
    out = str(tmp_path / "out"); ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(d).schema
    run_stream_windowed_counts(spark, d, schema, out, ckpt, watermark_delay="30 minutes")
    add([(5, t("2024-01-02 00:00:00"), "z")], 4)   # flush batch
    run_stream_windowed_counts(spark, d, schema, out, ckpt, watermark_delay="30 minutes")

    rows = {
        (r["window_start"].isoformat(), r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # events 1+3 counted; the later-arriving late event 4 is NOT
    assert rows[("2024-01-01T10:00:00", "a")] == 2
    assert rows[("2024-01-01T14:00:00", "a")] == 1


def test_stream_sessions_merge_across_micro_batches(spark, tmp_path):
    """An event arriving in a LATER micro-batch inside the gap extends the
    open session (one merged row); beyond the gap it starts a new one."""
    import glob
    import os
    import shutil

    from azuredatalakeindexer_spark.streaming.windowed import run_stream_sessionize

    d = os.path.join(str(tmp_path), "ev")
    os.makedirs(d)
    files = [
        [(1, "2024-06-01 10:00:00", 7)],
        [(2, "2024-06-01 10:10:00", 7),   # +10 min: merges into session 1
         (3, "2024-06-01 11:00:00", 7)],  # +50 min: new session
        [(-1, "2024-06-02 10:00:00", -1)],  # sentinels close the tail
        [(-2, "2024-06-02 13:00:00", -1)],
    ]
    for i, rs in enumerate(files):
        df = spark.createDataFrame(
            rs, "event_id long, ts string, user_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        tmp = os.path.join(str(tmp_path), f"w{i}")
        df.coalesce(1).write.parquet(tmp)
        dst = os.path.join(d, f"f{i}.parquet")
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    out = os.path.join(str(tmp_path), "out")
    ck = os.path.join(str(tmp_path), "ck")
    schema = spark.read.parquet(d).schema
    run_stream_sessionize(
        spark, d, schema, out, ck, max_files_per_trigger=1, state_partitions=2
    )
    got = {
        (r["user_id"], str(r["session_start"]), r["n_events"])
        for r in spark.read.parquet(out).where(F.col("user_id") >= 0).collect()
    }
    assert got == {
        (7, "2024-06-01 10:00:00", 2),
        (7, "2024-06-01 11:00:00", 1),
    }
