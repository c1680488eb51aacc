"""Upsert/MERGE semantics (W1, J3, S6, A1, J2) against hand-computed truths."""

from __future__ import annotations

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.deletes import apply_deletes
from azuredatalakeindexer_spark.operators.upsert import (
    classify_upserts,
    dedup_last_writer,
    merge_upsert,
    upsert_status_counts,
)


def test_dedup_last_writer_newest_wins(spark):
    df = spark.createDataFrame(
        [
            ("k1", "2024-01-01 00:00:00", 1),
            ("k1", "2024-01-02 00:00:00", 2),
            ("k2", "2024-01-01 00:00:00", 3),
        ],
        "key string, lastModified string, seq long",
    ).withColumn("lastModified", F.col("lastModified").cast("timestamp"))
    out = dedup_last_writer(df, ["key"], "lastModified", tiebreak_col="seq")
    got = {r["key"]: r["seq"] for r in out.collect()}
    assert got == {"k1": 2, "k2": 3}


def test_dedup_tiebreak_on_seq(spark):
    # same timestamp → higher sequencer wins (batch-split invariance)
    df = spark.createDataFrame(
        [("k1", "2024-01-01 00:00:00", 1), ("k1", "2024-01-01 00:00:00", 2)],
        "key string, lastModified string, seq long",
    ).withColumn("lastModified", F.col("lastModified").cast("timestamp"))
    out = dedup_last_writer(df, ["key"], "lastModified", tiebreak_col="seq")
    assert [r["seq"] for r in out.collect()] == [2]


def test_classify_and_counts(spark):
    existing = spark.createDataFrame([("a",), ("b",)], "key string")
    batch = spark.createDataFrame([("b",), ("c",), ("d",)], "key string")
    classified = classify_upserts(batch, existing)
    got = {r["key"]: r["status"] for r in classified.collect()}
    assert got == {"b": 200, "c": 201, "d": 201}  # 200=modified, 201=created
    counts = upsert_status_counts(classified).collect()[0]
    assert (counts["created"], counts["modified"], counts["failed"]) == (2, 1, 0)


def test_merge_upsert_state(spark):
    existing = spark.createDataFrame([("a", 1), ("b", 1)], "key string, v int")
    batch = spark.createDataFrame([("b", 2), ("c", 2)], "key string, v int")
    out = merge_upsert(existing, batch)
    got = {r["key"]: r["v"] for r in out.collect()}
    assert got == {"a": 1, "b": 2, "c": 2}  # b replaced, c inserted, a kept


def test_merge_upsert_shuffled_fallback_plan(spark):
    # rebuild-sized batches must NOT force a broadcast: with
    # broadcast_batch_keys=False the anti-join is a shuffled join
    # (SortMergeJoin / ShuffledHashJoin), never BroadcastHashJoin.
    existing = spark.range(0, 1000).select(F.concat(F.lit("k"), "id").alias("key"))
    batch = spark.range(500, 1500).select(F.concat(F.lit("k"), "id").alias("key"))
    # pin auto-broadcast off so the plan shape reflects the flag, not the
    # tiny test input sizes
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        out = merge_upsert(existing, batch, broadcast_batch_keys=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
        assert out.count() == 1500
        # the default path still broadcasts (F.broadcast hint overrides the
        # disabled threshold) — the incremental micro-batch case
        plan_bc = (
            merge_upsert(existing, batch)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan_bc, plan_bc
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_apply_deletes_anti_join(spark):
    idx = spark.createDataFrame([("a",), ("b",), ("c",)], "key string")
    deleted = spark.createDataFrame([("b",), ("zzz",)], "key string")
    out = apply_deletes(idx, deleted)
    assert sorted(r["key"] for r in out.collect()) == ["a", "c"]


def test_apply_deletes_honors_recreation(spark):
    idx = spark.createDataFrame(
        [("a", "2024-01-05 00:00:00"), ("b", "2024-01-01 00:00:00")],
        "key string, fileLastModified string",
    ).withColumn("fileLastModified", F.col("fileLastModified").cast("timestamp"))
    deleted = spark.createDataFrame(
        [("a", "2024-01-02 00:00:00"), ("b", "2024-01-02 00:00:00")],
        "key string, fileLastModified string",
    ).withColumn("fileLastModified", F.col("fileLastModified").cast("timestamp"))
    out = apply_deletes(idx, deleted, honor_timestamps=True)
    # a was re-created after its delete → survives; b was not → removed
    assert [r["key"] for r in out.collect()] == ["a"]


def test_salted_counts_match_direct_and_have_two_exchanges(spark):
    """Salted two-phase counts equal the direct groupBy count; the plan has
    the (key,salt) + (key) exchange pair."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.skew import salted_agg, salted_counts

    # heavy skew: one key owns 90% of rows
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    direct = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["n"] for r in salted_counts(df, ["k"]).collect()}
    assert salted == direct

    plan = salted_counts(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2

    # a second algebraic aggregate through the generic two-phase helper
    mins = salted_agg(df, ["k"], {"m": F.min("v")}, {"m": F.min("m")})
    direct_min = {r["k"]: r["min(v)"] for r in df.groupBy("k").agg(F.min("v")).collect()}
    assert {r["k"]: r["m"] for r in mins.collect()} == direct_min
