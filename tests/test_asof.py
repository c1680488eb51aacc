"""As-of join: boundary semantics + plan shape (no inequality-join blowup)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_backward_inclusive_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01 10:00:00")),   # before any right → null
            (2, "a", _ts("2024-01-01 11:00:00")),   # exact tie → matches 11:00
            (3, "a", _ts("2024-01-01 11:30:00")),   # between → still 11:00
            (4, "a", _ts("2024-01-01 12:30:00")),   # after second → 12:00
            (5, "b", _ts("2024-01-01 23:00:00")),   # other key, own timeline
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 11:00:00"), 100),
            ("a", _ts("2024-01-01 12:00:00"), 200),
            ("b", _ts("2024-01-01 22:00:00"), 300),
        ],
        "k string, ts timestamp, state long",
    )
    out = {
        r["event_id"]: r["state_asof"]
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out == {1: None, 2: 100, 3: 100, 4: 200, 5: 300}


def test_asof_join_plan_is_single_shuffle_union(spark):
    """The plan is union + window — no BroadcastNestedLoopJoin, no
    CartesianProduct, exactly one hash exchange on the keys."""
    left = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    right = spark.range(20).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_seconds(F.col("id") * 300).alias("ts"),
        F.col("id").alias("state"),
    )
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
