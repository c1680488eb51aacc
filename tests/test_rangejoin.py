"""Binned range join: boundary semantics, left-outer, plan shape."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
import pytest

from azuredatalakeindexer_spark.operators.rangejoin import range_join_binned


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_range_join_half_open_bounds(spark):
    """[lower, upper) exactly: lower bound inclusive, upper exclusive,
    matches spanning a bin edge are found (the 2-bin left explode)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:59:59.999999")),  # just below lower
            (11, _ts("2024-01-01 10:00:00")),          # == lower → in
            (12, _ts("2024-01-01 10:00:59.999999")),   # last micro → in
            (13, _ts("2024-01-01 10:01:00")),          # == upper → out
        ],
        "rid long, rts timestamp",
    )
    got = {
        r["rid"]
        for r in range_join_binned(
            left, right, "lts", "rts", 0, 60_000_000
        ).collect()
    }
    assert got == {11, 12}


def test_range_join_negative_offsets_and_cross_bin(spark):
    """A [-30s, +30s) window centered on the left row straddles two bins;
    both sides of the boundary must be found."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:01:00"))], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (20, _ts("2024-01-01 10:00:31")),  # 29s before → in
            (21, _ts("2024-01-01 10:01:29")),  # 29s after → in
            (22, _ts("2024-01-01 10:00:29")),  # 31s before → out
            (23, _ts("2024-01-01 10:01:30")),  # +30s == upper → out
        ],
        "rid long, rts timestamp",
    )
    got = {
        r["rid"]
        for r in range_join_binned(
            left, right, "lts", "rts", -30_000_000, 30_000_000
        ).collect()
    }
    assert got == {20, 21}


def test_range_join_integral_axis_negative_values(spark):
    """Integral axes bin exactly (floor toward -inf, not DIV-truncation):
    a negative-valued window still matches correctly."""
    left = spark.createDataFrame([(1, -75), (2, -5), (3, 10)], "lid long, x long")
    right = spark.createDataFrame([(9, -70), (8, -61), (7, 4)], "rid long, y long")
    got = {
        (r["lid"], r["rid"])
        for r in range_join_binned(left, right, "x", "y", 0, 10).collect()
    }
    # x=-75 → [-75,-65): -70 in, -61 out; x=-5 → [-5,5): 4 in; x=10 → [10,20): none
    assert got == {(1, 9), (2, 7)}


def test_range_join_left_outer_and_equi_keys(spark):
    """`how='left'` null-extends matchless rows exactly once (even when the
    exploded left spans two bins), and `on` keys restrict matches."""
    left = spark.createDataFrame(
        [("u1", 1, 100), ("u1", 2, 500), ("u2", 3, 100)],
        "user string, lid long, x long",
    )
    right = spark.createDataFrame(
        [("u1", 9, 105), ("u2", 8, 109), ("u1", 7, 501)],
        "user string, rid long, y long",
    )
    out = range_join_binned(
        left, right, "x", "y", 0, 10, on=["user"], how="left"
    )
    rows = {(r["user"], r["lid"], r["rid"]) for r in out.collect()}
    assert rows == {("u1", 1, 9), ("u1", 2, 7), ("u2", 3, 8)}
    # drop u2's right row → u2 left row must null-extend exactly once
    out2 = range_join_binned(
        left, right.where(F.col("rid") != 8), "x", "y", 0, 10,
        on=["user"], how="left",
    )
    rows2 = sorted((r["lid"], r["rid"]) for r in out2.collect())
    assert rows2 == [(1, 9), (2, 7), (3, None)]


def test_range_join_plan_has_no_allpairs_join(spark):
    """The whole point: with broadcasting disabled, the bin equi-join plans
    as a shuffled join — never BroadcastNestedLoopJoin/CartesianProduct."""
    left = spark.range(100).select(
        F.col("id").alias("lid"), (F.col("id") * 7).alias("x")
    )
    right = spark.range(100).select(
        F.col("id").alias("rid"), (F.col("id") * 11).alias("y")
    )
    with _no_broadcast(spark):
        plan = (
            range_join_binned(left, right, "x", "y", 0, 50)
            ._jdf.queryExecution().executedPlan().toString()
        )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "_bin" in plan  # joined on the manufactured bin key


def test_range_join_rejects_bad_args(spark):
    df = spark.range(1).select(F.col("id"), F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="empty window"):
        range_join_binned(df, df, "id", "id", 10, 10)
    with pytest.raises(ValueError, match="integral"):
        range_join_binned(df, df, "x", "id", 0, 10)


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.saved = [
            self.spark.conf.get(k, None)
            for k in (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
            )
        ]
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        self.spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        for k, v in zip(
            (
                "spark.sql.autoBroadcastJoinThreshold",
                "spark.sql.adaptive.autoBroadcastJoinThreshold",
            ),
            self.saved,
        ):
            if v is None:
                self.spark.conf.unset(k)
            else:
                self.spark.conf.set(k, v)
