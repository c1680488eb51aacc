"""Bucketed-table co-located joins: the recurring-pipeline shuffle killer."""

from __future__ import annotations

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.sources.bucketed import colocated_join, write_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    """Two tables bucketed on the join key into the same bucket count join
    with ZERO Exchange operators (and produce correct results)."""
    left = spark.range(0, 2000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("key"), (F.col("id") * 3).alias("b")
    )
    # disable auto-broadcast so the planner actually considers the shuffle
    # it would need without bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(left, "t_bucketed_left", "key", n_buckets=8)
        write_bucketed(right, "t_bucketed_right", "key", n_buckets=8)
        joined = colocated_join(spark, "t_bucketed_left", "t_bucketed_right", "key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        rows = joined.count()
        assert rows == 1000
        # sanity: the same join WITHOUT bucketing does need exchanges
        unbucketed = left.join(right, "key")
        plan2 = unbucketed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_left")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_right")
