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


def test_range_sorted_layout_files_are_disjoint_and_prunable(spark, tmp_path):
    """write_range_sorted produces files whose key ranges don't overlap
    (file-level min/max pruning works) and whose rows are sorted within
    each file; a selective range read scans a strict subset of files."""
    from azuredatalakeindexer_spark.sources.bucketed import write_range_sorted

    df = spark.range(0, 10000).select(
        (F.col("id") * 37 % 10007).alias("k"), F.col("id").alias("v")
    )
    path = str(tmp_path / "sorted")
    write_range_sorted(df, path, "k", n_files=8)

    per_file = (
        spark.read.parquet(path)
        .select("k", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert len(per_file) == 8
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2          # disjoint ranges -> min/max pruning prunes files
    assert spark.read.parquet(path).count() == 10000


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """Z-order clustering gives every file a small (a, b) rectangle, so
    min/max pruning works on BOTH columns; single-column range sorting
    bounds only its own column (the control)."""
    from azuredatalakeindexer_spark.functions.zorder import write_zordered
    from azuredatalakeindexer_spark.sources.bucketed import write_range_sorted

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") % 128).alias("a"), ((F.col("id") * 37) % 128).alias("b")
    )

    def mean_spans(path):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg(
                (F.max("a") - F.min("a")).alias("sa"),
                (F.max("b") - F.min("b")).alias("sb"),
            )
            .collect()
        )
        sa = sum(r["sa"] for r in per_file) / len(per_file)
        sb = sum(r["sb"] for r in per_file) / len(per_file)
        return sa, sb

    zp = str(tmp_path / "z")
    write_zordered(df, zp, "a", "b", bits=7, n_files=16)
    sa_z, sb_z = mean_spans(zp)

    rp = str(tmp_path / "r")
    write_range_sorted(df, rp, "a", n_files=16)
    sa_r, sb_r = mean_spans(rp)

    # z-order: both dimensions bounded well below the global span of 127
    assert sa_z < 64 and sb_z < 64, (sa_z, sb_z)
    # control: single-column sort nails a but leaves b unbounded
    assert sa_r < sa_z
    assert sb_r > 100
    assert spark.read.parquet(zp).count() == n
