"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer splits than the
    cluster has cores.

    CPU-heavy narrow transforms (shingling, hashing, scoring) inherit the
    scan's partitioning; a small parquet fixture is a single split, which
    would serialize the whole stage on one core.  At 100 TB the input has
    thousands of splits and this is a no-op — the condition guards against
    paying a gratuitous shuffle at scale.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
