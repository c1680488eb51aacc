"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the same settings are the ones that matter
on a real cluster: AQE for runtime re-planning and skew-join handling,
partition-size-driven scan splits, UTC session time, and Arrow for the few
Pandas-UDF code paths (multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "adls-indexer", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: coalesce tiny shuffle partitions, split skewed ones at runtime.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # One shuffle partition per core locally; a cluster would use 2-3x cores.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet scan pushdown is on by default; pin it explicitly since the
        # engine's incremental-watermark semantics rely on it (SURVEY §4).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
