"""Bucketed table layout: shuffle-free co-located joins for the hot keys.

At 100 TB the path index and the data index are joined on ``key`` every
incremental run (J3 classify, S6 merge).  Writing both sides bucketed on
the join key removes the per-run shuffle entirely: Spark's bucketed scan
exposes ``HashPartitioning(key, n)`` to the planner, so a SortMergeJoin of
two same-bucketed tables has ZERO Exchange operators — the join cost
becomes a local sort per bucket, amortized to nothing if the writer also
``sortBy``-s the bucket files.

This is the standing-infrastructure complement to the per-query plans:
`merge_upsert` / `classify_upserts` keep their broadcast-vs-shuffle
switches for ad-hoc inputs, and tables written via :func:`write_bucketed`
make the shuffled path free for the recurring pipeline.

Spark bucketing requires the table catalog (``saveAsTable``); callers own
the warehouse location via the session's ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "key",
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and bucket-sorted) on
    ``bucket_col``.

    ``n_buckets`` should match the downstream join parallelism (a divisor/
    multiple of ``spark.sql.shuffle.partitions`` keeps AQE happy).  Both
    sides of a recurring join must use the SAME ``n_buckets`` for the
    exchange-free plan.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_col: str,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Totally-ordered parquet layout: range-partition on ``sort_col`` then
    sort within partitions — file i holds keys entirely below file i+1.

    This is how the path index earns its SCALE.md claims: with the table
    range-laid-out on ``lastModified``, the incremental watermark predicate
    (P6) prunes whole files via parquet min/max, and the ``orderBy(key)``
    O1 contract is satisfied by concatenating files in order instead of a
    global sort at read time.  A global ``orderBy().write`` would funnel
    through one task chain; ``repartitionByRange`` samples split points and
    keeps all ``n_files`` writers parallel.
    """
    (
        df.repartitionByRange(n_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .parquet(path)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "key",
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket column.

    With both tables bucketed on ``on`` into the same bucket count, the
    plan contains no Exchange (verified by
    ``tests/test_bucketed.py::test_bucketed_join_has_no_exchange``) — the
    scan's bucketing IS the join partitioning.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
