"""Synthetic lake writer (S8) — the reference's test-corpus generator.

``DataLakeWriter`` (reference SearchIndexerTest/DataLakeWriter.cs:13-70)
generates the 3-level hierarchy ``partition_{i}/customer_{j}/document_{k}.json``
(GeneratePaths, cs:13-21), shuffles the write order with a random sort key
(cs:18 — O3), and writes identical ``TestIndexModel`` JSON payloads with
bounded parallelism (cs:24-46 short docs, cs:49-70 long docs).

Spark shape: generate the cross product as a DataFrame (``sequence`` +
``explode`` — no driver-side loops), shuffle with ``orderBy(rand(seed))``,
and let ``df.write`` provide the parallelism the reference hand-manages with
its 300-way semaphore.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from azuredatalakeindexer_spark.functions.keys import path_interpolate

#: long filler text analog (reference TextStuff.cs:5-422)
LONG_TEXT = "spark filler text for the longer synthetic documents " * 20


def generate_paths(
    spark: SparkSession, l1: int, l2: int, l3: int, seed: int = 42
) -> DataFrame:
    """GeneratePaths(l1, l2, l3) (DataLakeWriter.cs:13-21): the shuffled cross
    product of partition × customer × document paths (O3: ``orderBy(rand)``
    replaces ``OrderBy(Guid.NewGuid())``, deterministic under a seed)."""
    def axis(n: int, name: str):
        return F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias(name)

    df = (
        spark.range(1)
        .select(axis(l1, "p"))
        .select("p", axis(l2, "c"))
        .select("p", "c", axis(l3, "d"))
    )
    return df.select(
        path_interpolate(F.col("p"), F.col("c"), F.col("d")).alias("path")
    ).orderBy(F.rand(seed))


def write_lake(
    spark: SparkSession,
    root: str,
    l1: int,
    l2: int,
    l3: int,
    long_text: bool = False,
    seed: int = 42,
) -> int:
    """WriteStuff / WriteLongerStuff (DataLakeWriter.cs:24-70): one JSON doc
    per generated path.

    Uses Spark's partitioned text writer for the payloads; the directory
    layout mirrors the lake (one file per path, exercising S1/S3 readers).
    Returns the number of documents written.
    """
    paths = generate_paths(spark, l1, l2, l3, seed)
    payload = F.to_json(
        F.struct(
            (F.lit(LONG_TEXT) if long_text else F.concat(F.lit("stuff "), F.col("path"))).alias("stringvalue"),
            F.monotonically_increasing_id().cast("int").alias("numbervalue"),
            (F.monotonically_increasing_id() % 2 == 0).alias("booleanvalue"),
        )
    )
    return _write_files(paths.select("path", payload.alias("doc")), root)


def write_document_lake(lake: DataFrame, root: str) -> int:
    """Materialize a :func:`azuredatalakeindexer_spark.sources.fixtures.build_document_lake`
    frame as real files under ``root`` — the S3/S4 readers then scan a real
    directory tree, malformed payloads included."""
    return _write_files(lake.select("path", F.col("payload").alias("doc")), root)


def _write_files(rows_df: DataFrame, root: str) -> int:
    """Write (path, doc) rows as files, one task per partition.

    ``foreachPartition`` writes from the executors in parallel (paths are
    distinct, ``makedirs(exist_ok=True)`` is concurrency-safe), which is
    what makes the §3.1 end-to-end harness affordable at bench scale —
    the previous driver-side ``collect()`` loop wrote one file at a time.
    Local-mode fixture generator (the reference's console harness role,
    DataLakeWriter.cs:24-46): on a multi-executor cluster ``root`` must be
    a shared filesystem or the lake lands on executor-local disks.
    """

    def write_batches(batches):
        import os

        import pandas as pd

        for pdf in batches:
            for path, doc in zip(pdf["path"], pdf["doc"]):
                full = os.path.join(root, path)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                with open(full, "w") as fh:
                    fh.write(doc)
            yield pd.DataFrame({"n": [len(pdf)]})

    # mapInPandas, not foreachPartition: Arrow batch transfer instead of
    # row-at-a-time pickling, and the per-batch counts make the write a
    # single pass (no second count() evaluation)
    counted = rows_df.select("path", "doc").mapInPandas(write_batches, "n long")
    total = counted.agg(F.sum("n").alias("n")).collect()[0]["n"]
    return int(total or 0)
