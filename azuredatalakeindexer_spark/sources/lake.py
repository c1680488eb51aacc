"""Lake sources: recursive listing (S1), file-content read (S3), JSON parse
(S4).

The reference hand-rolls a parallel BFS over directories with a bounded
work-queue (≤256 concurrent listing calls, reference
DataLakePathClientExtension.cs:24-81) and a per-file download loop (≤128
readers, DataLakeIndexer.cs:66-87).  Spark's file sources already do both at
cluster scale: ``InMemoryFileIndex`` lists directories in parallel across the
driver thread pool / a distributed job
(``spark.sql.sources.parallelPartitionDiscovery.parallelism``), and the
``binaryFile`` / ``json`` readers schedule per-file tasks across executors —
so both operators are declarative reads here, not custom code.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from azuredatalakeindexer_spark.functions.keys import url_encode_path


def list_lake_paths(spark: SparkSession, root: str, glob: str | None = None) -> DataFrame:
    """S1: recursive lake listing → catalog DataFrame.

    Returns ``(path, pathUrlEncoded, isDirectory, fileLastModified, length)``
    for every file under ``root`` (directories are implicit in Spark's file
    index — the reference's ``IsDirectory`` filter P5/DataLakePathClientExtension.cs:51
    is already applied by the source, so ``isDirectory`` is always false
    here; :func:`azuredatalakeindexer_spark.sources.fixtures.build_listing`
    covers the explicit-directory variant).

    Column pruning matters: selecting only metadata columns from the
    ``binaryFile`` source never reads file bodies.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(root)
    rel = F.regexp_replace(F.col("path"), F.lit("^.*?" + root.rstrip("/") + "/"), F.lit(""))
    return df.select(
        rel.alias("path"),
        url_encode_path(rel).alias("pathUrlEncoded"),
        F.lit(False).alias("isDirectory"),
        F.col("modificationTime").alias("fileLastModified"),
        F.col("length"),
    )


def read_file_contents(spark: SparkSession, root: str, glob: str | None = None) -> DataFrame:
    """S3: per-file content read → ``(path, content binary, fileLastModified,
    length)``.

    The reference downloads each blob inside a semaphore-bounded task
    (DataLakeIndexer.cs:82-87); Spark's ``binaryFile`` source is the same
    operation as a distributed scan.
    """
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(root)
    rel = F.regexp_replace(F.col("path"), F.lit("^.*?" + root.rstrip("/") + "/"), F.lit(""))
    return df.select(
        rel.alias("path"),
        F.col("content"),
        F.col("modificationTime").alias("fileLastModified"),
        F.col("length"),
    )


def read_json_documents(
    spark: SparkSession, root: str, schema: StructType, glob: str | None = None
) -> DataFrame:
    """S4: schema-on-read JSON parse with per-row fault isolation.

    The reference deserializes each file against a declared record and maps a
    parse miss to ``null`` → dropped row (IndexMapper.cs:15-28,
    DataLakeIndexer.cs:90-96).  ``PERMISSIVE`` mode + a corrupt-record column
    reproduces that per-row isolation: malformed documents surface as rows
    whose data fields are null and ``_corrupt_record`` is set, which the
    mapper's null-drop (P2) removes while the metrics layer counts them (A2).
    """
    from pyspark.sql.types import StringType, StructField

    # build a fresh StructType — StructType.add mutates the receiver
    full = StructType(list(schema.fields) + [StructField("_corrupt_record", StringType(), True)])
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.json(root)
    rel = F.regexp_replace(
        F.col("_metadata.file_path"), F.lit("^.*?" + root.rstrip("/") + "/"), F.lit("")
    )
    return df.select(rel.alias("path"), "*").drop("_metadata")
