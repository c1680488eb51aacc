"""JSONL / CSV corpus sources with per-row fault isolation.

Real training-data lakes arrive as JSON-Lines and CSV at least as often as
as one-JSON-document-per-file (the reference's shape, handled by
``lake.py::read_json_documents`` — reference
``AzureSearchIndexer/DataLakeWriter.cs:24-46`` writes one JSON blob per
path).  Both readers here follow the same fault-isolation contract as S4:
malformed rows NEVER fail the job — they surface in a ``_corrupt`` column
so the pipeline can count them (A2 metrics) and continue, exactly like the
reference's per-document try/catch.

Scale: both formats are splittable line-oriented text — Spark parallelizes
by byte ranges, so a single 1 TB JSONL file still fans out across the
cluster (unlike the per-file JSON shape, which parallelizes only across
files).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField("_corrupt", StringType(), True)])


def read_jsonl_corpus(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a JSON-Lines corpus: one document per line, PERMISSIVE mode,
    malformed lines captured in ``_corrupt``."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_csv_corpus(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """Read a CSV corpus with the same fault-isolation contract."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("header", str(header).lower())
        .csv(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split: good rows lose the ``_corrupt`` column; bad rows
    carry the raw line for quarantine.  Cache before counting both sides —
    Spark refuses a query that prunes down to only the corrupt column
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so ``bad`` keeps one parsed column
    alongside."""
    good = df.where(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.where(F.col("_corrupt").isNotNull())
    return good, bad
