"""End-to-end: a real JSON lake directory → listing (S1), content read (S3),
schema-on-read parse with fault isolation (S4), the J1 join, the mapper
(P1/P2), and the full §3.1 indexer plan with metrics (A1-A3)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from azuredatalakeindexer_spark.operators.paths import ListPathsOptions
from azuredatalakeindexer_spark.plans.indexer import run_document_indexer
from azuredatalakeindexer_spark.schemas import TEST_INDEX_SCHEMA
from azuredatalakeindexer_spark.sources.lake import (
    list_lake_paths,
    read_json_documents,
)


@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    """A small synthetic lake mirroring DataLakeWriter.cs:13-27: JSON docs at
    partition_{i}/customer_{j}/document_{k}.json plus one malformed file."""
    root = tmp_path_factory.mktemp("lake")
    n = 0
    for p in range(2):
        for c in range(3):
            for d in range(4):
                f = root / f"partition_{p}" / f"customer_{c}"
                f.mkdir(parents=True, exist_ok=True)
                payload = {"stringvalue": f"doc {p}-{c}-{d}", "numbervalue": n, "booleanvalue": n % 2 == 0}
                (f / f"document_{d}.json").write_text(json.dumps(payload))
                n += 1
    (root / "partition_0" / "broken.json").write_text("{not valid json")
    return str(root)


def test_list_lake_paths(spark, lake):
    paths = list_lake_paths(spark, lake, glob="*.json")
    rows = paths.collect()
    assert len(rows) == 25  # 24 docs + 1 broken
    sample = {r["path"] for r in rows}
    assert "partition_0/customer_0/document_0.json" in sample
    enc = {r["pathUrlEncoded"] for r in rows}
    assert "partition_0%2fcustomer_0%2fdocument_0.json" in enc


def test_read_json_documents_fault_isolation(spark, lake):
    docs = read_json_documents(spark, lake, TEST_INDEX_SCHEMA)
    # NB: Spark refuses scans whose only referenced column (after pruning) is
    # the corrupt-record column, so collect the full rows and split in Python
    rows = docs.select("path", "stringvalue", "_corrupt_record").collect()
    ok = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(ok) == 24
    assert len(bad) == 1  # per-row isolation, run does not abort (A2)
    assert bad[0]["path"] == "partition_0/broken.json"


def test_metadata_listing_does_not_read_content(spark, lake):
    paths = list_lake_paths(spark, lake)
    plan = paths._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan.lower().split("readschema")[-1][:200]


def test_full_indexer_run(spark, lake):
    paths = list_lake_paths(spark, lake, glob="*.json")
    from azuredatalakeindexer_spark.operators.mapper import listing_to_path_rows

    path_index = listing_to_path_rows(
        paths.select(
            F.col("path").alias("name"),
            F.col("isDirectory"),
            F.col("fileLastModified").alias("lastModified"),
        ),
        now=F.lit("2024-06-01").cast("timestamp"),
    )
    existing = spark.createDataFrame([], "pathbase64 string, stringvalue string, numbervalue int, booleanvalue boolean, eTag string, pathUrlEncoded string, lastModified timestamp")
    res = run_document_indexer(
        spark,
        path_index,
        lake,
        existing,
        ListPathsOptions(),
    )
    assert res.paths_count == 25
    assert res.document_read_count == 25
    assert res.document_read_failed_count == 1
    assert res.processed_count == 24
    assert res.created_count == 24  # empty existing index → all created
    assert res.modified_count == 0
    assert res.failed_too_large_count == 0
    assert res.merged.count() == 24
    # re-run against the merged state → everything is a modify now
    res2 = run_document_indexer(
        spark, path_index, lake, res.merged, ListPathsOptions()
    )
    assert res2.created_count == 0
    assert res2.modified_count == 24
