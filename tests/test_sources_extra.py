"""S7 index DDL, S8 synthetic writer (+O3 shuffle), T5 partitioned runs."""

from __future__ import annotations

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.plans.partitioned import run_partitioned_upserts
from azuredatalakeindexer_spark.schemas import PATH_INDEX_SCHEMA
from azuredatalakeindexer_spark.sources.ddl import (
    create_index_table,
    index_field_capabilities,
)
from azuredatalakeindexer_spark.sources.fixtures import build_path_index, load_table
from azuredatalakeindexer_spark.sources.lake import read_json_documents
from azuredatalakeindexer_spark.sources.synthetic import generate_paths, write_lake
from azuredatalakeindexer_spark.schemas import TEST_INDEX_SCHEMA
from tests.conftest import SF_DIR


def test_index_ddl_idempotent(spark, tmp_path):
    create_index_table(spark, "pytest_path_index", PATH_INDEX_SCHEMA, str(tmp_path / "t"))
    create_index_table(spark, "pytest_path_index", PATH_INDEX_SCHEMA, str(tmp_path / "t"))
    cols = dict(spark.table("pytest_path_index").dtypes)
    assert cols["key"] == "string"
    assert cols["lastModified"].startswith("timestamp")
    spark.sql("DROP TABLE pytest_path_index")


def test_field_capabilities_reflect_metadata(spark):
    caps = {r["field"]: r for r in index_field_capabilities(spark, PATH_INDEX_SCHEMA).collect()}
    assert caps["key"]["is_key"] and caps["key"]["filterable"] and caps["key"]["sortable"]
    assert caps["pathUrlEncoded"]["searchable"]
    assert caps["pathUrlEncoded"]["analyzer"] == "keyword_v2+lowercase"
    assert not caps["filesystem"]["sortable"]


def test_generate_paths_shuffled_deterministic(spark):
    a = [r["path"] for r in generate_paths(spark, 2, 3, 4).collect()]
    b = [r["path"] for r in generate_paths(spark, 2, 3, 4).collect()]
    assert len(a) == 24 and a == b            # seeded shuffle is deterministic
    assert a != sorted(a)                     # but not in generation order (O3)
    assert "partition_1/customer_2/document_3.json" in a


def test_write_lake_roundtrip(spark, tmp_path):
    n = write_lake(spark, str(tmp_path), 2, 2, 2)
    assert n == 8
    docs = read_json_documents(spark, str(tmp_path), TEST_INDEX_SCHEMA, glob="*.json")
    rows = docs.select("path", "stringvalue", "_corrupt_record").collect()
    assert len(rows) == 8
    assert all(r["_corrupt_record"] is None for r in rows)


def test_partitioned_runs_cover_all_partitions(spark):
    pi = build_path_index(load_table(spark, SF_DIR, "orders"))
    empty = spark.createDataFrame([], pi.schema)
    state, counts = run_partitioned_upserts(
        pi, empty, [f"partition_{i}" for i in range(10)]
    )
    assert sum(counts.values()) == pi.count()   # prefixes partition the space
    assert state.count() == pi.count()
    assert state.groupBy("key").count().where(F.col("count") > 1).count() == 0


def test_partitioned_fast_path_equals_sequential_loop(spark):
    """The disjoint-prefix fast path (one tagged scan + one merge, VERDICT
    r4 next-#3) must be row-identical to the reference-shaped sequential
    merge loop, counts included — with a non-empty existing index so the
    anti-join actually removes rows."""
    orders = load_table(spark, SF_DIR, "orders")
    pi = build_path_index(orders)
    existing = build_path_index(orders.where(F.col("o_orderkey") % 3 == 0))
    prefixes = [f"partition_{i}" for i in range(1, 6)]
    fast_state, fast_counts = run_partitioned_upserts(pi, existing, prefixes)
    seq_state, seq_counts = run_partitioned_upserts(
        pi, existing, prefixes, disjoint_prefixes=False
    )
    assert fast_counts == seq_counts
    assert fast_state.exceptAll(seq_state).count() == 0
    assert seq_state.exceptAll(fast_state).count() == 0
