"""SQL surface + keyset page iterator."""

from __future__ import annotations

from azuredatalakeindexer_spark.operators.paths import (
    ListPathsOptions,
    iterate_pages,
    list_paths,
)
from azuredatalakeindexer_spark.sql import register_views
from azuredatalakeindexer_spark.sources.fixtures import build_path_index, load_table
from tests.conftest import SF_DIR


def test_register_views_and_sql(spark):
    names = register_views(spark, SF_DIR)
    assert "path_index" in names
    n = spark.sql("SELECT count(*) AS n FROM path_index").collect()[0]["n"]
    assert n == spark.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
    changed = spark.sql(
        "SELECT count(*) AS n FROM path_index "
        "WHERE lastModified >= TIMESTAMP '1998-07-01' AND filesystem = 'stuff-large'"
    ).collect()[0]["n"]
    assert 0 < changed < n
    joined = spark.sql(
        "SELECT count(*) AS n FROM path_index p "
        "LEFT ANTI JOIN deleted_paths d ON p.key = d.key"
    ).collect()[0]["n"]
    assert joined < n


def test_iterate_pages_covers_everything_once(spark):
    pi = build_path_index(load_table(spark, SF_DIR, "orders"))
    opts = ListPathsOptions(filesystem="stuff-large")
    pages = list(iterate_pages(pi, opts, page_size=300))
    keys = [r["key"] for page in pages for r in page]
    assert all(len(p) <= 300 for p in pages)
    expected = [r["key"] for r in list_paths(pi, opts).collect()]
    assert keys == expected  # same rows, same total order, no dupes/gaps
