"""SQL surface: register the engine's logical tables as temp views so every
operator is reachable from ``spark.sql`` (the DataFrame API and SQL are the
same Catalyst plans).

    from azuredatalakeindexer_spark.sql import register_views
    register_views(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT * FROM path_index WHERE lastModified >= '1998-07-01'")
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from azuredatalakeindexer_spark.sources.fixtures import (
    TABLES,
    build_blob_events,
    build_deleted_paths,
    build_listing,
    build_path_index,
    load_table,
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create temp views for the raw fixture tables and the derived
    reference tables.  Returns the view names registered."""
    names: list[str] = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    build_path_index(orders).createOrReplaceTempView("path_index")
    build_listing(orders).createOrReplaceTempView("lake_listing")
    build_blob_events(events).createOrReplaceTempView("blob_events")
    build_deleted_paths(orders).createOrReplaceTempView("deleted_paths")
    names += ["path_index", "lake_listing", "blob_events", "deleted_paths"]
    return names
