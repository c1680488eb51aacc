"""Index DDL from a typed model (S7).

The reference builds search-index schemas from C# record attributes via
``FieldBuilder().Build(typeof(T))`` + ``CreateOrUpdateIndexAsync``
(reference AzureSearchIndexer/Utils.cs:23-44, invoked
SearchIndexerTest/Program.cs:63-65), with per-field capabilities
(key/searchable/filterable/sortable/facetable/analyzer) and an optional
custom analyzer.

Spark mapping (SURVEY §1.4): an index is a table; the capability attributes
ride on ``StructField.metadata``; "searchable with keyword_v2+lowercase
analyzer" becomes a derived normalized column at query time (P8).  DDL is
``CREATE TABLE … USING parquet`` from the StructType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from azuredatalakeindexer_spark.functions.localrel import tiny_df

#: capability keys understood by the reference's field attributes
CAPABILITIES = ("key", "searchable", "filterable", "sortable", "facetable")


def create_index_table(
    spark: SparkSession,
    name: str,
    schema: StructType,
    location: str | None = None,
) -> None:
    """S7: CREATE-or-update an index table from a typed model.

    Equivalent of ``CreateOrUpdateIndexAsync`` (Utils.cs:34-43): idempotent,
    schema taken from the declared model.
    """
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE TABLE IF NOT EXISTS `{name}` ({ddl}) USING parquet{loc}")


def index_field_capabilities(spark: SparkSession, schema: StructType) -> DataFrame:
    """The reflection step of S7 as a relation: one row per field with its
    declared capabilities (PathIndexModel.cs:12-25 attribute surface)."""
    rows = []
    for f in schema.fields:
        md = f.metadata or {}
        rows.append(
            (
                f.name,
                f.dataType.simpleString(),
                *[bool(md.get(c, False)) for c in CAPABILITIES],
                md.get("analyzer"),
            )
        )
    return tiny_df(
        spark,
        rows,
        "field string, type string, is_key boolean, searchable boolean, "
        "filterable boolean, sortable boolean, facetable boolean, analyzer string",
    )
