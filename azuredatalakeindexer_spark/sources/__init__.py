from azuredatalakeindexer_spark.sources.fixtures import (
    WATERMARK,
    build_blob_events,
    build_deleted_paths,
    build_listing,
    build_path_index,
    load_table,
)
from azuredatalakeindexer_spark.sources.bucketed import colocated_join, write_bucketed, write_range_sorted
from azuredatalakeindexer_spark.sources.lake import list_lake_paths, read_json_documents
from azuredatalakeindexer_spark.sources.ddl import create_index_table, index_field_capabilities
from azuredatalakeindexer_spark.sources.synthetic import generate_paths, write_lake
from azuredatalakeindexer_spark.sources.text_corpus import (
    read_csv_corpus,
    read_jsonl_corpus,
    split_corrupt,
)

__all__ = [
    "colocated_join",
    "write_bucketed",
    "write_range_sorted",
    "create_index_table",
    "index_field_capabilities",
    "generate_paths",
    "write_lake",
    "WATERMARK",
    "load_table",
    "build_path_index",
    "build_listing",
    "build_blob_events",
    "build_deleted_paths",
    "list_lake_paths",
    "read_json_documents",
    "read_jsonl_corpus",
    "read_csv_corpus",
    "split_corrupt",
]
