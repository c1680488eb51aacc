from azuredatalakeindexer_spark.sources.fixtures import (
    WATERMARK,
    build_blob_events,
    build_deleted_paths,
    build_listing,
    build_path_index,
    load_table,
)
from azuredatalakeindexer_spark.sources.lake import list_lake_paths, read_json_documents

__all__ = [
    "WATERMARK",
    "load_table",
    "build_path_index",
    "build_listing",
    "build_blob_events",
    "build_deleted_paths",
    "list_lake_paths",
    "read_json_documents",
]
