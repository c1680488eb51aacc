from azuredatalakeindexer_spark.plans.indexer import IndexerResult, run_document_indexer

__all__ = ["run_document_indexer", "IndexerResult"]
