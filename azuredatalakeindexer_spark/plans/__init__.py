from azuredatalakeindexer_spark.plans.corpus import build_training_corpus
from azuredatalakeindexer_spark.plans.indexer import IndexerResult, run_document_indexer
from azuredatalakeindexer_spark.plans.partitioned import run_partitioned_upserts

__all__ = [
    "build_training_corpus",
    "run_document_indexer",
    "IndexerResult",
    "run_partitioned_upserts",
]
