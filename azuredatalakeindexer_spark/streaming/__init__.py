from azuredatalakeindexer_spark.streaming.corpus import run_stream_exact_dedup
from azuredatalakeindexer_spark.streaming.windowed import run_stream_windowed_counts
from azuredatalakeindexer_spark.streaming.events import (
    run_event_stream_upsert,
    stream_events,
)

__all__ = ["stream_events", "run_event_stream_upsert", "run_stream_exact_dedup", "run_stream_windowed_counts"]
