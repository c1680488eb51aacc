"""Custom stateful streaming operator: per-key path-version tracking via
``applyInPandasWithState``.

The reference has no custom stream state (SURVEY §2.9 — its idempotence
comes from MergeOrUpload), but a production path index wants to know how
often a blob is rewritten (churn) and when it was last seen, maintained
incrementally as events arrive.  This operator is the template for any
custom stateful logic the built-in operators can't express: Arrow-batched
per-group state with event-time semantics.

State per key: (version_count, last_modified_micros).  Each micro-batch
emits the updated row for every key it touched (update semantics) — the
same LWW discipline as the merge sink, so results are batch-split-invariant
for the final state of each key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("versions", LongType()),
        StructField("last_micros", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("versions", LongType()),
        StructField("lastSeen", TimestampType()),
    ]
)


def _track(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    versions, last_micros = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        versions += len(pdf)
        if len(pdf):
            batch_max = pdf["fileLastModified"].max()
            last_micros = max(last_micros, int(batch_max.value // 1000))
    state.update((versions, last_micros))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "versions": [versions],
            "lastSeen": [pd.Timestamp(last_micros * 1000)],
        }
    )


def track_path_versions(path_rows: DataFrame) -> DataFrame:
    """Stateful per-key version counter over a STREAMING frame of path rows
    (``key``, ``fileLastModified``).

    One state shuffle per micro-batch (hash by key); state store scales with
    distinct keys, not events.  ``NoTimeout`` keeps churn counters forever —
    swap for ``EventTimeTimeout`` + ``state.setTimeoutTimestamp`` to expire
    cold keys when the key space is unbounded.
    """
    return (
        path_rows.select("key", "fileLastModified")
        .groupBy("key")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
