"""Scheduled partitioned indexer runs (T5).

The reference staggers five cron-triggered runs, each indexing one
path-prefix partition (``partition_1*`` … ``partition_5*``) with the same
watermark filter (reference DatalakePathIndexerFunc/DatalakeIndexerFunc.cs:20-48).

Spark shape: each scheduled run is the same declarative program with a
different prefix predicate — here composed as one driver loop over prefixes
(the scheduler is an orchestration concern, SURVEY §4).  If the path-index
table is partitioned by a prefix column, the predicate becomes partition
pruning instead of a row filter.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame

from azuredatalakeindexer_spark.operators.paths import ListPathsOptions, list_paths
from azuredatalakeindexer_spark.operators.upsert import merge_upsert


def run_partitioned_upserts(
    path_index: DataFrame,
    existing: DataFrame,
    prefixes: list[str],
    from_last_modified: datetime | str | None = None,
    filesystem: str | None = None,
    count_batches: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """One scheduled cycle: for each partition prefix, list changed paths
    (S2) and merge them into the index (S6).  Returns (final index state,
    per-partition changed-path counts) — the counts mirror the reference's
    per-run logging (DatalakeIndexerFunc.cs:50-53).

    ``count_batches=False`` skips the per-prefix ``count()`` actions: the
    final state then evaluates in ONE job instead of one per prefix plus
    one — use it when only the merged state is consumed."""
    state = existing
    counts: dict[str, int] = {}
    for prefix in prefixes:
        batch = list_paths(
            path_index,
            ListPathsOptions(
                from_last_modified=from_last_modified,
                filesystem=filesystem,
                path_prefix=prefix,
            ),
        )
        if count_batches:
            counts[prefix] = batch.count()
        state = merge_upsert(state, batch)
    return state, counts
