"""Scheduled partitioned indexer runs (T5).

The reference staggers five cron-triggered runs, each indexing one
path-prefix partition (``partition_1*`` … ``partition_5*``) with the same
watermark filter (reference DatalakePathIndexerFunc/DatalakeIndexerFunc.cs:20-48).

Spark shape: each scheduled run is the same declarative program with a
different prefix predicate.  The reference's prefixes partition the lake
(disjoint by construction — one cron per partition), so the sequential
run-after-run merge is semantically ONE merge of the union of all prefix
batches: that is the default fast path here — one tagged scan, one grouped
count, one anti-join+union — instead of five chained merge jobs (five
anti-join layers and five count actions).  At 100 TB the difference is five
full-index passes vs one.  If the path-index table is partitioned by a
prefix column, the tag predicate becomes partition pruning instead of a row
filter.
"""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from azuredatalakeindexer_spark.operators.paths import ListPathsOptions, list_paths
from azuredatalakeindexer_spark.operators.upsert import merge_upsert


def _prefix_match(prefix: str, col: str = "pathUrlEncoded") -> Column:
    """keyword_v2+lowercase whole-string prefix predicate (P8), LIKE-escaped
    exactly as :func:`list_paths` does.  Pass an already-lowered attribute
    as ``col`` when matching several prefixes: referencing a projected
    column keeps CollapseProject from inlining the (expensive, derived)
    path expression once per prefix."""
    p = prefix.lower().replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
    c = F.col(col)
    if col == "pathUrlEncoded":
        c = F.lower(c)
    return c.like(p + "%")


def run_partitioned_upserts(
    path_index: DataFrame,
    existing: DataFrame,
    prefixes: list[str],
    from_last_modified: datetime | str | None = None,
    filesystem: str | None = None,
    count_batches: bool = True,
    disjoint_prefixes: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """One scheduled cycle: for each partition prefix, list changed paths
    (S2) and merge them into the index (S6).  Returns (final index state,
    per-partition changed-path counts) — the counts mirror the reference's
    per-run logging (DatalakeIndexerFunc.cs:50-53).

    ``disjoint_prefixes=True`` (the reference's actual layout) takes the
    fast path: ONE watermark-filtered scan tags each row with its matching
    prefix, counts come from one grouped aggregate, and the index state is a
    single :func:`merge_upsert` of the union — sequential merges of disjoint
    batches can never overwrite each other, so the result is identical to
    the loop.  Pass ``False`` for overlapping prefixes, where the chained
    loop's last-run-wins ordering is observable.

    ``count_batches=False`` skips the count action entirely: the final
    state then evaluates in ONE job."""
    if not disjoint_prefixes:
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

    # fast path: one scan, prefix tag via a first-match CASE chain (order
    # irrelevant for disjoint prefixes), rows outside every prefix dropped
    base = list_paths(
        path_index,
        ListPathsOptions(from_last_modified=from_last_modified, filesystem=filesystem),
        ordered=False,
    ).withColumn("_lp", F.lower(F.col("pathUrlEncoded")))
    # _lp is a multiply-referenced non-trivial alias, so CollapseProject
    # keeps the projection — the lowering runs once per row, not once per
    # prefix (measured 2× on the sf0.1 counts job)
    tag: Column = F.lit(None).cast("string")
    for prefix in reversed(prefixes):
        tag = F.when(_prefix_match(prefix, "_lp"), F.lit(prefix)).otherwise(tag)
    batch = (
        base.withColumn("_prefix", tag)
        .where(F.col("_prefix").isNotNull())
        .drop("_lp")
    )
    counts = {}
    if count_batches:
        # the counts action and the final merge both consume `batch`;
        # materialize it once (changed-path batches are metadata-sized —
        # the same buffer the reference pages through PathIndexClient) so
        # the merge job doesn't redo the scan + tag work the counts job
        # just did.  At 100 TB this is a persisted staging table.
        batch = batch.localCheckpoint()
        got = {
            r["_prefix"]: r["n"]
            for r in batch.groupBy("_prefix").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        counts = {p: int(got.get(p, 0)) for p in prefixes}
    return merge_upsert(existing, batch.drop("_prefix")), counts
