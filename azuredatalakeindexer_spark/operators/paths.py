"""The path query (S2) — the reference's core value proposition.

``ListPathsAsync`` (reference AzureSearchIndexer/PathIndexClient.cs:49-92)
queries the helper path index for files changed since the last run, restricted
to a filesystem and a path-prefix partition, ordered by key with keyset
pagination.  In Spark this whole lifecycle is one declarative filtered scan:
Catalyst pushes every predicate to the parquet row-group level
(``PushedFilters`` in the plan), and partitioned execution obviates the
5000-row pagination loop (PathIndexClient.cs:66-91) — ``from_key``/``limit``
remain available for API parity.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ListPathsOptions:
    """Mirror of reference Models/ListPathsOptions.cs + SearchOptions usage.

    - ``from_last_modified`` → P6 incremental watermark
      (``lastModified ge {ts:o}``, PathIndexClient.cs:53)
    - ``filesystem`` → P7 equality (`filesystem eq '...'`,
      DatalakeIndexerFunc.cs:47)
    - ``path_prefix`` → P8 ``search.ismatch('{prefix}*')`` under the
      keyword_v2+lowercase analyzer: whole-string, case-insensitive prefix
      (SearchIndexerTest/Program.cs:59-60, test.py:19-23)
    - ``from_key`` → P9 keyset resume (`key gt '{previousKey}'`,
      PathIndexClient.cs:75-90)
    - ``limit`` → O2 page size (SearchOptions.Size=5000, PathIndexClient.cs:16)
    """

    from_last_modified: datetime | str | None = None
    filesystem: str | None = None
    path_prefix: str | None = None
    from_key: str | None = None
    limit: int | None = None


def list_paths(
    path_index: DataFrame, options: ListPathsOptions, ordered: bool = True
) -> DataFrame:
    """S2 + P6/P7/P8/P9/P10 + O1/O2 as one declarative plan.

    Predicate conjunction (P10, reference Utils.cs:16-17 ``ConcatWithAnd``)
    is the chaining of ``where`` clauses; Catalyst folds them into a single
    pushed filter.

    ``ordered=False`` drops the O1 key sort for callers that immediately
    re-aggregate or merge the batch (the sort is a global range-partition
    exchange — pure waste when no pagination consumes the order).
    """
    df = path_index
    if options.from_last_modified is not None:
        ts = options.from_last_modified
        df = df.where(F.col("lastModified") >= F.lit(ts).cast("timestamp"))
    if options.filesystem is not None:
        df = df.where(F.col("filesystem") == F.lit(options.filesystem))
    if options.path_prefix is not None:
        # keyword_v2 analyzer + lowercase filter = case-insensitive whole-string
        # prefix match; escape SQL-LIKE metacharacters in the literal prefix.
        prefix = options.path_prefix.lower().replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
        df = df.where(F.lower(F.col("pathUrlEncoded")).like(prefix + "%"))
    if options.from_key is not None:
        df = df.where(F.col("key") > F.lit(options.from_key))
    if ordered:
        df = df.orderBy("key")  # O1 (PathIndexClient.cs:73)
    if options.limit is not None:
        df = df.limit(options.limit)
    return df


def iterate_pages(path_index: DataFrame, options: ListPathsOptions, page_size: int = 5000):
    """Lazy page iterator — full API parity with ``ListPathsAsync``'s keyset
    pagination loop (reference PathIndexClient.cs:66-91): fetch a page of
    ``page_size`` ordered by key, remember the last key, resume with
    ``key > previousKey`` until an empty page.

    Spark jobs don't need this (partitioned execution replaces paging), but
    driver-side consumers that stream results out (the reference's
    IAsyncEnumerable callers) get the same contract.
    """
    from_key = options.from_key
    while True:
        page = list_paths(
            path_index,
            ListPathsOptions(
                from_last_modified=options.from_last_modified,
                filesystem=options.filesystem,
                path_prefix=options.path_prefix,
                from_key=from_key,
                limit=page_size,
            ),
        ).collect()
        if not page:
            return
        yield page
        from_key = page[-1]["key"]  # :79-81 previousKey carry
