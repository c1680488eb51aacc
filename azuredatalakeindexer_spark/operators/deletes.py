"""Deleted-paths anti-join (J2, T2 downstream).

The reference records BlobDeleted events in a deleted-path index
(reference SearchIndexerTest/Program.cs:65; handler stub
DatalakePathIndexerFunc/PathIndexerFunc.cs:39-74 — "should this only add to
blob deleted paths index?").  The intended semantics, per SURVEY §2.3 J2 /
§7, is to anti-join deletions out of the data/path index; the reference never
finished this, so the engine implements the intended behavior and documents
the divergence.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def apply_deletes(
    index: DataFrame,
    deleted: DataFrame,
    key_col: str = "key",
    honor_timestamps: bool = False,
) -> DataFrame:
    """J2: remove deleted keys from an index.

    With ``honor_timestamps`` a delete only wins over a row that was not
    re-created after the deletion (``deleted.fileLastModified >=
    index.fileLastModified``) — the create-then-delete / delete-then-recreate
    race the event pipeline can produce.
    """
    if not honor_timestamps:
        return index.join(deleted.select(key_col).distinct(), key_col, "left_anti")
    d = deleted.groupBy(key_col).agg(F.max("fileLastModified").alias("_del_ts"))
    joined = index.join(d, key_col, "left")
    return joined.where(
        F.col("_del_ts").isNull() | (F.col("_del_ts") < F.col("fileLastModified"))
    ).drop("_del_ts")
