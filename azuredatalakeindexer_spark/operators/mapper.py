"""Document mapping (P1-P4), the J1 join, and the null-drop (P2).

The reference's single extension point is the document mapper
``Func<PathIndexModel, FileDownloadInfo, Task<TIndex?>>`` (reference
DataLakeIndexer.cs:23, example IndexMapper.cs:13-29): given a path row and the
downloaded file, produce a target document or null.  The example mapper is
100% column-expressible (SURVEY §2.10), so the default here is pure Catalyst;
an opaque python mapper can be slotted in with ``mapInPandas`` when truly
needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from azuredatalakeindexer_spark.functions.keys import (
    path_key,
    split_url,
    url_decode_path,
    url_encode_path,
)


def join_paths_content(paths: DataFrame, content: DataFrame, broadcast_paths: bool = True) -> DataFrame:
    """J1: path-metadata ⋈ file-content (equi, inner).

    The reference does this implicitly — the mapper receives both the path
    row and the file downloaded for it (DataLakeIndexer.cs:86-89).  The path
    batch of one indexer run is small relative to the content scan, so it is
    broadcast by default: no shuffle of the (potentially huge) content side.
    """
    p = paths.withColumn("_decoded_path", url_decode_path(F.col("pathUrlEncoded")))
    if broadcast_paths:
        p = F.broadcast(p)
    return content.join(p, content["path"] == p["_decoded_path"], "inner").drop("_decoded_path")


def map_to_data_index(
    docs: DataFrame,
    etag: Column | None = None,
    last_modified: Column | None = None,
) -> DataFrame:
    """P1: project parsed documents to the data-index shape
    (``SomeOtherIndexModel``, reference IndexModels/TextIndexModel.cs:24-34;
    mapper IndexMapper.cs:18-27).

    Expects ``docs`` to carry ``path`` + ``filesystem`` + the TestIndexModel
    fields (``stringvalue``, ``numbervalue``, ``booleanvalue``).
    """
    enc = url_encode_path(F.col("path"))
    return docs.select(
        path_key(F.col("filesystem"), enc).alias("pathbase64"),
        F.col("stringvalue"),
        F.col("numbervalue"),
        F.col("booleanvalue"),
        (etag if etag is not None else F.col("eTag")).alias("eTag"),
        enc.alias("pathUrlEncoded"),
        (last_modified if last_modified is not None else F.col("lastModified")).alias("lastModified"),
    )


def drop_unmapped(mapped: DataFrame, required: list[str] | None = None) -> DataFrame:
    """P2: a mapper returning null drops the row (reference
    DataLakeIndexer.cs:90-96).  A JSON parse miss under PERMISSIVE mode leaves
    every data field null, which this filter removes."""
    cols = required or ["stringvalue", "numbervalue", "booleanvalue"]
    alive = None
    for c in cols:
        cond = F.col(c).isNotNull()
        alive = cond if alive is None else (alive | cond)
    return mapped.where(alive)


def events_to_path_rows(
    events: DataFrame, now: Column | None = None, seq_col: str | None = None
) -> DataFrame:
    """P3: BlobEvent → PathIndexModel row (reference PathIndexerFunc.cs:23-35).

    ``url.Split('/', 5)`` → (filesystem, path) (P12, Utils.cs:10-14), path
    URL-encoded (F1), ``lastModified = now`` (F9), ``fileLastModified =
    eventTime``.  Pass a literal ``now`` for deterministic runs; defaults to
    ``current_timestamp()`` like the reference.  ``seq_col`` (e.g. the event
    id / Service Bus sequencer) is carried through as ``_seq`` for
    batch-split-invariant last-writer-wins tie-breaks.
    """
    fs, path = split_url(F.col("url"))
    enc = url_encode_path(path)
    stamp = now if now is not None else F.current_timestamp()
    cols = [
        path_key(fs, enc).alias("key"),
        enc.alias("pathUrlEncoded"),
        fs.alias("filesystem"),
        F.col("eventTime").alias("fileLastModified"),
        stamp.alias("lastModified"),
    ]
    if seq_col is not None:
        cols.append(F.col(seq_col).alias("_seq"))
    return events.select(*cols)


def listing_to_path_rows(listing: DataFrame, now: Column | None = None) -> DataFrame:
    """P4 + P5: PathItem → PathIndexModel row, directories dropped
    (reference PathIndexClient.cs:112-126)."""
    stamp = now if now is not None else F.current_timestamp()
    enc = url_encode_path(F.col("name"))
    fs = F.coalesce(F.col("filesystem"), F.lit("stuff-large")) if "filesystem" in listing.columns else F.lit("stuff-large")
    return listing.where(~F.col("isDirectory")).select(
        path_key(fs, enc).alias("key"),
        enc.alias("pathUrlEncoded"),
        fs.alias("filesystem"),
        F.col("lastModified").alias("fileLastModified"),
        stamp.alias("lastModified"),
    )
