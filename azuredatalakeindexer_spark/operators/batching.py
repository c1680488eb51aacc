"""Size-aware batch planning (A5) and the oversize-document filter (P11).

The reference's ``BatchingUploader`` (reference BatchingUploader.cs:11-103)
packs documents into upload batches greedily: flush at ``maxBatchCount`` docs
(BatchingUploader.cs:89-92) or when adding a doc would exceed
``maxBatchSizeBytes`` (:80-83); documents larger than ``maxDocumentSizeBytes``
are dropped and counted ``FailedTooLarge`` (:73-77).  Limits:
63 MiB batch / 16 MiB doc / 1000 docs (Models/DatalakeIndexerOptions.cs:9-13).

Spark shape: batching is a *planning* computation — a prefix-sum window per
upload worker — not an imperative loop.  Work is first split across
``n_workers`` deterministic hash buckets (the analog of the reference's 4
uploader threads, DatalakeIndexerOptions.cs:7), then packed within each
bucket, so the window never sees more than 1/n_workers of the data and the
whole plan stays distributed at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: reference defaults (Models/DatalakeIndexerOptions.cs:5-13)
MAX_DOCUMENT_BATCH_SIZE_BYTES = 63 * 1024 * 1024
MAX_DOCUMENT_SIZE_BYTES = 16 * 1024 * 1024
DOCUMENT_BATCH_SIZE = 1000


def oversize_filter(
    df: DataFrame, size: Column, max_doc_bytes: int = MAX_DOCUMENT_SIZE_BYTES
) -> tuple[DataFrame, DataFrame]:
    """P11: split into (uploadable, failed_too_large) by serialized size
    (reference BatchingUploader.cs:71-77)."""
    tagged = df.withColumn("_doc_bytes", size)
    kept = tagged.where(F.col("_doc_bytes") <= max_doc_bytes).drop("_doc_bytes")
    dropped = tagged.where(F.col("_doc_bytes") > max_doc_bytes).drop("_doc_bytes")
    return kept, dropped


def plan_batches_greedy(
    df: DataFrame,
    size: Column,
    order_col: str,
    max_batch_bytes: int = MAX_DOCUMENT_BATCH_SIZE_BYTES,
    max_batch_count: int = DOCUMENT_BATCH_SIZE,
    n_workers: int = 1,
    worker_key: str | None = None,
) -> DataFrame:
    """A5 with the reference's EXACT greedy flush semantics
    (BatchingUploader.cs:80-92): walk documents in order, flush when the
    batch holds ``max_batch_count`` docs or adding the next would exceed
    ``max_batch_bytes``.

    Greedy packing is inherently sequential, so it runs per worker bucket as
    an Arrow-batched ``applyInPandas`` — the bounded Python loop the
    reference also runs per uploader thread.  For uniform sizes it agrees
    with :func:`plan_batches`; for variable sizes it reproduces the
    reference byte-for-byte (the window variant is a shuffle-free
    plan-ahead approximation).
    """
    import pandas as pd

    out_fields = df.schema.fields
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + ", worker bigint, batch_id bigint"
    )
    tagged = df.withColumn("_doc_bytes", size)
    if n_workers > 1:
        wk = F.pmod(F.xxhash64(F.col(worker_key or order_col)), F.lit(n_workers))
    else:
        wk = F.lit(0)
    tagged = tagged.withColumn("worker", wk.cast("bigint"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        batch_ids = []
        batch_id = acc_bytes = acc_count = 0
        for sz in pdf["_doc_bytes"]:
            if acc_count == max_batch_count or (
                acc_count > 0 and acc_bytes + sz > max_batch_bytes
            ):
                batch_id += 1
                acc_bytes = acc_count = 0
            batch_ids.append(batch_id)
            acc_bytes += sz
            acc_count += 1
        pdf["batch_id"] = batch_ids
        return pdf.drop(columns=["_doc_bytes"])

    return tagged.groupBy("worker").applyInPandas(pack, schema=out_schema)


def plan_batches(
    df: DataFrame,
    size: Column,
    order_col: str,
    max_batch_bytes: int = MAX_DOCUMENT_BATCH_SIZE_BYTES,
    max_batch_count: int = DOCUMENT_BATCH_SIZE,
    n_workers: int = 1,
    worker_key: str | None = None,
) -> DataFrame:
    """A5: assign every document a ``(worker, batch_id)``.

    Within each worker, documents are ordered by ``order_col`` and packed by
    a prefix-sum: ``batch_id = max(floor((cum_bytes - size) / max_bytes),
    floor((rank-1) / max_count))``.  For uniform document sizes this is
    byte-for-byte the reference's greedy packing (its unit-test cases,
    BatchingUploaderTests.cs:11-102); for variable sizes it is a deterministic
    plan-ahead approximation of the sequential greedy loop (documented
    divergence — an exact greedy would serialize the whole stream).

    ``n_workers=1`` reproduces the reference's single uploader stream for the
    boundary tests; production uses e.g. 4 (DatalakeIndexerOptions.cs:7) or
    one per output partition.

    A repair pass makes the count cap structural: when a document spans one
    or more whole byte-slots (size >= max_batch_bytes), the raw
    ``max(by_bytes, by_count)`` id can place more than ``max_batch_count``
    documents in one batch (the byte id jumps ahead and the count id catches
    up inside it).  Each raw batch is therefore re-chunked into runs of
    ``max_batch_count`` and renumbered with a dense rank — a no-op whenever
    no document reaches the byte cap (both ids then step by at most 1), so
    the uniform-size greedy parity above is preserved exactly.
    """
    out = df.withColumn("_doc_bytes", size)
    if n_workers > 1:
        wk = F.pmod(F.xxhash64(F.col(worker_key or order_col)), F.lit(n_workers))
    else:
        wk = F.lit(0)
    out = out.withColumn("worker", wk)
    w = Window.partitionBy("worker").orderBy(order_col)
    cum = F.sum("_doc_bytes").over(w)
    rank = F.row_number().over(w)
    by_bytes = F.floor((cum - F.col("_doc_bytes")) / F.lit(max_batch_bytes))
    by_count = F.floor((rank - F.lit(1)) / F.lit(max_batch_count))
    out = out.withColumn("_raw_batch", F.greatest(by_bytes, by_count))
    # count-cap repair: chunk each raw batch into runs of max_batch_count,
    # then renumber (worker-local, same sort order — no extra shuffle).
    w_raw = Window.partitionBy("worker", "_raw_batch").orderBy(order_col)
    sub = F.floor((F.row_number().over(w_raw) - F.lit(1)) / F.lit(max_batch_count))
    out = out.withColumn("_sub_batch", sub)
    w_final = Window.partitionBy("worker").orderBy("_raw_batch", "_sub_batch")
    return (
        out.withColumn(
            "batch_id", (F.dense_rank().over(w_final) - F.lit(1)).cast("long")
        )
        .drop("_doc_bytes", "_raw_batch", "_sub_batch")
    )
