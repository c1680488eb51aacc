"""Boundary-math tests replicating the reference's unit-test surface.

- BatchingUploaderTests.cs:12-32  — 3 docs @ batch=2 → 2 batches, all processed
- BatchingUploaderTests.cs:34-56  — 4 docs @ batch=2 → exactly 2 batches
- BatchingUploaderTests.cs:58-77  — 1 doc → 1 batch
- BatchingUploaderTests.cs:79-102 — byte cap forces one doc per batch
- PathIndexClientTests.cs:13-23   — empty listing → zero batches
- PathIndexClientTests.cs:26-46   — 1000 paths → 1 batch
- PathIndexClientTests.cs:48-68   — 1001 paths → 2 batches
"""

from __future__ import annotations

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.batching import oversize_filter, plan_batches


def _docs(spark, n, size=10):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(size).alias("sz")
    )


def _n_batches(df):
    return df.select("worker", "batch_id").distinct().count()


def test_three_docs_batch_two(spark):
    out = plan_batches(_docs(spark, 3), F.col("sz"), "doc_id", max_batch_count=2, max_batch_bytes=10**9)
    assert _n_batches(out) == 2
    assert out.count() == 3  # ProcessedCount == 3


def test_four_docs_batch_two(spark):
    out = plan_batches(_docs(spark, 4), F.col("sz"), "doc_id", max_batch_count=2, max_batch_bytes=10**9)
    assert _n_batches(out) == 2


def test_single_doc_single_batch(spark):
    out = plan_batches(_docs(spark, 1), F.col("sz"), "doc_id")
    assert _n_batches(out) == 1


def test_byte_cap_forces_one_doc_per_batch(spark):
    # each doc 100 bytes, cap 100 → adding a second would overflow → 4 batches
    out = plan_batches(
        _docs(spark, 4, size=100), F.col("sz"), "doc_id", max_batch_bytes=100, max_batch_count=1000
    )
    assert _n_batches(out) == 4


def test_empty_input_zero_batches(spark):
    out = plan_batches(_docs(spark, 0), F.col("sz"), "doc_id")
    assert out.count() == 0


def test_rebuild_buffer_1000_boundary(spark):
    for n, expected in ((1000, 1), (1001, 2)):
        out = plan_batches(
            _docs(spark, n), F.col("sz"), "doc_id", max_batch_count=1000, max_batch_bytes=10**12
        )
        assert _n_batches(out) == expected, n


def test_oversize_filter_counts(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 2000), (3, 15)], "doc_id long, sz int"
    )
    kept, dropped = oversize_filter(docs, F.col("sz"), max_doc_bytes=100)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    assert [r["doc_id"] for r in dropped.collect()] == [2]  # FailedTooLarge


def test_count_cap_holds_with_byte_slot_spanning_doc(spark):
    """Repair-pass regression (hypothesis-found): a doc spanning 2 byte-slots
    (2000 > 1000) makes the raw byte id jump to 2 while the count id catches
    up inside it — without the repair, docs 1 and 2 share a batch despite
    max_batch_count=1."""
    docs = spark.createDataFrame(
        [(0, 2000), (1, 1), (2, 1)], "doc_id long, sz long"
    )
    out = plan_batches(
        docs, F.col("sz"), "doc_id", max_batch_bytes=1000, max_batch_count=1
    )
    got = {r["doc_id"]: r["batch_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_greedy_matches_reference_flush_semantics(spark):
    """Variable sizes where the plan-ahead window formula diverges but the
    greedy walk must match BatchingUploader.cs:80-92 exactly: flush happens
    BEFORE adding a doc that would overflow, and the accumulator resets."""
    from azuredatalakeindexer_spark.operators.batching import plan_batches_greedy

    # cap=100: [60, 50] -> flush before 50 (110 > 100); [50, 40] fit; [90] flushes again
    docs = spark.createDataFrame(
        [(0, 60), (1, 50), (2, 40), (3, 90)], "doc_id long, sz long"
    )
    out = plan_batches_greedy(
        docs, F.col("sz"), "doc_id", max_batch_bytes=100, max_batch_count=1000
    )
    got = {r["doc_id"]: r["batch_id"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_greedy_agrees_with_window_for_uniform_sizes(spark):
    from azuredatalakeindexer_spark.operators.batching import plan_batches_greedy

    docs = _docs(spark, 1001)
    for fn in (plan_batches, plan_batches_greedy):
        out = fn(docs, F.col("sz"), "doc_id", max_batch_count=1000, max_batch_bytes=10**12)
        ids = {r["batch_id"] for r in out.collect()}
        assert ids == {0, 1}, fn.__name__
