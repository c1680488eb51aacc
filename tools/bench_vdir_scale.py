"""Measure the doclens bucket-set victim directory at scale (r10,
VERDICT r9 next-#4's "Done" bar): the in-place text upsert's victim
lookup must be O(batch buckets), not O(index).

The driver fixtures cannot show this — their synthetic vocabulary is 31
words, so every document's postings span every bucket and no bucket-level
pruning is possible (the pruning regime requires n_buckets >> distinct
terms per doc, which is the production configuration: thousands of
buckets, hundreds of terms per doc).  So this tool generates an
honest-vocabulary corpus (50k-word hash-derived vocabulary, ~60 words
per doc — expression-generated, deterministic) at the requested sizes,
builds the index at n_buckets=1024 twice — as-built (bucket sets
present) and with the column stripped (legacy layout) — applies the same
~1% REPLACEMENT batch to each, and reports wall time plus the postings
rows each victim strategy reads.

Usage:  python tools/bench_vdir_scale.py [n_docs ...]   (default 50000 500000)
Prints one JSON line per size; results are committed as BENCH_vdir_r10.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import pyspark.sql.functions as F  # noqa: E402

N_BUCKETS = 2048
VOCAB = 50_000
WORDS_PER_DOC = 60
# the pruning factor is ~min(1, batch_docs × terms_per_doc / n_buckets):
# a doc's postings live in the buckets of its OWN terms, so the victim
# bucket set saturates once the batch's union of term-buckets covers the
# layout.  8 docs ≈ the event-driven streaming micro-batch (the regime
# the reference's incremental loop runs in — PathIndexerFunc.cs:18-36);
# 128 docs deliberately saturates, to report the no-win case honestly.
BATCHES = (8, 128)


def _corpus(spark, n_docs: int):
    """(doc_id, text): ~60 words per doc drawn hash-uniform from a
    50k-word vocabulary — deterministic, no RNG state, no driver loops."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.hash(F.col("id") * 131 + i * 7919), F.lit(VOCAB)),
                ),
            ),
        ).alias("text"),
    )


def measure(spark, n_docs: int) -> list[dict]:
    from azuredatalakeindexer_spark.sources.text_index import (
        _victim_buckets,
        build_text_index,
        query_text_index,
        upsert_text_index,
    )

    docs = _corpus(spark, n_docs).localCheckpoint()
    results = []
    root = tempfile.mkdtemp(prefix="vdirbench_")
    try:
        modern = os.path.join(root, "modern")
        legacy = os.path.join(root, "legacy")
        t0 = time.time()
        build_text_index(docs, modern, n_buckets=N_BUCKETS)
        build_s = round(time.time() - t0, 2)
        postings_rows = spark.read.parquet(f"{modern}/postings").count()

        # legacy build: the REAL pre-victim-directory layout, timed as a
        # full build so the column's build-side cost stays on the matrix
        # (r10 verdict next-#1 — the r10 run only timed the upsert side
        # and the build regression landed unmeasured).  Since r11 the
        # bucket sets derive from the postings being written
        # (collect_set(bucket), zero extra hashing), so these two numbers
        # should track each other within noise.
        t0 = time.time()
        build_text_index(docs, legacy, n_buckets=N_BUCKETS, _bsets=False)
        build_legacy_s = round(time.time() - t0, 2)

        for batch_docs in BATCHES:
            stride = n_docs // batch_docs
            delta = docs.where(F.col("doc_id") % stride == 1).select(
                "doc_id",
                F.concat(F.lit("w0 w1 w2 replaced "), F.col("text")).alias("text"),
            ).localCheckpoint()
            out = {
                "n_docs": n_docs,
                "batch_docs": delta.count(),
                "n_buckets": N_BUCKETS,
                "vocab": VOCAB,
                "words_per_doc": WORDS_PER_DOC,
                "build_s": build_s,
                "build_legacy_s": build_legacy_s,
                "postings_rows": postings_rows,
            }

            dkeys = F.broadcast(delta.select("doc_id"))
            dbs = [
                r["b"]
                for r in delta.select(
                    F.pmod(F.hash(F.col("doc_id")), F.lit(N_BUCKETS)).alias("b")
                )
                .distinct()
                .collect()
            ]
            t0 = time.time()
            vic = _victim_buckets(spark, modern, dkeys, dbs, "doc_id")
            out["victim_lookup_s"] = round(time.time() - t0, 2)
            out["victim_buckets"] = len(vic)
            out["victim_rows_pruned"] = (
                spark.read.parquet(f"{modern}/postings")
                .where(F.col("bucket").isin(vic))
                .count()
            )
            out["victim_rows_full_projection"] = postings_rows

            t0 = time.time()
            vfull = (
                spark.read.parquet(f"{legacy}/postings")
                .select("term", "doc_id", "bucket")
                .join(dkeys, "doc_id", "left_semi")
                .count()
            )
            out["legacy_full_scan_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            (
                spark.read.parquet(f"{modern}/postings")
                .where(F.col("bucket").isin(vic))
                .select("term", "doc_id", "bucket")
                .join(dkeys, "doc_id", "left_semi")
                .count()
            )
            out["pruned_scan_s"] = round(time.time() - t0, 2)
            out["victim_postings_rows"] = vfull

            for label, path in (("modern", modern), ("legacy", legacy)):
                t0 = time.time()
                upsert_text_index(spark, path, delta, n_buckets=N_BUCKETS)
                out[f"upsert_{label}_s"] = round(time.time() - t0, 2)
            # both layouts must answer identically
            q = ["w0", "w1", "w2"]
            a = [
                tuple(r)
                for r in query_text_index(
                    spark, modern, q, k=20, n_buckets=N_BUCKETS
                ).collect()
            ]
            b = [
                tuple(r)
                for r in query_text_index(
                    spark, legacy, q, k=20, n_buckets=N_BUCKETS
                ).collect()
            ]
            out["results_equal"] = a == b
            results.append(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return results


def main() -> None:
    from azuredatalakeindexer_spark.session import get_spark

    spark = get_spark("bench_vdir")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 150_000]
    for n in sizes:
        for row in measure(spark, n):
            print("RESULT " + json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
