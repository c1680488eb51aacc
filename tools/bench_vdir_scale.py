"""Measure the doclens bucket-set victim directory at scale (r10,
VERDICT r9 next-#4's "Done" bar): the in-place text upsert's victim
lookup must be O(batch buckets), not O(index) — so its cost should stay
FLAT as the index grows, while the legacy full-postings-projection
fallback grows linearly with the postings row count.

For the given SF dir this builds the index twice — once as-built (bucket
sets present) and once with the column stripped (the legacy layout) —
applies the same ~1% MergeOrUpload batch to each, and reports wall time
plus the row counts the two victim strategies read.

Usage:  python tools/bench_vdir_scale.py [sf_dir ...]
Prints one JSON line per sf_dir; aggregate results are committed as
BENCH_vdir_r10.json.
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


def measure(spark, sf_dir: str) -> dict:
    from azuredatalakeindexer_spark.sources.text_index import (
        _victim_buckets,
        build_text_index,
        query_text_index,
        upsert_text_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = docs.where(F.col("doc_id") % 100 != 0)
    delta = docs.where(F.col("doc_id") % 100 == 0).select(
        "doc_id", F.concat(F.lit("merge vdir batch "), F.col("text")).alias("text")
    )
    n_docs = base.count()
    out = {"sf_dir": sf_dir, "n_docs": n_docs, "batch_docs": delta.count()}

    root = tempfile.mkdtemp(prefix="vdirbench_")
    try:
        modern = os.path.join(root, "modern")
        legacy = os.path.join(root, "legacy")
        t0 = time.time()
        build_text_index(base, modern, n_buckets=64)
        out["build_s"] = round(time.time() - t0, 2)
        out["postings_rows"] = spark.read.parquet(f"{modern}/postings").count()

        # legacy copy: same index, doclens rewritten without the column
        build_text_index(base, legacy, n_buckets=64)
        lens_rows = (
            spark.read.parquet(f"{legacy}/doclens")
            .select("doc_id", "dl", "dbucket")
            .collect()
        )
        shutil.rmtree(f"{legacy}/doclens")
        spark.createDataFrame(lens_rows).repartition("dbucket").write.partitionBy(
            "dbucket"
        ).parquet(f"{legacy}/doclens")

        # the two victim strategies' read sizes
        dkeys = F.broadcast(delta.select("doc_id"))
        dbs = [
            r["b"]
            for r in delta.select(
                F.pmod(F.hash(F.col("doc_id")), F.lit(64)).alias("b")
            )
            .distinct()
            .collect()
        ]
        vic = _victim_buckets(spark, modern, dkeys, dbs, "doc_id")
        out["victim_buckets"] = len(vic)
        out["victim_rows_pruned"] = (
            spark.read.parquet(f"{modern}/postings")
            .where(F.col("bucket").isin(vic))
            .count()
        )
        out["victim_rows_full_projection"] = out["postings_rows"]

        for label, path in (("modern", modern), ("legacy", legacy)):
            t0 = time.time()
            upsert_text_index(spark, path, delta, n_buckets=64)
            out[f"upsert_{label}_s"] = round(time.time() - t0, 2)
        # both layouts must answer identically
        a = [
            tuple(r)
            for r in query_text_index(
                spark, modern, ["merge", "query", "stream"], k=20
            ).collect()
        ]
        b = [
            tuple(r)
            for r in query_text_index(
                spark, legacy, ["merge", "query", "stream"], k=20
            ).collect()
        ]
        out["results_equal"] = a == b
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    from azuredatalakeindexer_spark.session import get_spark

    spark = get_spark("bench_vdir")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.1"]:
        print("RESULT " + json.dumps(measure(spark, sf_dir)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
