"""Measured cell-skew probe for the persisted vector indexes (IVF / IVF-PQ).

The text-index Zipf probe (`tools/skew_probe.py`, SKEW_r07.json) showed the
hash-bucket layout bounds term skew; this is the vector-side counterpart.
Real embedding corpora are CLUSTERED (the fixtures plant 10 label clusters),
so the cell partitioning the IVF family relies on is inherently uneven:
some centroids own far more vectors than others.  This probe measures, on
fresh synthesized data:

- the cell-size distribution of the built index (max/median/min rows per
  cell) at a given (corpus, n_centroids);
- hot-vs-cold serving cost: query latency probing the LARGEST cell vs the
  SMALLEST cell (n_probe=1), for both the raw IVF postings scan and the
  IVF-PQ ADC path — at 100 TB a hot cell is the straggler partition of
  the probe stage;
- the standard mitigation, measured not asserted: re-building with more
  centroids (4x) splits hot cells, shrinking the max cell and the hot-cell
  probe time while leaving recall governed by n_probe scaling.

Run: python tools/skew_probe_ann.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.session import get_spark
from azuredatalakeindexer_spark.sources.ann_index import (
    build_ivf_index,
    build_pq_index,
    query_ivf_index,
    query_pq_index,
)
from azuredatalakeindexer_spark.sources.fixtures import load_table


def cell_stats(spark, path):
    rows = (
        spark.read.parquet(f"{path}/postings")
        .groupBy("cell")
        .count()
        .orderBy(F.col("count").desc())
        .collect()
    )
    sizes = [r["count"] for r in rows]
    med = sizes[len(sizes) // 2]
    return {
        "n_cells": len(sizes),
        "max_cell": sizes[0],
        "median_cell": med,
        "min_cell": sizes[-1],
        "max_over_median": round(sizes[0] / med, 2),
        "hot_cell": rows[0]["cell"],
        "cold_cell": rows[-1]["cell"],
    }


def probe_time(spark, fn):
    t0 = time.time()
    fn().count()
    return round(time.time() - t0, 3)


def one_query_in_cell(spark, path, emb, cell, k=10):
    """A query vector drawn FROM the target cell so n_probe=1 probes it."""
    member = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("cell") == cell)
        .select("vec_id")
        .limit(1)
    )
    return emb.join(F.broadcast(member), "vec_id")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf1_r08"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/SKEW_ANN_r08.json"
    spark = get_spark("ann-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    out = {"sf_dir": sf, "n_vectors": n}

    tmp = tempfile.mkdtemp(prefix="ann_skew_")
    try:
        for label, n_cents in (("c32", 32), ("c128", 128)):
            ivf = f"{tmp}/ivf_{label}"
            build_ivf_index(emb, ivf, n_centroids=n_cents)
            st = cell_stats(spark, ivf)
            hotq = one_query_in_cell(spark, ivf, emb, st["hot_cell"])
            coldq = one_query_in_cell(spark, ivf, emb, st["cold_cell"])
            # warm each path once, then time
            probe_time(spark, lambda: query_ivf_index(spark, ivf, hotq, k=10, n_probe=1))
            st["ivf_hot_probe_sec"] = probe_time(
                spark, lambda: query_ivf_index(spark, ivf, hotq, k=10, n_probe=1)
            )
            st["ivf_cold_probe_sec"] = probe_time(
                spark, lambda: query_ivf_index(spark, ivf, coldq, k=10, n_probe=1)
            )
            pq = f"{tmp}/pq_{label}"
            build_pq_index(emb, pq, n_centroids=n_cents, m=4, k_pq=16)
            probe_time(spark, lambda: query_pq_index(spark, pq, hotq, k=10, n_probe=1, shortlist=50))
            st["pq_hot_probe_sec"] = probe_time(
                spark, lambda: query_pq_index(spark, pq, hotq, k=10, n_probe=1, shortlist=50)
            )
            st["pq_cold_probe_sec"] = probe_time(
                spark, lambda: query_pq_index(spark, pq, coldq, k=10, n_probe=1, shortlist=50)
            )
            out[label] = st
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out["reading"] = (
        "Clustered embeddings make IVF cells uneven (max/median above). "
        "More centroids split the hot cell in absolute terms (max_cell and "
        "the hot-probe second shrink) — the straggler bound a probe stage "
        "cares about — but with SEED centroids the RELATIVE unevenness can "
        "rise (tail cells shrink faster than the head), so absolute "
        "max_cell, not the ratio, is the number to watch; the real "
        "mitigation at production cell counts is the learned quantizer "
        "(kmeans_centroids with maxmin seeding), which places multiple "
        "centroids inside dense clusters. Hot-vs-cold gaps at small SF are "
        "job-overhead-dominated; at 100 TB the gap scales with max_cell "
        "and surfaces as stragglers in the probe stage."
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
