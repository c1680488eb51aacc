"""Persisted IVF index: saved-vs-in-memory parity, partition pruning,
learned-quantizer roundtrip."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.similarity import (
    ivf_topk,
    kmeans_centroids,
)
from azuredatalakeindexer_spark.sources.ann_index import (
    build_ivf_index,
    query_ivf_index,
)
from azuredatalakeindexer_spark.sources.fixtures import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in df.collect()
    )


def test_saved_index_matches_in_memory_ivf(spark, tmp_path):
    """A saved-index query must return bit-identical rows to ivf_topk on
    the same (seed) quantizer — the parquet roundtrip changes nothing."""
    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=16)
    saved = query_ivf_index(spark, path, q, k=5, n_probe=2)
    mem = ivf_topk(emb, q, k=5, n_centroids=16, n_probe=2)
    assert _rows(saved) == _rows(mem)


def test_saved_index_prunes_unprobed_cells(spark, tmp_path):
    """The postings scan must carry the probed cells as a STATIC partition
    filter (a literal `cell = N` / `cell IN (...)` in PartitionFilters —
    pruned by the file index before any row is read; `inputFiles()` can't
    show this, it reports the pre-pruning index)."""
    import re

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=16)
    n_cells = len(
        [d for d in os.listdir(f"{path}/postings") if d.startswith("cell=")]
    )
    assert n_cells > 4  # the index is genuinely multi-cell
    q = emb.where(F.col("vec_id") == 3)
    out = query_ivf_index(spark, path, q, k=3, n_probe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # only the postings scan has a non-empty PartitionFilters (the other
    # file scans show "PartitionFilters: []"), so match plan-wide
    assert re.search(r"PartitionFilters: \[[^]]*\(cell#\d+L? (=|IN)", plan), plan


def test_saved_index_with_learned_quantizer(spark, tmp_path):
    """kmeans centroids flow through build/save/query unchanged, and the
    saved query still equals the in-memory path under the same model."""
    emb = load_table(spark, SF, "embeddings").limit(200)
    cents = kmeans_centroids(emb, k=8, iters=2)
    q = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf_km")
    build_ivf_index(emb, path, n_centroids=8, centroids=cents)
    saved = query_ivf_index(spark, path, q, k=4, n_probe=2)
    mem = ivf_topk(emb, q, k=4, n_centroids=8, n_probe=2, centroids=cents)
    assert _rows(saved) == _rows(mem)
