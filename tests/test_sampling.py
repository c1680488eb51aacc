"""Deterministic sampling + token-budget mixing (operators/sampling.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    token_budget_pack,
)
from azuredatalakeindexer_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR


def test_hash_sample_deterministic_and_partition_independent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"] for r in hash_sample(docs, 0.25, seed=7).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(13), 0.25, seed=7).select("doc_id").collect()
    }
    assert a == b                      # partitioning-independent
    n = docs.count()
    assert 0.15 * n < len(a) < 0.35 * n  # roughly the asked rate


def test_hash_sample_seeds_give_different_draws(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"] for r in hash_sample(docs, 0.25, seed=7).select("doc_id").collect()}
    c = {r["doc_id"] for r in hash_sample(docs, 0.25, seed=8).select("doc_id").collect()}
    assert a != c
    # independent draws overlap on ~rate^2, not ~rate
    assert len(a & c) < 0.6 * len(a)


def test_stratified_sample_exact_counts(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = stratified_sample(docs, ["lang", "source"], 5, seed=3)
    counts = out.groupBy("lang", "source").count().collect()
    sizes = {(r["lang"], r["source"]): r["count"] for r in docs.groupBy("lang", "source").count().collect()}
    for r in counts:
        assert r["count"] == min(5, sizes[(r["lang"], r["source"])])


def test_token_budget_pack_quality_first_boundary(spark):
    rows = [
        # (doc_id, lang, n_tokens, quality)
        (1, "en", 1000, 0.9),
        (2, "en", 1500, 0.8),
        (3, "en", 1000, 0.7),   # crosses the 3000 line: kept (cum-n < budget)
        (4, "en", 100, 0.6),    # over budget: dropped
        (5, "de", 500, 0.5),    # other stratum: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long, quality double")
    out = {r["doc_id"]: r["cum_tokens"] for r in token_budget_pack(df, 3000).collect()}
    assert out == {1: 1000, 2: 2500, 3: 3500, 5: 500}


def test_pack_sequences_invariants(spark):
    """Every token of every document lands in exactly one chunk slot;
    chunks never exceed seq_len; offsets are consistent."""
    docs = spark.createDataFrame(
        [(i, 10 + (i * 7) % 90) for i in range(200)], "doc_id long, n_tokens long"
    )
    from azuredatalakeindexer_spark.operators.sampling import pack_training_sequences

    out = pack_training_sequences(docs, seq_len=64, n_shards=4).collect()
    tokens_in = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    per_doc: dict[int, int] = {}
    per_chunk: dict[tuple, int] = {}
    for r in out:
        assert 0 <= r["start_tok"] < r["end_tok"] <= 64
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + (r["end_tok"] - r["start_tok"])
        per_chunk[(r["shard"], r["chunk"])] = per_chunk.get((r["shard"], r["chunk"]), 0) + (
            r["end_tok"] - r["start_tok"]
        )
    assert per_doc == tokens_in                     # no token lost or duplicated
    assert all(v <= 64 for v in per_chunk.values())  # chunk capacity respected
    # all chunks except each shard's last are exactly full
    last = {s: max(c for (s2, c) in per_chunk if s2 == s) for s in {s for s, _ in per_chunk}}
    assert all(v == 64 for (s, c), v in per_chunk.items() if c != last[s])


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """ES draw is partitioning-invariant, exact-k, and weight-dominated:
    with 100 heavy (w=100000) and 100 light (w=1) rows, the top-20 draw is
    overwhelmingly heavy (deterministic given the fixed seed/keys)."""
    from azuredatalakeindexer_spark.operators.sampling import weighted_sample

    rows = [(i, 100_000 if i < 100 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = weighted_sample(df, "w", 20, seed=3)
    b = weighted_sample(df.repartition(13), "w", 20, seed=3)
    got_a = sorted(r["doc_id"] for r in a.collect())
    got_b = sorted(r["doc_id"] for r in b.collect())
    assert got_a == got_b and len(got_a) == 20
    heavy = sum(1 for i in got_a if i < 100)
    assert heavy >= 18  # P(light beats heavy) ~ u^1e5 vs u — vanishing

    # k larger than the population returns everything, weights > 0 only
    small = spark.createDataFrame([(1, 5), (2, 0), (3, -1)], "doc_id long, w long")
    kept = sorted(r["doc_id"] for r in weighted_sample(small, "w", 10).collect())
    assert kept == [1]
