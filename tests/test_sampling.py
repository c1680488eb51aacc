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


def test_temperature_mix_flattens_and_is_deterministic(spark):
    from azuredatalakeindexer_spark.operators.sampling import temperature_mix

    # the fixture's sources are uniform, so flattening needs a SKEWED corpus:
    # 1600 / 400 / 100 docs across three sources
    docs = (
        spark.range(2100)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 1600, "big")
            .when(F.col("id") < 2000, "mid")
            .otherwise("small")
            .alias("source"),
        )
    )
    out = temperature_mix(docs, alpha=0.5, target_total=700, seed=5).cache()
    mix = dict(
        (r["source"], r["count"]) for r in out.groupBy("source").count().collect()
    )
    total_mix = sum(mix.values())
    # alpha=0.5 weights ∝ sqrt(n): 40/20/10 → shares 4/7, 2/7, 1/7 of 700
    # (rates 0.25, 0.5, 1.0) — sampling noise hits only the two sampled
    # sources, so assert ±20% around the expected counts
    assert abs(mix["big"] - 400) < 80
    assert abs(mix["mid"] - 200) < 40
    assert mix["small"] == 100  # rate clamps at 1.0: everything kept
    # alpha < 1 flattens: small source's mixed share ≫ its natural 100/2100
    assert mix["small"] / total_mix > 100 / 2100
    assert mix["big"] / total_mix < 1600 / 2100
    # pure function of (id, seed): partitioning cannot change membership
    again = temperature_mix(
        docs.repartition(13), alpha=0.5, target_total=700, seed=5
    )
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == {
        r["doc_id"] for r in again.select("doc_id").collect()
    }
    out.unpersist()


def test_shuffle_shards_dense_balanced_deterministic(spark):
    from azuredatalakeindexer_spark.operators.sampling import shuffle_shards

    docs = load_table(spark, SF_DIR, "documents")
    out = shuffle_shards(docs, n_shards=8, seed=0).cache()
    n = docs.count()
    assert out.count() == n
    # dense positions 1..m per shard (no gaps/dupes)
    per = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("m"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    for r in per.collect():
        assert (r["mn"], r["mx"]) == (1, r["m"])
    # 8 shards, none pathologically empty or dominant
    sizes = [r["m"] for r in per.collect()]
    assert len(sizes) == 8 and min(sizes) > n / 8 / 3 and max(sizes) < n / 8 * 3
    # partitioning-independent assignment AND order
    again = shuffle_shards(docs.repartition(13), n_shards=8, seed=0)
    assert sorted(map(tuple, out.select("doc_id", "shard", "pos").collect())) == sorted(
        map(tuple, again.select("doc_id", "shard", "pos").collect())
    )
    out.unpersist()
