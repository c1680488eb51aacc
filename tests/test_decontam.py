"""Decontamination + PII redaction (operators/decontam.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.decontam import ngram_contamination, redact_pii


def test_ngram_contamination_flags_overlap_only(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),     # shares a 4-gram w/ bench
            (1, "one two three four five six seven"),        # no overlap
            (2, "alpha beta gamma delta something else"),    # shares the same 4-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta unrelated tail words")],
        "bench_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_contamination(corpus, bench, n=4).collect()}
    assert set(out) == {0, 2}
    assert out[0]["hit_grams"] == 1 and out[0]["total_grams"] == 3
    assert abs(out[0]["contamination"] - 1 / 3) < 1e-6


def test_ngram_contamination_uses_broadcast_join(spark):
    corpus = spark.createDataFrame([(0, "a b c d e f g h i j")], "doc_id long, text string")
    bench = spark.createDataFrame([(1, "a b c d e f g h")], "bench_id long, text string")
    plan = ngram_contamination(corpus, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_redact_pii_patterns_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+spam@corp.example.org now"),
            (1, "server 192.168.0.1 answered"),
            (2, "card 4111111111111111 leaked"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[0]["clean_text"] == "mail me at <EMAIL> now"
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_digits"]) == (1, 0, 0)
    assert out[1]["clean_text"] == "server <IP> answered"
    assert out[1]["n_ipv4"] == 1
    assert out[2]["clean_text"] == "card <NUM> leaked"
    assert out[2]["n_digits"] == 1
    assert out[3]["clean_text"] == "clean text only"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_digits"]) == (0, 0, 0)


def test_repetition_stats_known_values(spark):
    from azuredatalakeindexer_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            (0, "spam ham spam ham spam ham"),   # bigrams: [sh, hs, sh, hs, sh] → 5, distinct 2
            (1, "all words here are unique now"),
            (2, "x"),                            # too short for bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["n_bigrams"] == 5
    assert abs(out[0]["dup_2gram_frac"] - (1 - 2 / 5)) < 1e-6
    assert abs(out[0]["top_bigram_frac"] - 3 / 5) < 1e-6   # "spam ham" ×3
    assert out[1]["dup_2gram_frac"] == 0.0 and out[1]["top_bigram_frac"] == 0.2
    assert out[2]["n_bigrams"] == 0 and out[2]["top_bigram_frac"] == 0.0


def test_fuzzy_contamination_catches_paraphrase_and_skips_unrelated(spark):
    """Planted leakage: a training doc that is a benchmark doc with one word
    changed must surface with high exact-rescored Jaccard; an unrelated doc
    must not appear.  The exact n-gram check (8-grams) would need a long
    verbatim run — the near-dup pass is what catches this edit."""
    from azuredatalakeindexer_spark.operators.decontam import (
        fuzzy_contamination_pairs,
    )

    bench_text = (
        "what is the capital of france paris is the capital and largest city"
    )
    train = spark.createDataFrame(
        [
            (1, bench_text.replace("largest", "biggest")),  # paraphrased leak
            (2, "completely unrelated text about spark shuffle partitions"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in fuzzy_contamination_pairs(train, bench).collect()}
    assert 1 in out and out[1]["bench_id"] == 100
    assert out[1]["jaccard"] > 0.5
    assert 2 not in out
    plan = fuzzy_contamination_pairs(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
