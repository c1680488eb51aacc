"""Distributed BPE training/encoding (operators/bpe.py): classic-corpus
merge trajectory, run-merge correctness, vocabulary-cached encoding."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from azuredatalakeindexer_spark.operators.bpe import (
    apply_merges,
    encode_bpe,
    train_bpe,
)


@pytest.fixture(scope="module")
def classic_docs(spark):
    # Sennrich et al.'s worked example as documents: low×5, lower×2,
    # newest×6, widest×3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string").cache()
    df.count()
    yield df
    df.unpersist()


def test_train_bpe_classic_merge_trajectory(classic_docs):
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in train_bpe(classic_docs, n_merges=3).orderBy("rank").collect()
    ]
    # hand-derived: es=9 (st ties at 9, es wins left-asc), then es+t=9,
    # then lo=7 (ow ties at 7, l < o)
    assert got == [
        (1, "e", "s", "es", 9),
        (2, "es", "t", "est", 9),
        (3, "l", "o", "lo", 7),
    ]


def test_apply_merges_handles_symbol_runs(spark):
    # ' a  a  a  a ' must become ' aa  aa ' in ONE pass (non-overlapping
    # left-to-right replace — the docstring's correctness argument)
    words = spark.createDataFrame([("aaaa",), ("aaa",)], "word string")
    out = {r["word"]: r["bpe_tokens"] for r in
           apply_merges(words, [("a", "a")]).collect()}
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aaa"] == ["aa", "a"]


def test_encode_bpe_counts_via_word_cache(classic_docs, spark):
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    out = encode_bpe(classic_docs, merges).collect()
    assert len(out) == 1
    r = out[0]
    # 16 words; subword counts: low=[lo,w]→2 ×5, lower=[lo,w,e,r]→4 ×2,
    # newest=[n,e,w,est]→4 ×6, widest=[w,i,d,est]→4 ×3
    assert r["n_words"] == 16
    assert r["n_bpe_tokens"] == 2 * 5 + 4 * 2 + 4 * 6 + 4 * 3

    plan = encode_bpe(classic_docs, merges)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan   # word-cache join, corpus never shuffles to it


def test_train_bpe_stops_when_no_pairs_left(spark):
    df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    out = train_bpe(df, n_merges=5).collect()
    # 'ab' has one pair; after merging it nothing remains
    assert [(r["rank"], r["merged"]) for r in out] == [(1, "ab")]
