"""Hash-trick linear classifier: scoring exactness, training separation,
plan shape (broadcast model, one shuffle)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.classifier import (
    WEIGHT_HALF,
    WEIGHT_MOD,
    WEIGHT_MULT,
    hashed_features,
    reference_weights,
    score_documents,
    score_with_trained,
    train_classifier,
)


def test_score_documents_matches_hand_computation(spark):
    """margin_int is the exact integer sum of per-token-instance weights;
    a repeated token counts twice; empty docs score 0.5."""
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in score_documents(docs, reference_weights(spark)).collect()}

    # recompute doc 1 by hand through the same (portable) hash
    import hashlib

    def bucket(tok):
        h = int(hashlib.md5(f"0|{tok}".encode()).hexdigest()[:15], 16)
        return h % 4096

    def w_int(b):
        return (b + 1) * WEIGHT_MULT % WEIGHT_MOD - WEIGHT_HALF

    exp1 = 2 * w_int(bucket("alpha")) + w_int(bucket("beta"))
    assert out[1]["margin_int"] == exp1
    assert out[1]["n_tokens"] == 3
    z = 8.0 * exp1 / (3 * float(WEIGHT_HALF))
    assert abs(out[1]["score"] - 1 / (1 + math.exp(-z))) < 1e-6
    assert out[2]["margin_int"] == 0 and out[2]["score"] == 0.5
    assert out[3]["n_tokens"] == 1


def test_hashed_features_tf_and_length(spark):
    docs = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    rows = hashed_features(docs).collect()
    assert sorted(r["tf"] for r in rows) == [1, 2]
    assert all(r["n_tokens"] == 3 for r in rows)
    assert all(0 <= r["bucket"] < 4096 for r in rows)


def test_train_separates_planted_classes(spark):
    """Batch-GD logistic regression must separate a two-vocabulary corpus:
    train accuracy >= 0.95 and the score gap between class means is wide."""
    good_words = ["prose", "clear", "thorough", "measured", "insight"]
    spam_words = ["click", "winner", "free", "pills", "casino"]
    rows = []
    for i in range(60):
        gw = " ".join(good_words[j % 5] for j in range(i, i + 7))
        sw = " ".join(spam_words[j % 5] for j in range(i, i + 7))
        rows.append((i, gw, 1))
        rows.append((1000 + i, sw, 0))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, y int"
    )
    wdf, bias = train_classifier(docs, labels, iters=12, lr=4.0)
    scored = score_with_trained(docs, wdf, bias)
    j = scored.join(labels, "doc_id")
    acc = (
        j.select(((F.col("score") > 0.5).cast("int") == F.col("y")).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95
    means = {
        r["y"]: r["m"]
        for r in j.groupBy("y").agg(F.avg("score").alias("m")).collect()
    }
    assert means[1] - means[0] > 0.5


def test_scoring_plan_broadcasts_model_one_shuffle(spark):
    """The weight table must reach the tokens via BroadcastHashJoin; the
    only corpus shuffle is the groupBy(doc_id) margin aggregation (plus
    the left join back to doc ids on the same key)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(100)], "doc_id long, text string"
    )
    plan = (
        score_documents(docs, reference_weights(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
