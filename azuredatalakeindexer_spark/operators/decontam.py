"""Benchmark decontamination + PII redaction for training-data pipelines.

Decontamination is the n-gram collision test every serious pretraining run
performs (the GPT-3 appendix-C / PaLM style check): a training document is
contaminated if it shares any word n-gram with an evaluation-benchmark
document.  The benchmark side is small by construction (eval sets are
thousands of rows, not billions), so the gram set broadcasts and the check
is a broadcast semi-join against the corpus gram stream — no shuffle of the
corpus, no all-pairs product, scales linearly in corpus size.

PII redaction is a narrow regexp pass (emails / IPv4 / long digit runs)
kept to the regex subset Java and RE2 share, so the DuckDB oracle replays
it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from azuredatalakeindexer_spark.functions.text import tokens, word_ngrams
from azuredatalakeindexer_spark.operators.util import ensure_parallelism

#: redaction patterns in the Java∩RE2 regex subset (no lookaround, no \b
#: ambiguity): order matters — emails first so their digits don't get caught
#: by the digit-run rule.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("digits", r"[0-9]{7,}", "<NUM>"),
]


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report against a benchmark set.

    Returns one row per corpus document sharing ≥1 word ``n``-gram with any
    benchmark document: ``(doc_id, hit_grams, total_grams, contamination)``
    where ``contamination = hit_grams / total_grams`` (both counted over the
    document's DISTINCT grams).

    Plan shape: the benchmark gram set (distinct, typically ≪ 10⁷ rows)
    is broadcast; the corpus gram stream semi-joins it and aggregates per
    document — one map-side-combined groupBy, zero corpus self-shuffles.
    """
    doc_grams = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
            ).alias("gram"),
        )
    )
    bench_grams = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
            ).alias("gram")
        )
        .distinct()
    )
    hits = doc_grams.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "gram", "left"
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).alias("hit_grams"),
            F.count(F.lit(1)).alias("total_grams"),
        )
        .where(F.col("hit_grams") > 0)
        .select(
            F.col(id_col),
            F.col("hit_grams"),
            F.col("total_grams"),
            F.round(F.col("hit_grams") / F.col("total_grams"), 6).alias("contamination"),
        )
    )


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Redact emails / IPv4 addresses / long digit runs; returns
    ``(doc_id, clean_text, n_emails, n_ipv4, n_digits)`` with per-pattern
    match counts (counted BEFORE redaction, on the original text).

    Narrow, zero-shuffle, whole-stage-codegen'd — the redaction chain is
    three ``regexp_replace`` calls in :data:`PII_PATTERNS` order.
    """
    docs = ensure_parallelism(docs)
    clean = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select(F.col(id_col), clean.alias("clean_text"), *counts)
