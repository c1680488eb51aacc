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


def fuzzy_contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Cross-corpus NEAR-duplicate contamination: MinHash-LSH banding
    between the training corpus and a benchmark/eval set.

    :func:`ngram_contamination` catches verbatim n-gram overlap; this
    catches the paraphrased/reformatted eval leakage that exact n-grams
    miss (whitespace changes, a reworded sentence) — the fuzzy
    decontamination pass modern pretraining pipelines run alongside the
    exact one.  A (train, bench) pair is a candidate when any band of
    their MinHash signatures collides (the same banding scheme as
    :func:`~azuredatalakeindexer_spark.operators.dedup.minhash_lsh_pairs`);
    candidates are then rescored with the EXACT shingle Jaccard, so the
    reported similarity is true overlap, not an estimate.

    Plan shape: banding is per-document and narrow on both sides; the
    benchmark side (small by construction) broadcasts into the band
    equi-join, candidates dedup to id pairs before rescoring, and the
    rescore joins the train shingle relation once — the corpus never
    self-joins and the bipartite fan-out is bounded by |bench| per band
    bucket.  Returns ``(doc_id, bench_id, jaccard)`` for pairs ≥
    ``threshold``.
    """
    from azuredatalakeindexer_spark.functions.text import (
        band_key,
        gram_hashes,
        minhash_signature,
    )
    from azuredatalakeindexer_spark.operators.dedup import _shingled

    band_size = num_hashes // bands

    def prep(df: DataFrame, ident: str) -> tuple[DataFrame, DataFrame]:
        # shingles feed banding AND exact rescoring — tokenize once
        sh = _shingled(df, text_col, id_col, shingle).localCheckpoint()
        hashed = sh.select(F.col(id_col), gram_hashes(F.col("grams")).alias("hs"))
        sig = hashed.select(
            F.col(id_col), minhash_signature(F.col("hs"), num_hashes).alias("sig")
        )
        banded = sig.select(
            F.col(id_col).alias(ident),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band"),
                        band_key(F.col("sig"), b, band_size).alias("bh"),
                    )
                    for b in range(bands)
                ])
            ).alias("bk"),
        ).select(ident, "bk.band", "bk.bh")
        return sh, banded

    tsh, tband = prep(docs, id_col)
    bsh, bband = prep(benchmark, "bench_id")
    cand = (
        tband.join(F.broadcast(bband), ["band", "bh"])
        .select(id_col, "bench_id")
        .distinct()
    )
    ga = tsh.select(F.col(id_col), F.col("grams").alias("_ga"))
    gb = bsh.select(F.col(id_col).alias("bench_id"), F.col("grams").alias("_gb"))
    return (
        cand.join(ga, id_col)
        .join(F.broadcast(gb), "bench_id")
        .withColumn("_inter", F.size(F.array_intersect("_ga", "_gb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter") / (F.size("_ga") + F.size("_gb") - F.col("_inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select(F.col(id_col), F.col("bench_id"), F.col("jaccard"))
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
