"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — the per-document scoring stages of a training-data
pipeline, generalizing the reference's analyzer normalization (F6/F7).

All pure Catalyst column expressions (whole-stage-codegen'd); each operator
has an exact DuckDB oracle.  At scale these are embarrassingly parallel
narrow transformations — zero shuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from azuredatalakeindexer_spark.operators.util import ensure_parallelism
from azuredatalakeindexer_spark.functions.text import (
    char_fingerprint,
    regex_tokens,
    rolling_fingerprint,
    stopword_hits,
    tokens,
)

#: tiny per-language discriminator lexicons for the n-gram/stopword heuristic.
#: Real deployments plug in fastText-style models via mapInPandas; the
#: heuristic keeps the operator shape (and the oracle) pure-SQL.
LANG_LEXICONS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "small"],
    "es": ["data", "table", "row"],
    "fr": ["query", "merge", "stream"],
    "de": ["hash", "scan", "window"],
    "zh": ["spark", "vector", "agg"],
}


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language lexicon hit counts,
    first-listed language wins ties (deterministic)."""
    docs = ensure_parallelism(docs)
    toks = tokens(F.col(text_col))
    out = docs.select(F.col(id_col), toks.alias("_toks"))
    for lang, lex in LANG_LEXICONS.items():
        out = out.withColumn(f"_hits_{lang}", stopword_hits(F.col("_toks"), lex))
    langs = list(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"_hits_{l}") for l in langs])
    pred = None
    # first language reaching the max wins — build the CASE in listed order
    for l in reversed(langs):
        cond = F.when(F.col(f"_hits_{l}") == best, F.lit(l))
        pred = cond.otherwise(pred) if pred is not None else cond
    return out.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        *[F.col(f"_hits_{l}").alias(f"hits_{l}") for l in langs],
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document quality features + a deterministic linear score.

    Features mirror the usual pretraining filters (Gopher/C4 rules):
    token count, mean token length, stopword ratio, non-alnum ratio.
    """
    docs = ensure_parallelism(docs)
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.length(F.col(text_col)).alias("n_chars_m"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
    )
    n_tok = F.size("_toks")
    mean_len = F.when(n_tok > 0, F.aggregate(F.col("_toks"), F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)) / n_tok).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_tok > 0, stopword_hits(F.col("_toks"), LANG_LEXICONS["en"]) / n_tok).otherwise(F.lit(0.0))
    score = F.round(
        F.lit(0.25) * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + F.lit(0.25) * F.least(mean_len / F.lit(8.0), F.lit(1.0))
        + F.lit(0.5) * sw_ratio,
        6,
    )
    return base.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        score.alias("quality"),
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens."""
    docs = ensure_parallelism(docs)
    toks = tokens(F.col(text_col))
    rtoks = regex_tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("ws_tokens"),
        F.size(rtoks).alias("regex_tokens"),
        F.size(F.array_distinct(toks)).alias("distinct_tokens"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting: order-sensitive rolling hash + normalized
    char-prefix md5 (cheap exact-dup key)."""
    docs = ensure_parallelism(docs)
    toks = tokens(F.col(text_col))
    return docs.select(
        F.col(id_col),
        rolling_fingerprint(toks).alias("rolling_fp"),
        char_fingerprint(F.col(text_col)).alias("char_fp"),
    )
