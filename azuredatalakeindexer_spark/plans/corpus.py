"""End-to-end training-corpus construction: the composition a pretraining
data pipeline runs over a raw document lake.

Funnel (the standard C4/Gopher ordering — cheap narrow filters first, then
the shuffling dedup stages over the shrinking survivor set):

1. **score** — quality features + language ID + exact-content hash, all in
   ONE narrow projection over the corpus (no per-stage re-scan, no
   self-joins; the expression builders are shared with
   ``operators/textops.py`` so the stage semantics equal the standalone
   oracle-gated operators).
2. **filter** — drop low-quality (``quality < quality_threshold``) and
   wrong-language (``pred_lang != lang``) documents.
3. **exact dedup** — min-id per normalized-content hash among survivors
   (one window shuffle on the 128-bit hash).
4. **near-dup dedup** — MinHash-LSH pairs over the exact-canonical
   survivors only, connected components, keep the min-id member per
   component.

Every document receives a ``stage`` attribution (the FIRST stage that
dropped it, or ``kept``) so per-stage funnel counts are one ``groupBy``
away — the observability a 100 TB curation run needs.

Scale notes: the scored relation feeds the filter chain, the dedup
branches, and the final attribution join, so it is materialized once
(``localCheckpoint``; swap for a table write / reliable ``checkpoint()``
on a real cluster).  Everything downstream shuffles only survivors, and
the two attribution joins are plain doc_id equi-joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from azuredatalakeindexer_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from azuredatalakeindexer_spark.operators.textops import (
    language_pred,
    language_scores,
    quality_columns,
)
from azuredatalakeindexer_spark.operators.util import ensure_parallelism
from azuredatalakeindexer_spark.functions.text import tokens


def build_training_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = 0.3,
    lang: str = "en",
) -> DataFrame:
    """Run the full curation funnel; returns one row per input document:
    ``(doc_id, pred_lang, quality, n_tokens, stage, kept)`` where ``stage``
    ∈ {low_quality, wrong_language, exact_dup, near_dup, kept} and
    ``kept = (stage == 'kept')`` as int."""
    docs = ensure_parallelism(docs)
    toks = tokens(F.col(text_col))
    qcols = quality_columns(toks)
    scored = docs.select(
        F.col(id_col),
        F.col(text_col),
        language_pred(language_scores(toks)).alias("pred_lang"),
        qcols["quality"].alias("quality"),
        qcols["n_tokens"].alias("n_tokens"),
        F.md5(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")).alias("_chash"),
    ).localCheckpoint()

    eligible = scored.where(
        (F.col("quality") >= quality_threshold) & (F.col("pred_lang") == lang)
    )
    exact = eligible.withColumn(
        "_canon", F.min(id_col).over(Window.partitionBy("_chash"))
    ).select(F.col(id_col), F.col(text_col), F.col("_canon"))
    canon_docs = exact.where(F.col(id_col) == F.col("_canon")).select(
        F.col(id_col), F.col(text_col)
    )
    labels = connected_components(
        minhash_lsh_pairs(canon_docs, text_col=text_col, id_col=id_col)
    )

    out = (
        scored.join(exact.select(id_col, "_canon"), id_col, "left")
        .join(labels.withColumnRenamed("id", id_col), id_col, "left")
    )
    stage = (
        F.when(F.col("quality") < quality_threshold, F.lit("low_quality"))
        .when(F.col("pred_lang") != lang, F.lit("wrong_language"))
        .when(F.col("_canon") != F.col(id_col), F.lit("exact_dup"))
        .when(
            F.coalesce("cluster_id", F.col(id_col)) != F.col(id_col),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
    )
    return out.select(
        F.col(id_col),
        F.col("pred_lang"),
        F.col("quality"),
        F.col("n_tokens"),
        stage.alias("stage"),
        (stage == "kept").cast("int").alias("kept"),
    )
