"""Deterministic sampling + token-budget mixing for training-data pipelines.

Pretraining runs can't use ``rand()``: a sample must be reproducible across
reruns, engines, and partitionings (and auditable — "why is doc X in the
mix?").  Everything here is keyed on
:func:`azuredatalakeindexer_spark.functions.text.portable_hash64`, so the
sample is a pure function of the row key: re-running, re-partitioning, or
replaying in the DuckDB oracle yields byte-identical output.

Scale shapes:
- :func:`hash_sample` is a narrow filter — no shuffle, constant memory,
  survives any scale-up, and composes with partition pruning upstream.
- :func:`stratified_sample` is one window shuffle on the strata columns;
  per-stratum state is a single counter (rank), never a buffer.
- :func:`token_budget_pack` is one window shuffle on the stratum plus a
  running sum — the greedy quality-first knapsack every "build an N-token
  mix" job runs.  Skewed strata parallelize across (not within) strata;
  for one mega-stratum pre-split by a salt on the hash order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from azuredatalakeindexer_spark.functions.text import portable_hash64
from azuredatalakeindexer_spark.operators.util import ensure_parallelism

#: denominator of the sampling ratio: rate is quantized to millionths so the
#: keep predicate is exact integer arithmetic (identical in Spark and DuckDB)
SAMPLE_DENOM = 1_000_000


def sample_bucket(key, seed: int = 0):
    """The row's deterministic sampling bucket in [0, SAMPLE_DENOM): a pure
    function of the key, uniform by the md5 mixing of portable_hash64."""
    return portable_hash64(key, seed) % SAMPLE_DENOM


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``rate`` — deterministic,
    shuffle-free sampling.

    ``keep ⇔ portable_hash64(key) % 1e6 < rate * 1e6``.  Unlike
    ``df.sample()``, the result is independent of partitioning and rerun-
    stable, and disjoint seeds give independent samples (held-out splits).
    """
    threshold = int(rate * SAMPLE_DENOM)
    return ensure_parallelism(df).where(
        sample_bucket(F.col(key_col), seed) < F.lit(threshold)
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen by the
    deterministic hash order (a reproducible "random" draw).

    TWO-PHASE top-n so a mega-stratum never serializes on one reducer:
    phase 1 ranks within ``(stratum, input partition)`` — every group is at
    most one partition's slice, so the shuffle is balanced regardless of
    stratum skew — and keeps ``n`` candidates per group; phase 2 ranks the
    surviving ``≤ n × num_partitions`` candidates per stratum.  The final
    result is exact (a stratum's true top-n is contained in the union of
    its per-partition top-ns).  Ties are impossible: the hash order is
    keyed on the unique ``key_col``.
    """
    order = [sample_bucket(F.col(key_col), seed).asc(), F.col(key_col).asc()]
    w1 = Window.partitionBy(*strata_cols, "_pid").orderBy(*order)
    w2 = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        ensure_parallelism(df)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= n_per_stratum)
        .withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_pid", "_r1", "_rk")
    )


def token_budget_pack(
    docs: DataFrame,
    budget_tokens: int,
    stratum_col: str = "lang",
    token_col: str = "n_tokens",
    quality_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy quality-first token-budget selection per stratum: order each
    stratum by (quality desc, id), keep documents while the running token
    total stays within ``budget_tokens``.

    The keep rule admits the document that *crosses* the budget line
    (cum - n < budget), matching the usual "fill to at least N tokens"
    semantics.  One window shuffle on the stratum; the running sum is O(1)
    state per stratum.  Returns the kept rows with their ``cum_tokens``.
    """
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ensure_parallelism(docs)
        .withColumn("cum_tokens", F.sum(token_col).over(w))
        .where(F.col("cum_tokens") - F.col(token_col) < budget_tokens)
    )
