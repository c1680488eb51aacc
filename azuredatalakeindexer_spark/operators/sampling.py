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


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    strata_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the ``k``
    rows (per stratum) with the largest Efraimidis-Spirakis keys
    ``u^(1/w)`` — equivalently the largest ``ln(u)/w`` — where ``u`` is a
    deterministic uniform drawn from the row key's hash.

    Every row's inclusion probability is proportional to its weight (the
    ES weighted-reservoir scheme, Efraimidis & Spirakis 2006), but the
    draw is a pure function of ``(key, seed)``: rerun-, partitioning- and
    engine-stable like everything else in this module, so the oracle
    replays it exactly.  The sort key is rounded to 1e-6 BEFORE ranking
    (cross-engine ``ln`` agrees to far better than that, but rank must
    order by the very value both engines agree on), with the unique key as
    tie-break.

    Same two-phase top-k shape as :func:`stratified_sample`: a mega-corpus
    never funnels through one reducer.  Weights must be > 0 (rows with
    non-positive weight are dropped, matching ES semantics where w → 0
    means never sampled).
    """
    strata = list(strata_cols or [])
    u = (sample_bucket(F.col(key_col), seed) + F.lit(0.5)) / F.lit(SAMPLE_DENOM)
    es_key = F.round(F.log(u) / F.col(weight_col), 6)
    order = [F.col("_es").desc(), F.col(key_col).asc()]
    w1 = Window.partitionBy(*strata, "_pid").orderBy(*order)
    w2 = Window.partitionBy(*strata).orderBy(*order)
    return (
        ensure_parallelism(df)
        .where(F.col(weight_col) > 0)
        .withColumn("_es", es_key)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= k)
        .drop("_pid", "_r1", "_rk")
    )


def pack_training_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 32,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing: lay the corpus out as fixed-length training
    sequences (concat-and-chunk, the standard pretraining sample packing).

    Documents are deterministically sharded (``hash(id) % n_shards`` — the
    unit of parallelism, like the reference's uploader workers in
    ``plan_batches``); within a shard the token stream is the documents in
    id order, chunked every ``seq_len`` tokens.  A document whose span
    crosses chunk boundaries belongs to every chunk it touches.

    Per-shard window prefix-sum (O(1) state); each shard's chunk ids are
    independent, so sequence ids are ``(shard, chunk)`` pairs.  Returns one
    row per (document × touched chunk): ``(doc_id, shard, chunk, start_tok,
    end_tok)`` where start/end are the document's token offsets within the
    chunk (end exclusive, ≤ seq_len).
    """
    sh = F.pmod(portable_hash64(F.col(id_col), seed=1), F.lit(n_shards))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.col(token_col).alias("_n"), sh.alias("shard"))
        .where(F.col("_n") > 0)
        .withColumn("_end", F.sum("_n").over(w))
        .withColumn("_start", F.col("_end") - F.col("_n"))
    )
    first = F.floor(F.col("_start") / seq_len)
    last = F.floor((F.col("_end") - 1) / seq_len)
    return (
        pos.withColumn("chunk", F.explode(F.sequence(first, last)))
        .select(
            F.col(id_col),
            F.col("shard").cast("int").alias("shard"),
            F.col("chunk").cast("bigint").alias("chunk"),
            F.greatest(F.col("_start") - F.col("chunk") * seq_len, F.lit(0))
            .cast("bigint")
            .alias("start_tok"),
            F.least(F.col("_end") - F.col("chunk") * seq_len, F.lit(seq_len))
            .cast("bigint")
            .alias("end_tok"),
        )
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


def temperature_mix(
    docs: DataFrame,
    alpha: float,
    target_total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Temperature-based domain mixing: sample each source at a rate that
    flattens the corpus distribution toward ``n_s^alpha`` (the mT5 /
    multilingual-pretraining recipe — alpha=1 keeps natural proportions,
    alpha=0 equalizes sources).

    Per source, weight ``q_s = n_s^alpha / sum_t n_t^alpha``, target rows
    ``target_total * q_s``, keep rate ``min(target / n_s, 1)`` quantized to
    millionths; membership is then :func:`hash_sample`'s deterministic
    bucket test, so the mix is a pure function of (id, seed) and the DuckDB
    oracle replays it exactly.

    Scale shape: one tiny groupBy on the source column (hundreds of rows at
    any corpus size), rates broadcast-joined back, then a narrow filter —
    the corpus itself never shuffles.  Exact expected counts, not exact
    counts: quantized-rate sampling is the scheme that needs no global sort
    or per-source row_number at 10^10 rows.
    """
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    total_w = counts.agg(
        F.sum(F.pow(F.col("_n").cast("double"), F.lit(alpha))).alias("_wsum")
    )
    rates = counts.crossJoin(F.broadcast(total_w)).select(
        source_col,
        F.least(
            # round to 1e-6 of a ppm BEFORE floor: the pow/sum/divide chain
            # is double arithmetic, and a last-ulp engine difference exactly
            # at an integer boundary would otherwise flip floor (and with it
            # every doc in that bucket) between Spark and the oracle — the
            # same quantize-before-rank rule weighted_sample applies
            F.floor(
                F.round(
                    F.lit(target_total)
                    * F.pow(F.col("_n").cast("double"), F.lit(alpha))
                    / F.col("_wsum")
                    / F.col("_n")
                    * SAMPLE_DENOM,
                    6,
                )
            ).cast("bigint"),
            F.lit(SAMPLE_DENOM).cast("bigint"),
        ).alias("_thresh"),
    )
    return (
        ensure_parallelism(docs)
        .join(F.broadcast(rates), source_col)
        .where(sample_bucket(F.col(id_col), seed) < F.col("_thresh"))
        .drop("_thresh")
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic global training-order shuffle + sharding: every row
    gets a ``shard`` in [0, n_shards) and a dense ``pos`` within its shard,
    both pure functions of (id, seed) — the "shuffle then shard" step
    between curation and sequence packing, rerun-stable and replayable by
    the oracle (unlike ``orderBy(rand())``).

    ``h = portable_hash64(id, seed)``; ``shard = h mod n_shards``; ``pos``
    ranks ``h div n_shards`` (independent low/high bits of the same 60-bit
    hash) with the id as tie-break.  One shuffle on the shard key; within a
    shard the sort is the write-time sort every shard writer needs anyway.
    A global total order would be a single-task sort at 10^10 rows — the
    per-shard order is what downstream loaders consume (they interleave
    shards), so none is needed.
    """
    w = Window.partitionBy("shard").orderBy(
        F.col("_horder").asc(), F.col(id_col).asc()
    )
    return (
        ensure_parallelism(docs)
        .withColumn("_h", portable_hash64(F.col(id_col), seed))
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        # integer DIV, not `/`: double division of a 60-bit hash rounds away
        # the low bits (53-bit mantissa) and the order stops matching the
        # oracle's exact integer arithmetic
        .withColumn("_horder", F.expr(f"_h DIV {int(n_shards)}"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("_h", "_horder")
    )
