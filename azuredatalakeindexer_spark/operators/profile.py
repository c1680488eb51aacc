"""Data profiling + cardinality sketches — the audit pass a 100 TB lake
ingestion runs before anything else touches the data.

``profile_columns`` generalizes the reference's ad-hoc notion of "how many
documents / which keys" (document counts, ``SearchCountAsync``,
AzureSearchIndexer/README.md) into the standard per-column profile relation;
``approx_distinct_by`` is the mergeable-sketch variant of the exact distinct
aggregation for cardinalities where exactness costs a full shuffle of keys.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def profile_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile in ONE aggregation pass: row count, non-null
    count, exact distinct count, min and max (stringified).

    Returns one row per profiled column:
    ``(column, n_rows, n_nonnull, n_distinct, min_v, max_v)``.

    Plan at scale: a single ``Aggregate`` over the whole relation — Spark
    rewrites the N ``count(DISTINCT col)`` into one Expand (×N row
    multiplication) + two-stage aggregate, so the input is scanned once and
    partial aggregation is map-side.  The result is N rows regardless of
    input size; the long format comes from exploding an array literal of
    per-column structs AFTER the aggregate (zero extra passes).

    Min/max are stringified with a plain cast — callers profiling float
    columns should expect engine-specific decimal formatting (the oracle
    gate profiles integer/string/date columns, where the cast is portable).
    """
    if cols is None:
        cols = df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nonnull"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_v"),
                F.col(f"_max_{c}").alias("max_v"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def approx_distinct_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group approximate distinct count via Spark's HyperLogLog++
    (``approx_count_distinct``), with the exact group row count alongside.

    The sketch is MERGEABLE: partial HLL registers combine map-side, so the
    shuffle moves one fixed-size sketch per (partition, group) instead of
    every distinct value — the difference between shuffling ~1.1 KB per
    group and shuffling 10⁹ user ids at 100 TB.  ``rsd`` is the target
    relative standard deviation (default 5%).

    The estimate is engine-specific by nature (register layout and bias
    correction differ across HLL implementations), so queries built on this
    operator register WITHOUT an oracle (rows-only gate); the tolerance vs
    the exact count is pinned in pytest instead.
    """
    return (
        df.groupBy(*group_cols)
        .agg(
            F.approx_count_distinct(value_col, rsd).alias("approx_distinct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy(*group_cols)
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate percentiles via Spark's ``approx_percentile``
    (Greenwald-Khanna sketch).

    Like the HLL sketch above, the GK summary is MERGEABLE: each partition
    keeps a bounded summary of ~``accuracy`` entries and the shuffle moves
    one summary per (partition, group) instead of every raw value — at
    100 TB that is the difference between an O(n log n) global sort per
    group (the exact ``percentile``) and a fixed-size sketch merge.  The
    rank error is bounded by ``1/accuracy`` of the group size.

    The summary's collapse decisions are engine-specific, so queries built
    on this operator register WITHOUT an oracle (rows-only gate); the rank
    error vs the exact interpolated percentile is pinned in pytest.
    """
    pct = F.percentile_approx(
        value_col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
    )
    out = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"), pct.alias("_qs")
    )
    cols = [F.col("_qs")[i].alias(f"p{int(q * 100)}") for i, q in enumerate(quantiles)]
    return out.select(*group_cols, "n_rows", *cols).orderBy(*group_cols)


def histogram_by(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Per-group equi-width histogram of a numeric column.

    Bounds come from ONE global min/max aggregate (a single-row frame,
    broadcast by the cross join — the same shape as the gap-filling grid
    seed), so every group shares the same bins and rows stay comparable
    across groups.  The bucket expression is plain floor arithmetic —
    ``least(floor((v - lo) / width), n_bins - 1)`` — rather than
    ``width_bucket``, so any engine replays it bit-for-bit.  One Expand-free
    aggregate shuffle; output is one row per (group, non-empty bucket).
    """
    bounds = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(n_bins)
    bucket = F.least(
        F.floor((F.col(value_col) - F.col("_lo")) / width), F.lit(n_bins - 1)
    ).cast("int")
    lo, wd = F.min("_lo"), (F.min("_hi") - F.min("_lo")) / F.lit(n_bins)
    return (
        df.crossJoin(bounds)
        .withColumn("bucket", bucket)
        .groupBy(*group_cols, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(lo + F.col("bucket") * wd, 6).alias("bucket_lo"),
        )
        .orderBy(*group_cols, "bucket")
    )
