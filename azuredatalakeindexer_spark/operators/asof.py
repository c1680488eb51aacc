"""As-of (point-in-time) join — the time-series join Spark lacks natively.

For each left row, attach the most recent right row (same keys) with
``right_ts <= left_ts``.  The naive formulation is an inequality join —
Catalyst can only plan it as a broadcast nested loop or a range explosion —
so this implements the scalable MERGE-SORT formulation instead:

1. tag both sides and UNION them (right payload nulled on left rows),
2. one window per key ordered by ``(ts, side, payload)`` carrying the last
   non-null right payload forward (``last(ignorenulls)`` over an unbounded-
   preceding frame),
3. keep the left rows, now holding their as-of match.

Cost: ONE shuffle of ``|left| + |right|`` rows on the join keys and a
per-key sort — the same complexity as a regular sort-merge join, at any
scale, with no |left|×|right| blow-up.  Ties: a right row at exactly
``left_ts`` matches (inclusive backward); multiple right rows at the same
(key, ts) resolve deterministically to the greatest payload struct — dedupe
the right side first if you need a different rule.

DuckDB has a native ``ASOF JOIN``, which the correctness oracle uses — two
completely independent implementations agreeing on every row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row with ``right_cols`` (default: all non-key,
    non-ts right columns) and ``right_ts`` appended under ``suffix``; rows
    with no earlier right match carry nulls (left-join semantics).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(on) | {right_ts}]

    lp_cols = list(left.columns)
    lp_type = left.select(F.struct(*lp_cols).alias("s")).schema["s"].dataType
    rp_fields = right_cols + [right_ts]
    rp_type = right.select(F.struct(*rp_fields).alias("s")).schema["s"].dataType

    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lp_cols).alias("_lp"),
        F.lit(None).cast(rp_type).alias("_rp"),
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lp_type).alias("_lp"),
        F.struct(*rp_fields).alias("_rp"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l2.unionByName(r2).withColumn(
        "_match", F.last("_rp", ignorenulls=True).over(w)
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col(f"_lp.{c}").alias(c) for c in lp_cols],
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
        F.col(f"_match.{right_ts}").alias(f"{right_ts}{suffix}"),
    )
