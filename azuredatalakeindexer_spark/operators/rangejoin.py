"""Binned range join — the inequality join Spark can only BNLJ natively.

``right_ts ∈ [left_ts + lower, left_ts + upper)`` with NO equality key is
the join shape Catalyst cannot hash: it plans BroadcastNestedLoopJoin (or a
CartesianProduct), an O(|L|·|R|) scan that dies long before 100 TB.  The
streaming interval join (streaming/joins.py) dodges this because it carries
a ``user_id`` equi-key; this operator is the BATCH answer for the general
case — interval overlap, time-window correlation, numeric band joins.

The standard fix (Databricks range-join binning, DuckDB IEJoin literature)
is to manufacture an equi-key: pick the bin width equal to the window
length ``upper - lower``, so

* every RIGHT row lands in exactly ONE bin: ``floor(ts / w)``,
* every LEFT row's window ``[ts+lower, ts+upper)`` spans at most TWO
  consecutive bins (its length is exactly ``w``) — a constant ≤2 fan-out
  via ``explode(sequence(b0, b1))``, independent of data volume,
* the bin equi-join is a plain shuffled hash/sort-merge join, and the
  exact predicate re-applied post-join keeps only true matches.  Each
  matching pair agrees on the single bin the right row occupies, so no
  pair duplicates and no ``distinct`` is needed.

Cost at any scale: one shuffle of ``2|L| + |R|`` rows on the bin key —
the same complexity as a regular equi-join.  Bin skew (a hot time window)
is ordinary aggregation skew, handled by AQE skew-join splitting, not a
plan blow-up.  A plan-hygiene test pins that no BNLJ/CartesianProduct
appears even with broadcasting disabled.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_INTEGRALS = ("int", "bigint", "smallint", "tinyint")


def _to_long(df: DataFrame, col: str) -> F.Column:
    """The join axis as an exact int64: epoch micros for timestamps,
    the value itself for integral columns (floats are rejected — binning
    needs exact arithmetic; scale them to integers first)."""
    t = dict(df.dtypes)[col]
    if t in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(col))
    if t in _INTEGRALS:
        return F.col(col).cast("long")
    raise ValueError(
        f"range_join_binned needs a timestamp or integral axis column; "
        f"{col} is {t} — scale floats to an exact integer unit first"
    )


def _floordiv(col: F.Column, w: int) -> F.Column:
    """Exact int64 floor division (toward -inf).  ``floor(col / w)`` would
    round-trip through double and lose exactness past 2^53; ``DIV``
    truncates toward zero on negatives.  Subtracting the positive
    remainder first keeps everything in int64 and floors correctly for
    any sign."""
    posmod = F.pmod(col, F.lit(w))
    return ((col - posmod) / F.lit(w)).cast("long")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with
    ``right_ts ∈ [left_ts + lower, left_ts + upper)``.

    ``lower``/``upper`` are offsets in MICROSECONDS for timestamp axes
    (use ``seconds * 1_000_000``) and in the column's own unit for
    integral axes.  ``on`` adds optional equality keys to the bin join.
    ``how``: ``inner`` or ``left`` (unmatched left rows null-extended;
    requires left column names to be unique within ``left``).

    Output: all left columns, then right columns (collisions suffixed
    ``_r``).  Rows with a NULL axis value never match (SQL semantics);
    under ``how='left'`` they surface null-extended like any other
    matchless row.
    """
    if upper <= lower:
        raise ValueError(f"empty window: [{lower}, {upper})")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on or [])
    w = upper - lower

    lcols, rcols = list(left.columns), list(right.columns)
    # `on` keys stay unrenamed (merged by the USING join, surfaced from the
    # left side); other collisions get the _r suffix
    rename = {c: f"{c}_r" for c in rcols if c in set(lcols) and c not in set(on)}
    out_rcols = [rename.get(c, c) for c in rcols if c not in set(on)]

    laxis = _to_long(left, left_ts)
    # window start/end on the int64 axis; span/w <= 2 bins by construction
    l2 = left.select(
        "*",
        (laxis + F.lit(lower)).alias("_lo"),
        (laxis + F.lit(upper)).alias("_hi"),
    )
    lb = l2.select(
        "*",
        F.explode(
            F.sequence(_floordiv(F.col("_lo"), w), _floordiv(F.col("_hi") - 1, w))
        ).alias("_bin"),
    )
    r2 = right.select(
        *[F.col(c).alias(rename.get(c, c)) for c in rcols],
        _to_long(right, right_ts).alias("_rts"),
    ).withColumn("_bin", _floordiv(F.col("_rts"), w))

    matched = (
        lb.join(r2, on=["_bin", *on], how="inner")
        .where((F.col("_rts") >= F.col("_lo")) & (F.col("_rts") < F.col("_hi")))
        .select(*lcols, *out_rcols)
    )
    if how == "inner":
        return matched
    # left outer: null-extend left rows with no match.  The exploded left
    # can't be outer-joined directly (a row with a match in one bin would
    # still null-emit from its other bin), so unmatched rows come from an
    # anti-join of the ORIGINAL left against the matched left keys.
    unmatched = left.join(
        matched.select(*lcols).distinct(), on=lcols, how="left_anti"
    )
    for c, t in matched.select(*out_rcols).dtypes:
        unmatched = unmatched.withColumn(c, F.lit(None).cast(t))
    return matched.unionByName(unmatched)
