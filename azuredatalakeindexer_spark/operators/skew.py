"""Skew-absorbing aggregation: explicit two-phase (salted) groupBy.

AQE's skew-join splitting handles skewed JOINS at runtime, but a skewed
GROUP BY with a non-algebraic downstream (or with AQE disabled / a hot key
dominating one reducer) still serializes on the hot key's single reduce
task.  The classic fix is salting: aggregate on ``(key, salt)`` first —
spreading the hot key over ``n_salts`` reducers — then combine the partial
aggregates per key.  Both phases are map-side-combined hash aggregations;
total shuffle volume grows by at most ``n_salts`` rows per key, and the hot
key's reduce work drops by ``n_salts``×.

Only algebraic aggregates (count/sum/min/max and anything expressible as a
merge of partials) are eligible — which is why this helper takes the
partial and merge expressions explicitly instead of guessing.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``key_cols`` with a ``n_salts``-way salt.

    ``partial_aggs`` maps output column name → aggregate over the raw rows
    (phase 1, grouped by key+salt); ``merge_aggs`` maps the same names →
    aggregate over the phase-1 partials (phase 2, grouped by key only).
    E.g. count: partial ``count(1)``, merge ``sum(partial)``; min: partial
    ``min(x)``, merge ``min(partial)``.

    The salt is ``pmod(hash(all columns' partition id surrogate), n)`` — we
    use ``spark_partition_id()`` so the salt is free (no data hashed) and
    each input partition's rows for a hot key land on at most one salt,
    which preserves map-side combining.
    """
    salted = df.withColumn("_salt", F.spark_partition_id() % n_salts)
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )


def salted_counts(df: DataFrame, key_cols: list[str], n_salts: int = 16) -> DataFrame:
    """Skew-proof ``groupBy(key).count()``: the most common hot-key victim.

    Result is identical to the direct count (two-phase counting is exact);
    the plan contains two exchanges — (key, salt) then (key) — with the
    second one tiny (``n_salts`` rows per key max).
    """
    return salted_agg(
        df,
        key_cols,
        {"n": F.count(F.lit(1))},
        {"n": F.sum("n")},
        n_salts,
    )
