"""Z-order (Morton) interleaving: multi-column data clustering.

Range-sorting a table on one column makes parquet min/max pruning free for
THAT column and useless for every other.  Interleaving the bits of two key
columns into one Morton code and range-sorting on it gives every output
file a small rectangle in (a, b) space — so selective predicates on EITHER
column prune most files.  This is the standard lakehouse layout trick for
two-dimensional access patterns (e.g. the path index queried by both
``lastModified`` and ``filesystem`` hash).

Pure integer Catalyst expressions (shift/mask/or), replayed bit-for-bit by
the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative ints using their low ``bits`` bits:
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Callers scale/clamp inputs into [0, 2^bits) first (quantile bucketing
    for skewed domains); 2 × bits ≤ 62 keeps the result in int64.
    """
    assert 2 * bits <= 62, "z_value must fit in int64"
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` z-order-clustered on ``(col_a, col_b)``: range-partition
    on the Morton code (parallel writers, like
    ``sources/bucketed.py::write_range_sorted``) and sort within files.
    Each file then covers a small (a, b) rectangle, so parquet min/max
    prunes on both columns."""
    z = z_value(F.col(col_a), F.col(col_b), bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
