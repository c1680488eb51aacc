"""Build a larger-SF bench dataset by replicating an existing fixture dir.

The driver ships sf0.001/0.01/0.1 only; VERDICT r4 next-#8 asks for a
larger-scale bench run to show the sf0.1 ratios hold once per-plan fixed
overhead amortizes.  This tool replicates the fact-shaped tables K times
with non-colliding primary-key offsets and leaves the dimension tables
untouched, preserving referential integrity (replicated orders/lineitem
share the same orderkey offset; o_custkey etc. stay in the original dim
ranges) and the value distributions the queries filter on:

    python tools/make_scaled_sf.py /root/testdata/sf0.1 .benchdata/sf0.5 5

Replication notes per table:
- region, nation, customer, supplier, part: copied as-is (dims; TPC-H
  scaling also leaves region/nation fixed).
- orders + lineitem: o_orderkey/l_orderkey += copy * 10^7 (same offset on
  both sides keeps the Q3/Q4-shaped joins meaningful).
- events: event_id += copy * 10^7; user_id/ts unchanged, so per-user and
  per-hour densities scale with the copy count.
- documents: doc_id += copy * 10^7; non-zero copies get a per-copy suffix
  token appended to ``text`` so exact dedup is not trivially degenerate
  while the near-dup operators see realistic cross-copy near-duplicates.
- embeddings: vec_id += copy * 10^7; vectors unchanged — cross-copy exact
  duplicate vectors are a deliberate stress for the bounded-bucket
  near-dup guard.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.session import get_spark

OFF = 10_000_000

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACT_KEYS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t, keys in FACT_KEYS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        copies = []
        for c in range(k):
            df = base
            for key in keys:
                df = df.withColumn(key, F.col(key) + F.lit(c * OFF))
            if t == "documents" and c > 0:
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copyvariant{c}"))
                )
            copies.append(df)
        out = copies[0]
        for df in copies[1:]:
            out = out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: x{k} -> {out.count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
