"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed to completion with a cheap total-consuming action
(count of the materialized result) after a warm-up of the input file index.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from azuredatalakeindexer_spark.session import get_spark

#: the representative subset run per-round: reference-parity pipeline stages,
#: the analytics rollups, and every LLM-pipeline operator family
HEADLINE = [
    "list_changed_paths",
    "path_keys",
    "upsert_merge",
    "dedup_last_writer",
    "rebuild_batches",
    "pricing_summary",
    "top_customers",
    "events_hourly",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard",
    "embedding_topk",
    "ann_lsh_topk",
    "lang_id",
    "quality_score",
    "doc_fingerprints",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm-up: touch every input table once so the first timed query doesn't
    # pay one-off file-index/codegen costs for everybody
    from azuredatalakeindexer_spark.sources.fixtures import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
