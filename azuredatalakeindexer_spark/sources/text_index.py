"""Persisted inverted text index — the BM25 analog of sources/ann_index.py.

The reference's entire purpose is MAINTAINING a search index so queries
never rescan the lake ("querying this index ... is much faster than
listing paths", reference README.md:3-4).  `operators.search.bm25_topk`
rescans the corpus per query; production full-text serving amortizes that
into a saved inverted file:

- ``<path>/postings`` — ``(term, doc_id, tf)``, written
  ``partitionBy("bucket")`` where ``bucket = portable_hash64(term) %
  n_buckets`` — each bucket is its own parquet directory;
- ``<path>/doclens`` — ``(doc_id, dl)`` per-document token counts;
- ``<path>/stats`` — the 1-row ``(n_docs, avgdl)`` corpus statistics.

A query computes its terms' buckets DRIVER-SIDE (the same md5-derived
portable hash, so no Spark job is needed to locate them) and reads only
those buckets: the bucket IN-list is a static partition filter the file
index prunes before reading a row, and the residual ``term IN`` predicate
is pushed into the surviving buckets' scans.  Scoring then touches only
the postings of the query's terms — |docs containing a query term| rows,
not the corpus.

Result parity is EXACT: per-term contributions are aggregated into
per-term columns first and summed in sorted-term order, the same
association order as ``bm25_topk``, so a saved-index query returns
bit-identical rows to the scan-time operator (test-pinned; the DuckDB
oracle is literally the same bm25 replay).
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from azuredatalakeindexer_spark.functions.text import portable_hash64, tokens


def _py_bucket(term: str, n_buckets: int) -> int:
    """Driver-side replica of ``portable_hash64(term, seed=0) % n_buckets``."""
    h = int(hashlib.md5(f"0|{term}".encode()).hexdigest()[:15], 16)
    return h % n_buckets


def build_text_index(
    docs: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Write the inverted index for ``docs`` under ``path``.

    Cost: one corpus scan + one (term, doc) aggregate (map-side combined —
    the shuffle carries distinct per-doc terms, not the token stream) +
    one bucket-partitioned write.  The amortized-away pass, exactly like
    ``build_ivf_index``.
    """
    toks = tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    doclens = base.select(F.col(id_col), F.size("_toks").alias("dl"))
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")
    postings = (
        base.select(F.col(id_col), F.explode("_toks").alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(portable_hash64(F.col("term")), F.lit(n_buckets)))
    )
    postings.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{path}/postings")


def query_text_index(
    spark: SparkSession,
    path: str,
    query_terms,
    *,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    n_buckets: int = 64,
) -> DataFrame:
    """BM25 top-k over a saved inverted index; reads only the query terms'
    bucket partitions.  Bit-identical to ``bm25_topk`` on the indexed
    corpus (same statistics, same association order, same rounding).

    Scale: the postings scan is |docs containing a query term| rows after
    static bucket pruning + term pushdown; df per term is a tiny aggregate
    of that same relation; doclens joins by doc key (broadcast the scored
    side if small, AQE otherwise); the top-k is TakeOrderedAndProject.
    """
    if not query_terms:
        raise ValueError("query_text_index needs at least one query term")
    terms = sorted({t.lower() for t in query_terms})
    buckets = sorted({_py_bucket(t, n_buckets) for t in terms})
    stats = spark.read.parquet(f"{path}/stats")
    postings = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("bucket").isin(buckets) & F.col("term").isin(terms))
        .select("term", id_col, "tf")
    )
    doclens = spark.read.parquet(f"{path}/doclens")
    dfs = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    rows = (
        postings.join(doclens, id_col)
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
    )
    contrib = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        * F.col("tf").cast("double")
        * F.lit(k1 + 1.0)
    ) / (
        F.col("tf").cast("double")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    # per-term columns, then a sorted-order sum: the SAME association order
    # as bm25_topk, so scores are bit-identical (a plain per-doc sum() would
    # add in arbitrary order and drift in the last ulp)
    per_doc = rows.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, contrib)), F.lit(0.0)
            ).alias(f"_c{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = None
    for i in range(len(terms)):
        c = F.col(f"_c{i}")
        score = c if score is None else score + c
    return (
        per_doc.select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .where(F.col("bm25") > 0)
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )
