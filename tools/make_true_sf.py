"""Generate a TRUE larger scale factor (fresh rows, not replication).

`make_scaled_sf.py` replicates sf0.1 K times; that preserves referential
integrity but reuses identical text/vectors, which flatters dedup and
search caches (VERDICT r5 next-#8).  This tool SYNTHESIZES fresh data at
any scale with the same schemas, key ranges, and value distributions as
the driver fixtures (surveyed from /root/testdata/sf0.1), fully
Spark-generated (``spark.range`` + hash-derived columns — deterministic
under the ids, no driver-side loops, no RNG state):

    python tools/make_true_sf.py /root/testdata/.bench_sf1 10

where the second argument is the multiple of sf0.1 (10 = sf1).  Shapes at
sf1: customer 150k, supplier 10k, part 200k, orders 1.5M, lineitem ~6.1M,
events 1M, documents 50k, embeddings 20k; region/nation copied from the
sf0.1 fixture (dims are scale-invariant, as in TPC-H).

Fidelity notes (what the queries actually depend on):
- documents.text: 10-100 words drawn hash-uniform from the fixtures' 31-word
  vocabulary; ~1/617 of docs share a seed with their predecessor (exact
  duplicates) and ~1/613 append one word to a shared seed (near
  duplicates) so the dedup family has honest work to do;
- embeddings: 64-dim UNIT-NORM vectors with 10 label clusters (vector =
  label centroid + 0.45·noise, renormalized) so IVF/k-means see real
  cluster structure, not uniform noise;
- lineitem: 1-7 lines per order (mean ≈ 4), same flag/status/date/price
  marginals; orders reference the scaled customer key range;
- events: 30-day window, user_id range scales with customers/10, same
  5 event types and exp-ish value tail.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.session import get_spark

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_NOUNS = ["ring", "bolt", "screw", "nut", "washer", "gear"]
P_ADJS = ["large", "hot", "blue", "red", "small", "green"]
LANGS = ["en", "en", "de", "fr", "es", "zh"]  # en ~2x the others


def _u(seed: F.Column, lo: float, hi: float) -> F.Column:
    """Hash-derived uniform double in [lo, hi) — deterministic per id."""
    return F.lit(lo) + (F.pmod(F.hash(seed), F.lit(1_000_000)) / 1_000_000.0) * (hi - lo)


def _pick(options: list[str], seed: F.Column) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(F.hash(seed), F.lit(len(options))) + 1).cast("int"))


def main() -> None:
    out_dir, mult = sys.argv[1], int(sys.argv[2])
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    # optional 4th arg: comma-separated table subset (e.g. the
    # index-lifecycle bench only needs "documents,embeddings" — at mult
    # >= 100 generating lineitem would dominate wall-time for nothing)
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    spark = get_spark("make_true_sf")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    n_cust = 15_000 * mult
    n_supp = 1_000 * mult
    n_part = 20_000 * mult
    n_ord = 150_000 * mult
    n_ev = 100_000 * mult
    n_doc = 5_000 * mult
    n_emb = 2_000 * mult

    def w(df, name):
        if only is not None and name not in only:
            return
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: {spark.read.parquet(f'{out_dir}/{name}.parquet').count():,} rows")

    # dims: scale-invariant, copied from the fixture
    for t in ("region", "nation"):
        w(spark.read.parquet(f"{src}/{t}.parquet"), t)

    ids = lambda n: spark.range(n).withColumnRenamed("id", "k")

    w(
        ids(n_cust).select(
            F.col("k").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("k")).alias("c_name"),
            F.pmod(F.hash("k", F.lit("cn")), F.lit(25)).cast("int").alias("c_nationkey"),
            F.round(_u(F.struct("k", F.lit("cb")), -999.99, 9999.99), 2).alias("c_acctbal"),
            _pick(SEGMENTS, F.struct("k", F.lit("cs"))).alias("c_mktsegment"),
        ),
        "customer",
    )
    w(
        ids(n_supp).select(
            F.col("k").alias("s_suppkey"),
            F.format_string("Supplier#%09d", F.col("k")).alias("s_name"),
            F.pmod(F.hash("k", F.lit("sn")), F.lit(25)).cast("int").alias("s_nationkey"),
            F.round(_u(F.struct("k", F.lit("sb")), -999.99, 9999.99), 2).alias("s_acctbal"),
        ),
        "supplier",
    )
    w(
        ids(n_part).select(
            F.col("k").alias("p_partkey"),
            F.concat_ws(
                " ",
                _pick(P_ADJS, F.struct("k", F.lit("pa"))),
                _pick(P_NOUNS, F.struct("k", F.lit("pn"))),
            ).alias("p_name"),
            F.concat(F.lit("Brand#"), (F.pmod(F.hash("k", F.lit("pb")), F.lit(25)) + 1).cast("string")).alias("p_brand"),
            _pick(P_TYPES, F.struct("k", F.lit("pt"))).alias("p_type"),
            (F.pmod(F.hash("k", F.lit("ps")), F.lit(50)) + 1).cast("int").alias("p_size"),
            F.round(_u(F.struct("k", F.lit("pr")), 900.0, 999.9), 2).alias("p_retailprice"),
        ),
        "part",
    )

    orders = ids(n_ord).select(
        F.col("k").alias("o_orderkey"),
        F.pmod(F.hash("k", F.lit("oc")), F.lit(n_cust)).alias("o_custkey"),
        _pick(["F", "O", "P"], F.struct("k", F.lit("os"))).alias("o_orderstatus"),
        F.round(_u(F.struct("k", F.lit("op")), 1000.0, 500000.0), 2).alias("o_totalprice"),
        (
            F.to_timestamp(F.lit("1995-01-01"))
            + F.make_interval(days=F.pmod(F.hash("k", F.lit("od")), F.lit(2405)).cast("int"))
        ).alias("o_orderdate"),
        _pick(PRIORITIES, F.struct("k", F.lit("oo"))).alias("o_orderpriority"),
    )
    w(orders, "orders")

    # lineitem derives from the WRITTEN orders (re-read breaks the lineage,
    # keeping the 1.5M-row explode off the orders plan); the lazy `orders`
    # frame substitutes when orders was excluded by the table filter
    li_src = (
        spark.read.parquet(f"{out_dir}/orders.parquet")
        if (only is None or "orders" in only)
        else orders
    )
    li = (
        li_src.select("o_orderkey", "o_orderdate")
        .select(
            "o_orderkey",
            "o_orderdate",
            F.explode(
                F.sequence(F.lit(1), (F.pmod(F.hash("o_orderkey", F.lit("ln")), F.lit(7)) + 1).cast("int"))
            ).alias("l_linenumber"),
        )
    )
    lk = F.struct("o_orderkey", "l_linenumber")
    w(
        li.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.pmod(F.hash(lk, F.lit("lp")), F.lit(n_part)).alias("l_partkey"),
            F.pmod(F.hash(lk, F.lit("ls")), F.lit(n_supp)).alias("l_suppkey"),
            F.col("l_linenumber"),
            F.round(_u(F.struct(lk, F.lit("lq")), 1.0, 50.0)).alias("l_quantity"),
            F.round(_u(F.struct(lk, F.lit("le")), 900.0, 105000.0), 2).alias("l_extendedprice"),
            (F.round(_u(F.struct(lk, F.lit("ld")), 0.0, 10.0)) / 100.0).alias("l_discount"),
            (F.round(_u(F.struct(lk, F.lit("lt")), 0.0, 8.0)) / 100.0).alias("l_tax"),
            _pick(["A", "N", "R"], F.struct(lk, F.lit("lr"))).alias("l_returnflag"),
            _pick(["F", "O"], F.struct(lk, F.lit("ll"))).alias("l_linestatus"),
            (
                F.col("o_orderdate")
                + F.make_interval(days=(F.pmod(F.hash(lk, F.lit("lsd")), F.lit(95)) + 1).cast("int"))
            ).alias("l_shipdate"),
        ),
        "lineitem",
    )

    w(
        ids(n_ev).select(
            F.col("k").alias("event_id"),
            (
                F.to_timestamp(F.lit("2024-01-01"))
                + F.make_interval(secs=_u(F.struct("k", F.lit("et")), 0.0, 30 * 86400.0))
            ).alias("ts"),
            F.pmod(F.hash("k", F.lit("eu")), F.lit(max(n_cust // 10, 1))).alias("user_id"),
            _pick(EVENT_TYPES, F.struct("k", F.lit("ee"))).alias("event_type"),
            # exp-ish tail, mean ~50, max a few hundred (fixture: avg 49.9, max 560)
            F.round(-F.lit(50.0) * F.log(F.lit(1e-6) + _u(F.struct("k", F.lit("ev")), 0.0, 1.0)), 2).alias("value"),
            F.format_string('{"k": %d}', F.pmod(F.hash("k", F.lit("ep")), F.lit(100))).alias("props"),
        ),
        "events",
    )

    # documents: fresh word sequences with planted exact + near duplicates
    vocab = F.array(*[F.lit(v) for v in VOCAB])
    d = ids(n_doc).select(F.col("k").alias("doc_id"))
    seed = (
        F.when(F.pmod(F.col("doc_id"), F.lit(617)) == 0, F.col("doc_id") - 1)
        .when(F.pmod(F.col("doc_id"), F.lit(613)) == 0, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
    )
    near_extra = F.pmod(F.col("doc_id"), F.lit(613)) == 0
    n_words = (F.pmod(F.hash(seed, F.lit("dw")), F.lit(91)) + 10).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(vocab, (F.pmod(F.hash(seed, i, F.lit("dt")), F.lit(len(VOCAB))) + 1).cast("int")),
    )
    text = F.when(
        near_extra, F.concat_ws(" ", F.concat_ws(" ", words), F.lit("vector"))
    ).otherwise(F.concat_ws(" ", words))
    w(
        d.select(
            "doc_id",
            text.alias("text"),
            _pick(LANGS, F.struct(F.col("doc_id"), F.lit("dl"))).alias("lang"),
            F.concat(F.lit("src"), F.pmod(F.col("doc_id"), F.lit(20)).cast("string")).alias("source"),
            F.length(text).alias("n_chars"),
        ),
        "documents",
    )

    # embeddings: 10 label clusters on the 64-dim unit sphere
    e = ids(n_emb).select(F.col("k").alias("vec_id"))
    label = F.pmod(F.col("vec_id"), F.lit(10)).cast("int")
    dims = F.sequence(F.lit(1), F.lit(64))
    raw = F.transform(
        dims,
        lambda i: (F.pmod(F.hash(label, i, F.lit("ec")), F.lit(2001)) - 1000.0) / 1000.0
        + 0.45 * ((F.pmod(F.hash(F.col("vec_id"), i, F.lit("en")), F.lit(2001)) - 1000.0) / 1000.0),
    )
    norm = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x))
    unit = F.transform(raw, lambda x: (x / norm).cast("float"))
    w(e.select("vec_id", unit.alias("embedding"), label.alias("label")), "embeddings")

    spark.stop()


if __name__ == "__main__":
    main()
