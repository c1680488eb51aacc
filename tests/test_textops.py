"""TF-IDF keyword extraction semantics + plan shape."""

import math

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.operators.textops import tfidf_top_terms


def _toy_docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark shuffle join"),
            (2, "spark join window"),
            (3, "duck oracle oracle"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_scores_and_ranks(spark):
    out = tfidf_top_terms(_toy_docs(spark), k=2)
    rows = {(r.doc_id, r.rank): r for r in out.collect()}
    # every doc emits exactly k=2 rows (all have >=2 distinct terms)
    assert len(rows) == 6

    def idf(df):
        return math.log((3 + 1) / (df + 1)) + 1

    # doc 1: 'spark' tf=2 df=2 -> 2*idf(2); 'shuffle'/'join' tf=1, df 1/2 ->
    # idf(1) > idf(2), so rank2='shuffle'
    assert rows[(1, 1)].term == "spark"
    assert rows[(1, 1)].tfidf == round(2 * idf(2), 6)
    assert rows[(1, 2)].term == "shuffle"
    # doc 3: 'oracle' tf=2 df=1 dominates 'duck' tf=1 df=1
    assert rows[(3, 1)].term == "oracle"
    assert rows[(3, 2)].term == "duck"
    # tie on score breaks on term: doc 2 'spark' vs 'join' both tf=1 df=2
    assert rows[(2, 2)].term in ("join", "spark", "window")
    d2 = [rows[(2, i)].term for i in (1, 2)]
    assert d2 == sorted(d2, key=lambda t: (-rows[(2, d2.index(t) + 1)].tfidf, t))


def test_tfidf_no_cartesian_beyond_scalar_n(spark):
    """The only nested-loop join allowed is the 1-row broadcast N relation;
    tf ⋈ idf must be an equi-join on term."""
    plan = tfidf_top_terms(_toy_docs(spark), k=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    nested = plan.count("BroadcastNestedLoopJoin")
    assert nested <= 1, plan


def test_tfidf_k_bounds_output(spark):
    out = tfidf_top_terms(_toy_docs(spark), k=1)
    assert out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0] == 1


def test_profile_columns_single_pass(spark):
    from azuredatalakeindexer_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "k long, s string"
    )
    out = profile_columns(df)
    rows = {r.column: r for r in out.collect()}
    assert rows["k"].n_rows == 4 and rows["k"].n_nonnull == 3
    assert rows["k"].n_distinct == 2 and rows["k"].min_v == "1" and rows["k"].max_v == "2"
    assert rows["s"].n_nonnull == 3 and rows["s"].n_distinct == 2
    # one aggregation pass: the multi-distinct rewrites to a single
    # Expand-based aggregate over ONE scan — not a per-column Union of scans
    # (post-collect the AQE string repeats the plan as Final + Initial —
    # keep the final section only)
    phys = out._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert phys.count("Expand") == 1, phys
    assert "Union" not in logical, logical
    assert logical.count("LogicalRDD") + logical.count("Relation") == 1, logical


def test_approx_distinct_within_tolerance(spark):
    from azuredatalakeindexer_spark.operators.profile import approx_distinct_by

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    approx = {
        r.event_type: r.approx_distinct
        for r in approx_distinct_by(ev, ["event_type"], "user_id", rsd=0.05).collect()
    }
    exact = {
        r.event_type: r.nd
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, nd in exact.items():
        assert abs(approx[et] - nd) / nd <= 0.15, (et, approx[et], nd)


def test_approx_quantiles_rank_error_bound(spark):
    """GK sketch guarantee: the returned element's RANK is within
    n/accuracy (+1 for boundary) of the target rank, per group."""
    from azuredatalakeindexer_spark.operators.profile import approx_quantiles_by

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    acc = 100  # coarse on purpose: exercises summary collapse at n > acc
    got = approx_quantiles_by(
        ev, ["event_type"], "value", quantiles=(0.5, 0.9, 0.99), accuracy=acc
    ).collect()
    vals = {
        r.event_type: sorted(v.value for v in rows)
        for r in got
        for rows in [ev.where(F.col("event_type") == r.event_type).select("value").collect()]
    }
    for r in got:
        xs = vals[r.event_type]
        n = len(xs)
        assert r.n_rows == n
        for q, v in ((0.5, r.p50), (0.9, r.p90), (0.99, r.p99)):
            rank = sum(1 for x in xs if x <= v)
            assert abs(rank - q * n) <= n / acc + 1, (r.event_type, q, rank, n)


def test_histogram_partitions_all_rows(spark):
    from azuredatalakeindexer_spark.operators.profile import histogram_by

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    h = histogram_by(ev, ["event_type"], "value", n_bins=10).collect()
    assert sum(r.n for r in h) == ev.count()       # every row lands in a bin
    assert all(0 <= r.bucket <= 9 for r in h)      # max value clamped to last


def _domain_docs(spark):
    # quality is monotone in length here (longer text -> more tokens ->
    # higher n_tok term), so per-domain ranking is hand-checkable
    mk = lambda n: " ".join(["the fast small data"] * n)
    return spark.createDataFrame(
        [
            (1, "a", mk(1)),
            (2, "a", mk(2)),
            (3, "a", mk(3)),
            (4, "a", mk(4)),
            (5, "b", mk(1)),
            (6, "b", mk(5)),
            (7, "b", mk(6)),
            (8, "c", mk(2)),          # singleton domain
        ],
        "doc_id long, source string, text string",
    )


def test_domain_quality_gate_exact_keeps_top_frac_per_domain(spark):
    from azuredatalakeindexer_spark.operators.textops import domain_quality_gate

    out = {r["doc_id"]: r for r in domain_quality_gate(
        _domain_docs(spark), keep_frac=0.5
    ).collect()}
    assert len(out) == 8                          # one row per doc, flagged
    # domain a: 4 docs, ceil(0.5*4)=2 -> two longest (4, 3) kept
    assert [out[i]["kept"] for i in (1, 2, 3, 4)] == [0, 0, 1, 1]
    assert out[1]["n_domain"] == 4
    # domain b: 3 docs, ceil(1.5)=2 -> docs 7 and 6
    assert [out[i]["kept"] for i in (5, 6, 7)] == [0, 1, 1]
    # singleton domain always keeps its doc (the max(1, ...) floor)
    assert out[8]["kept"] == 1 and out[8]["n_domain"] == 1


def test_domain_quality_gate_approx_threshold_semantics(spark):
    """The approx_percentile scale path: kept = quality >= the domain's
    threshold, so within each domain every kept doc outranks every dropped
    doc and the kept count is >= the exact gate's (boundary ties only
    widen the kept set)."""
    from azuredatalakeindexer_spark.operators.textops import domain_quality_gate

    docs = _domain_docs(spark)
    exact = domain_quality_gate(docs, keep_frac=0.5).collect()
    approx = domain_quality_gate(docs, keep_frac=0.5, approx=True).collect()
    assert len(approx) == len(exact) == 8
    by_dom = {}
    for r in approx:
        by_dom.setdefault(r["source"], []).append(r)
    for dom, rs in by_dom.items():
        kept_q = [r["quality"] for r in rs if r["kept"] == 1]
        drop_q = [r["quality"] for r in rs if r["kept"] == 0]
        assert kept_q, dom                        # never empties a domain
        if drop_q:
            assert min(kept_q) > max(drop_q)
    exact_kept = sum(r["kept"] for r in exact)
    approx_kept = sum(r["kept"] for r in approx)
    assert approx_kept >= exact_kept


def test_domain_quality_gate_approx_broadcasts_thresholds(spark):
    """Plan shape of the scale path: the per-domain threshold relation
    joins back via BroadcastHashJoin — no sort of the corpus by domain."""
    from azuredatalakeindexer_spark.operators.textops import domain_quality_gate

    out = domain_quality_gate(_domain_docs(spark), keep_frac=0.5, approx=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_chunk_documents_overlapping_windows(spark):
    from azuredatalakeindexer_spark.operators.textops import chunk_documents

    t10 = " ".join(f"w{i}" for i in range(10))
    t11 = " ".join(f"w{i}" for i in range(11))
    df = spark.createDataFrame(
        [(0, t10), (1, t11), (2, "a b c"), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
            for r in out.collect()}
    # doc 0: 10 tokens, stride 3 -> starts 0,3,6 (3 chunks, last full)
    assert rows[(0, 0)] == (4, "w0 w1 w2 w3")
    assert rows[(0, 1)] == (4, "w3 w4 w5 w6")
    assert rows[(0, 2)] == (4, "w6 w7 w8 w9")
    # doc 1: 11 tokens -> 4 chunks, last short (w9 w10)
    assert rows[(1, 3)] == (2, "w9 w10")
    # doc 2 fits one window; empty/whitespace docs emit NO chunks by design
    assert rows[(2, 0)] == (3, "a b c")
    assert {d for d, _ in rows} == {0, 1, 2}
    # overlap invariant: consecutive chunks share `overlap` tokens
    assert rows[(0, 0)][1].split()[-1:] == rows[(0, 1)][1].split()[:1]

    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_reassembly_invariant(spark):
    """Lossless-ness: chunk 0's tokens plus every later chunk's tokens
    after the overlap reconstruct each document's full token stream —
    over the real fixture corpus, not a toy."""
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.functions.text import tokens
    from azuredatalakeindexer_spark.operators.textops import chunk_documents
    from azuredatalakeindexer_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, chunk_tokens=32, overlap=8)
    rebuilt = (
        chunks.withColumn(
            "_part",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
                F.array_join(
                    F.slice(F.split(F.col("chunk_text"), " "), 9, 32), " "
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "_part"))
                ).getField("_part"),
                " ",
            ).alias("rebuilt")
        )
    )
    orig = docs.select(
        "doc_id", F.array_join(tokens(F.col("text")), " ").alias("norm")
    ).where(F.length("norm") > 0)
    joined = orig.join(rebuilt, "doc_id", "left")
    bad = joined.where(
        F.col("rebuilt").isNull() | (F.col("rebuilt") != F.col("norm"))
    ).count()
    assert bad == 0
    # zero-token docs (if any) have no chunks; all others were rebuilt
    assert rebuilt.count() == orig.count()


def test_bigram_lm_scores_hand_computed(spark):
    import math

    import pytest

    from azuredatalakeindexer_spark.operators.textops import bigram_lm_scores

    # corpus: 'a b a b' + 'a b c' + 'z' (no bigrams -> excluded)
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "z")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["avg_logprob"], r["n_bigrams"]) for r in
           bigram_lm_scores(df).collect()}
    # bigram counts: (a,b)=3, (b,a)=1, (b,c)=1; c(a.)=3, c(b.)=2; V=4 (a,b,c,z)
    lp_ab = round(math.log((3 + 1.0) / (3 + 4)), 6)
    lp_ba = round(math.log((1 + 1.0) / (2 + 4)), 6)
    lp_bc = round(math.log((1 + 1.0) / (2 + 4)), 6)
    exp0 = round((lp_ab + lp_ba + lp_ab) / 3, 6)
    exp1 = round((lp_ab + lp_bc) / 2, 6)
    assert 2 not in out                      # bigram-less doc excluded by design
    assert out[0] == (pytest.approx(exp0, abs=2e-6), 3)
    assert out[1] == (pytest.approx(exp1, abs=2e-6), 2)
    # the corpus-frequent pattern scores higher than the rarer one
    assert out[0][0] > out[1][0]
