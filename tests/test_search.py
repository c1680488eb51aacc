"""Query-side search operators: BM25 ranking, facets, RRF fusion,
highlighting (operators/search.py).

Semantics pinned against hand-computed values on tiny corpora; the DuckDB
oracle gate covers the full-table parity (`search_*` queries in
__spark_entry__.py).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from azuredatalakeindexer_spark.operators.search import (
    suggest_terms,
    bm25_topk,
    facet_counts,
    keyword_snippets,
    rrf_fuse,
)

# Heavyweight lifecycle-integration suite: skipped in the default run so
# 'pytest tests/ -q' fits the driver's verify budget (VERDICT r14 next-#6);
# SPARK_GRAFT_RUN_SLOW=1 runs it (the repo's end-of-round battery does).
pytestmark = pytest.mark.slow


def _bm25_ref(tf, dl, n, avgdl, df, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "spark query engine for big data"),        # dl 6
        (1, "query query query optimizer"),            # dl 4, tf(query)=3
        (2, "the small dog"),                          # dl 3, no query terms
        (3, "data data lake"),                         # dl 3, tf(data)=2
        (4, ""),                                       # dl 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    yield df
    df.unpersist()


def test_bm25_matches_hand_formula(tiny_docs):
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(tiny_docs, ["query", "data"], k=10).collect()
    }
    # corpus stats: N=5, dls = 6,4,3,3,0 -> avgdl = 3.2
    # df(query)=2 (docs 0,1); df(data)=2 (docs 0,3)
    n, avgdl = 5, 3.2
    exp0 = _bm25_ref(1, 6, n, avgdl, 2) + _bm25_ref(1, 6, n, avgdl, 2)
    exp1 = _bm25_ref(3, 4, n, avgdl, 2)
    exp3 = _bm25_ref(2, 3, n, avgdl, 2)
    assert out.keys() == {0, 1, 3}          # zero-score docs excluded
    assert out[0] == pytest.approx(round(exp0, 6), abs=1e-6)
    assert out[1] == pytest.approx(round(exp1, 6), abs=1e-6)
    assert out[3] == pytest.approx(round(exp3, 6), abs=1e-6)


def test_bm25_rank_order_and_limit(tiny_docs):
    top = bm25_topk(tiny_docs, ["query", "data"], k=2).collect()
    scores = [r["bm25"] for r in top]
    assert len(top) == 2
    assert scores == sorted(scores, reverse=True)
    # repeated/mixed-case input terms dedupe to the same result
    again = bm25_topk(tiny_docs, ["Query", "query", "DATA", "data"], k=2).collect()
    assert [(r["doc_id"], r["bm25"]) for r in again] == [
        (r["doc_id"], r["bm25"]) for r in top
    ]


def test_bm25_rejects_empty_query(tiny_docs):
    with pytest.raises(ValueError):
        bm25_topk(tiny_docs, [])


def test_bm25_is_take_ordered_not_full_sort(tiny_docs):
    plan = bm25_topk(tiny_docs, ["query"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_facet_counts_top_n_and_ties(spark):
    rows = [
        ("a", "x"), ("a", "x"), ("a", "y"), ("b", "x"),
        ("b", None), ("a", "z"), ("b", "z"),
    ]
    df = spark.createDataFrame(rows, "status string, prio string")
    out = facet_counts(df, ["status", "prio"], top_n=2).collect()
    got = {(r["field"], r["value"]): (r["n"], r["rank"]) for r in out}
    # status: a=4 > b=3; prio: x=3 > z=2 > y=1 (cut by top_n=2)
    assert got[("status", "a")] == (4, 1)
    assert got[("status", "b")] == (3, 2)
    assert got[("prio", "x")] == (3, 1)
    assert got[("prio", "z")] == (2, 2)
    assert ("prio", "y") not in got        # rank 3, cut by top_n
    assert ("prio", None) not in got       # nulls are not facet values


def test_facet_counts_stringifies_non_string_columns(spark):
    df = spark.createDataFrame([(1, True), (1, False), (2, True)], "k int, flag boolean")
    out = {(r["field"], r["value"]): r["n"] for r in facet_counts(df, ["k", "flag"]).collect()}
    assert out[("k", "1")] == 2 and out[("flag", "true")] == 2


def test_rrf_fuse_hand_computed(spark):
    # leg A ranks: 10(1), 20(2), 30(3); leg B ranks: 20(1), 40(2)
    a = spark.createDataFrame([(10, 0.9), (20, 0.8), (30, 0.7)], "doc_id long, s double")
    b = spark.createDataFrame([(20, 0.99), (40, 0.5)], "doc_id long, s double")
    out = {r["doc_id"]: (r["rrf"], r["n_legs"]) for r in
           rrf_fuse([(a, "s"), (b, "s")], k=10).collect()}
    assert out[20] == (pytest.approx(round(1 / 62 + 1 / 61, 6)), 2)
    assert out[10] == (pytest.approx(round(1 / 61, 6)), 1)
    assert out[40] == (pytest.approx(round(1 / 62, 6)), 1)
    # doc in both legs outranks any single-leg doc here
    ranked = sorted(out.items(), key=lambda kv: (-kv[1][0], kv[0]))
    assert ranked[0][0] == 20


def test_rrf_fuse_tie_breaks_rank_on_id(spark):
    # equal scores -> rank order decided by doc_id asc
    a = spark.createDataFrame([(7, 1.0), (3, 1.0)], "doc_id long, s double")
    out = {r["doc_id"]: r["rrf"] for r in rrf_fuse([(a, "s")], k=10).collect()}
    assert out[3] == pytest.approx(round(1 / 61, 6))
    assert out[7] == pytest.approx(round(1 / 62, 6))


def test_keyword_snippets_position_and_window(spark):
    df = spark.createDataFrame(
        [(0, "A" * 50 + " NeEdLe " + "B" * 50), (1, "no match here"), (2, "needle at start")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in keyword_snippets(df, "needle", radius=5).collect()}
    assert set(out) == {0, 2}
    assert out[0]["hit_pos"] == 52
    assert out[0]["snippet"] == "AAAA NeEdLe BBBB"   # radius 5 each side + len(term)
    assert out[2]["hit_pos"] == 1
    assert out[2]["snippet"] == "needle at start"[: 10 + 6]


def test_suggest_terms_ranks_by_doc_frequency(spark):
    rows = [
        (0, "stream stream stream stop"),
        (1, "stream stop"),
        (2, "stop star"),
        (3, "nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r["term"], r["df"]) for r in suggest_terms(df, "st", k=10).collect()]
    # df counts DOCUMENTS (term repeats inside doc 0 count once):
    # stop df=3, stream df=2, star df=1; ties broken term-asc
    assert out == [("stop", 3), ("stream", 2), ("star", 1)]
    top1 = [(r["term"], r["df"]) for r in suggest_terms(df, "st", k=1).collect()]
    assert top1 == [("stop", 3)]
    with pytest.raises(ValueError):
        suggest_terms(df, "")


def test_scoring_profile_weighted_fields_and_magnitude_boost(spark):
    from azuredatalakeindexer_spark.operators.search import scoring_profile_topk

    rows = [
        # doc 0: title hit + body hit, magnitude 100 (clamps to frac 0)
        (0, "spark engine", "the spark engine is fast", 100),
        # doc 1: body hit only, magnitude 600 (frac (600-200)/800... see call)
        (1, "other tool", "spark here too", 600),
        # doc 2: no hits anywhere, huge magnitude — must NOT be resurrected
        (2, "nothing", "irrelevant words", 10_000),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, body string, pop int")
    out = {r["doc_id"]: r["score"] for r in scoring_profile_topk(
        df,
        {"title": (["spark"], 3.0), "body": (["spark"], 1.0)},
        boost=("pop", 0.5, 200.0, 1000.0),
        k=10,
    ).collect()}
    assert set(out) == {0, 1}           # zero-score doc excluded despite big boost

    def bm25(tf, dl, n, avgdl, df_, k1=1.2, b=0.75):
        idf = math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
        return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    # title field: dls 2,2,1 avg 5/3, df(spark)=1; body: dls 5,3,2 avg 10/3, df=2
    t0 = 3.0 * bm25(1, 2, 3, 5 / 3, 1) + 1.0 * bm25(1, 5, 3, 10 / 3, 2)
    t1 = 1.0 * bm25(1, 3, 3, 10 / 3, 2)
    m0 = 1.0 + 0.5 * 0.0                # pop 100 below lo -> clamped to 0
    m1 = 1.0 + 0.5 * ((600 - 200) / 800)
    assert out[0] == pytest.approx(round(t0 * m0, 6), abs=1e-6)
    assert out[1] == pytest.approx(round(t1 * m1, 6), abs=1e-6)


def test_scoring_profile_validates_input(spark):
    from azuredatalakeindexer_spark.operators.search import scoring_profile_topk

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        scoring_profile_topk(df, {})
    with pytest.raises(ValueError):
        scoring_profile_topk(df, {"text": ([], 1.0)})
    # degenerate boost range would divide by zero for every row
    with pytest.raises(ValueError):
        scoring_profile_topk(df, {"text": (["x"], 1.0)}, boost=("doc_id", 2.0, 5.0, 5.0))


def test_expand_query_terms_synonym_map(spark):
    from azuredatalakeindexer_spark.operators.search import expand_query_terms

    syn = spark.createDataFrame(
        [("merge", "join"), ("merge", "upsert"), ("other", "noise"), ("stream", None)],
        "term string, synonym string",
    )
    assert expand_query_terms(["Merge"], syn) == ["join", "merge", "upsert"]
    # unmapped terms pass through; null synonyms ignored
    assert expand_query_terms(["stream", "merge"], syn) == [
        "join", "merge", "stream", "upsert",
    ]


@pytest.fixture(scope="module")
def sqs_docs(spark):
    df = spark.createDataFrame(
        [
            (0, "fast merge of stream data"),
            (1, "merge merge slow"),
            (2, "stream only here"),
            (3, "fast stream merge slow"),
        ],
        "doc_id long, text string",
    ).cache()
    df.count()
    yield df
    df.unpersist()


def test_simple_query_required_excluded_phrase(sqs_docs):
    from azuredatalakeindexer_spark.operators.search import simple_query_topk

    out = simple_query_topk(sqs_docs, 'merge +stream -slow "fast merge"', k=10).collect()
    # doc 3 has slow (excluded), doc 2 lacks the phrase, doc 1 lacks stream
    assert [r["doc_id"] for r in out] == [0]
    assert out[0]["bm25"] > 0


def test_simple_query_optional_terms_rank_by_bm25(sqs_docs):
    from azuredatalakeindexer_spark.operators.search import bm25_topk, simple_query_topk

    out = simple_query_topk(sqs_docs, "merge stream", k=10).collect()
    plain = bm25_topk(sqs_docs, ["merge", "stream"], k=10).collect()
    # with no +/-/phrase operators the query degenerates to plain BM25
    assert [(r["doc_id"], r["bm25"]) for r in out] == [
        (r["doc_id"], r["bm25"]) for r in plain
    ]


def test_simple_query_full_corpus_idf_with_filters(sqs_docs):
    from azuredatalakeindexer_spark.operators.search import bm25_topk, simple_query_topk

    # '-slow' drops docs 1 and 3 from the CANDIDATES but must not change
    # idf: surviving docs keep the same score as in the unfiltered query
    filt = {r["doc_id"]: r["bm25"]
            for r in simple_query_topk(sqs_docs, "merge -slow", k=10).collect()}
    plain = {r["doc_id"]: r["bm25"] for r in bm25_topk(sqs_docs, ["merge"], k=10).collect()}
    assert set(filt) == {0}
    assert filt[0] == plain[0]


def test_simple_query_phrase_only_and_validation(sqs_docs):
    from azuredatalakeindexer_spark.operators.search import simple_query_topk

    out = simple_query_topk(sqs_docs, '"stream only"', k=10).collect()
    assert [(r["doc_id"], r["bm25"]) for r in out] == [(2, 1.0)]
    with pytest.raises(ValueError):
        simple_query_topk(sqs_docs, "-slow")


def test_phrase_topk_adjacency_and_edges(spark):
    """Exact token adjacency: 'data big' is NOT a match for 'big data';
    overlapping occurrences each count ('big big big' has TWO 'big big'
    starts); docs shorter than the phrase short-circuit to tf=0 (the
    sequence(1,0)-descends pitfall); ranking follows BM25 with id-asc
    ties."""
    from azuredatalakeindexer_spark.operators.search import phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "big data big data big"),   # tf 2
            (2, "data big"),                # reversed: tf 0
            (3, "Big DATA x"),              # case-folded: tf 1
            (4, "big"),                     # shorter than phrase: tf 0
            (5, ""),                        # empty: tf 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["phrase_tf"] for r in
           phrase_topk(docs, "big data", k=10).collect()}
    assert out == {1: 2, 3: 1}

    ov = spark.createDataFrame(
        [(1, "big big big"), (2, "big big")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["phrase_tf"] for r in
           phrase_topk(ov, ["big", "big"], k=10).collect()}
    assert got == {1: 2, 2: 1}


def test_phrase_topk_single_word_equals_bm25(spark):
    """A 1-word phrase degenerates to that term's bm25 ranking exactly
    (same tf, df, dl, constants)."""
    from azuredatalakeindexer_spark.operators.search import bm25_topk, phrase_topk
    from azuredatalakeindexer_spark.sources.fixtures import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    ph = [(r["doc_id"], r["bm25"]) for r in phrase_topk(docs, "merge", k=15).collect()]
    kw = [(r["doc_id"], r["bm25"]) for r in bm25_topk(docs, ["merge"], k=15).collect()]
    assert ph == kw


def test_near_topk_ordering_slop_and_phrase_degeneration(spark):
    """NEAR is ORDERED (term2 after term1), bounded by slop; slop=0
    degenerates exactly to the 2-term phrase counts."""
    from azuredatalakeindexer_spark.operators.search import near_topk, phrase_topk

    docs = spark.createDataFrame(
        [
            (1, "big x data"),        # 1 intervening token: slop>=1
            (2, "big x y z data"),    # 3 intervening: slop>=3
            (3, "data big"),          # wrong order: never
            (4, "big data big data"), # pairs at slop2: (1,2),(1,4),(3,4)
        ],
        "doc_id long, text string",
    )
    s2 = {r["doc_id"]: r["near_tf"] for r in
          near_topk(docs, "big", "data", slop=2, k=10).collect()}
    assert s2 == {1: 1, 4: 3}
    s3 = {r["doc_id"]: r["near_tf"] for r in
          near_topk(docs, "big", "data", slop=3, k=10).collect()}
    assert s3 == {1: 1, 2: 1, 4: 3}
    s0 = {r["doc_id"]: r["near_tf"] for r in
          near_topk(docs, "big", "data", slop=0, k=10).collect()}
    ph = {r["doc_id"]: r["phrase_tf"] for r in
          phrase_topk(docs, "big data", k=10).collect()}
    assert s0 == ph == {4: 2}


def test_near_topk_unordered_counts_both_directions(spark):
    """ordered=False counts co-occurrence in either direction with the
    same window; supersets the ordered counts."""
    from azuredatalakeindexer_spark.operators.search import near_topk

    docs = spark.createDataFrame(
        [
            (1, "big x data"),    # forward, 1 gap
            (2, "data x big"),    # reverse, 1 gap
            (3, "data big"),      # reverse, adjacent
            (4, "big data big"),  # both directions around data
        ],
        "doc_id long, text string",
    )
    uo = {r["doc_id"]: r["near_tf"] for r in
          near_topk(docs, "big", "data", slop=1, ordered=False, k=10).collect()}
    assert uo == {1: 1, 2: 1, 3: 1, 4: 2}
    o = {r["doc_id"]: r["near_tf"] for r in
         near_topk(docs, "big", "data", slop=1, ordered=True, k=10).collect()}
    assert o == {1: 1, 4: 1}
    assert all(uo.get(d, 0) >= tf for d, tf in o.items())


# ---------------------------------------------------------------- fuzzy


@pytest.fixture(scope="module")
def fuzzy_docs(spark):
    rows = [
        (0, "spark query engine"),
        (1, "quest for speed"),          # quest: dist('query','quest') = 2
        (2, "stream query stream"),
        (3, "quarry rocks"),             # quarry: dist('query','quarry') = 2
        (4, "the small dog"),
        (5, "query quest"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    yield df
    df.unpersist()


def test_fuzzy_match_terms_neighborhood_and_order(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import fuzzy_match_terms

    out = [tuple(r) for r in fuzzy_match_terms(fuzzy_docs, "query").collect()]
    # dists: query=0, quest=2, quarry=2; ranked dist asc, df desc, term asc
    # dfs: query in docs 0,2,5 -> 3; quest in 1,5 -> 2; quarry in 3 -> 1
    assert out == [("query", 3, 0), ("quest", 2, 2), ("quarry", 1, 2)]
    # max_edits=1 keeps only the exact term
    out1 = [
        tuple(r)
        for r in fuzzy_match_terms(fuzzy_docs, "query", max_edits=1).collect()
    ]
    assert out1 == [("query", 3, 0)]
    # k caps the enumeration after ranking
    assert fuzzy_match_terms(fuzzy_docs, "query", k=2).count() == 2


def test_fuzzy_match_prefix_len_gates_candidates(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import fuzzy_match_terms

    # 'puery' shares no first char with 'query' -> empty under prefix_len=1
    assert fuzzy_match_terms(fuzzy_docs, "puery", max_edits=1).count() == 0
    # prefix_len=0 lifts the gate and finds the substitution neighbor
    out = [
        tuple(r)
        for r in fuzzy_match_terms(
            fuzzy_docs, "puery", max_edits=1, prefix_len=0
        ).collect()
    ]
    assert out == [("query", 3, 1)]


def test_fuzzy_expand_caps_per_query_term(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import fuzzy_expand_terms

    full = fuzzy_expand_terms(fuzzy_docs, ["query"])
    assert full == ["quarry", "query", "quest"]
    # cap 2 keeps the two closest (dist asc, df desc): query, then the
    # dist-2 tie breaks df desc -> quest
    capped = fuzzy_expand_terms(fuzzy_docs, ["query"], max_expansions=2)
    assert capped == ["query", "quest"]
    # two query terms expand independently, union deduped + sorted
    both = fuzzy_expand_terms(fuzzy_docs, ["query", "stroam"])
    assert both == ["quarry", "query", "quest", "stream"]


def test_fuzzy_topk_equals_bm25_of_expansion(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import fuzzy_topk

    fz = [tuple(r) for r in fuzzy_topk(fuzzy_docs, ["quary", "stroam"]).collect()]
    ex = [
        tuple(r)
        for r in bm25_topk(fuzzy_docs, ["query", "quarry", "stream"], k=20).collect()
    ]
    # quary -> query(1), quarry(2); stroam -> stream(1)
    assert fz == ex and len(fz) > 0


def test_fuzzy_topk_empty_expansion_is_empty_frame(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import fuzzy_topk

    out = fuzzy_topk(fuzzy_docs, ["zzzzzz"], max_edits=1)
    assert out.columns == ["doc_id", "bm25"]
    assert out.count() == 0


def test_fuzzy_validation(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import fuzzy_candidates

    with pytest.raises(ValueError):
        fuzzy_candidates(fuzzy_docs.limit(0), [])


# ------------------------------------------------------------- wildcard


def test_wildcard_match_terms_and_like_translation(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import (
        wildcard_like,
        wildcard_match_terms,
    )

    assert wildcard_like("st*am") == "st%am"
    assert wildcard_like("qu?ry") == "qu_ry"
    assert wildcard_like("a%b_c\\d*") == "a\\%b\\_c\\\\d%"
    # qu* matches query(3), quest(2), quarry(1) -> df desc, term asc
    out = [tuple(r) for r in wildcard_match_terms(fuzzy_docs, "qu*").collect()]
    assert out == [("query", 3), ("quest", 2), ("quarry", 1)]
    # ? is exactly one char: qu?st matches quest, not query/quarry
    out = [tuple(r) for r in wildcard_match_terms(fuzzy_docs, "qu?st").collect()]
    assert out == [("quest", 2)]
    # literal metachars never act as LIKE wildcards
    assert wildcard_match_terms(fuzzy_docs, "qu%").count() == 0


def test_wildcard_topk_equals_bm25_of_expansion(fuzzy_docs):
    from azuredatalakeindexer_spark.operators.search import wildcard_topk

    wc = [tuple(r) for r in wildcard_topk(fuzzy_docs, ["qu*", "str?am"]).collect()]
    ex = [
        tuple(r)
        for r in bm25_topk(
            fuzzy_docs, ["quarry", "query", "quest", "stream"], k=20
        ).collect()
    ]
    assert wc == ex and len(wc) > 0
    # max_expansions caps per pattern by df: qu* keeps query, quest
    capped = [
        tuple(r)
        for r in wildcard_topk(fuzzy_docs, ["qu*"], max_expansions=2).collect()
    ]
    ex2 = [tuple(r) for r in bm25_topk(fuzzy_docs, ["query", "quest"], k=20).collect()]
    assert capped == ex2
    # no match -> empty typed frame
    empty = wildcard_topk(fuzzy_docs, ["zz*"])
    assert empty.columns == ["doc_id", "bm25"] and empty.count() == 0


def test_facet_ranges_modes_and_edges(spark):
    """Range facets: interval mode buckets [k·N, (k+1)·N) including
    negatives; values mode renders open ends as NULL from/to and routes
    below-first-edge values to (-inf, v1); exactly one mode required."""
    import pytest as _pytest

    from azuredatalakeindexer_spark.operators.search import facet_ranges

    df = spark.createDataFrame(
        [(1, -25.0), (2, 0.0), (3, 5.0), (4, 49.9), (5, 50.0), (6, 750.0), (7, None)],
        "id long, value double",
    )
    by_interval = {
        (r["range_from"], r["range_to"]): r["n"]
        for r in facet_ranges(df, "value", interval=50).collect()
    }
    assert by_interval == {
        (-50.0, 0.0): 1,   # -25 floors down
        (0.0, 50.0): 3,    # 0, 5, 49.9
        (50.0, 100.0): 1,  # 50 opens the next bucket
        (750.0, 800.0): 1,
    }
    by_edges = {
        (r["range_from"], r["range_to"]): r["n"]
        for r in facet_ranges(df, "value", values=[10, 100, 500]).collect()
    }
    assert by_edges == {
        (None, 10.0): 3,      # -25, 0, 5
        (10.0, 100.0): 2,     # 49.9, 50
        (500.0, None): 1,     # 750
    }
    with _pytest.raises(ValueError):
        facet_ranges(df, "value")
    with _pytest.raises(ValueError):
        facet_ranges(df, "value", interval=50, values=[10])
    with _pytest.raises(ValueError):
        facet_ranges(df, "value", interval=0)


def test_scoring_profile_tag_boost_membership_and_composition(spark):
    """Tag function: ×(1+factor) iff the scalar field's value is in the
    tag set, composed multiplicatively with the magnitude boost; a
    zero-text-score doc is never resurrected by its tags; empty tag list
    rejected."""
    import pytest as _pytest

    from azuredatalakeindexer_spark.operators.search import scoring_profile_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "web", 500),
            (2, "alpha beta", "wiki", 500),
            (3, "alpha beta", "spam", 500),
            (4, "nothing here", "web", 500),
        ],
        "doc_id long, text string, source string, n_chars long",
    )
    base = {
        r["doc_id"]: r["score"]
        for r in scoring_profile_topk(
            docs, {"text": (["alpha"], 1.0)}, k=10
        ).collect()
    }
    tagged = {
        r["doc_id"]: r["score"]
        for r in scoring_profile_topk(
            docs,
            {"text": (["alpha"], 1.0)},
            tag_boost=("source", ["web", "wiki"], 0.5),
            k=10,
        ).collect()
    }
    assert 4 not in tagged  # no text match -> excluded despite tag
    assert tagged[3] == base[3]  # non-member unchanged
    assert abs(tagged[1] - round(base[1] * 1.5, 6)) <= 1e-6
    assert abs(tagged[2] - round(base[2] * 1.5, 6)) <= 1e-6
    with _pytest.raises(ValueError):
        scoring_profile_topk(
            docs, {"text": (["alpha"], 1.0)}, tag_boost=("source", [], 0.5)
        )


def test_suggest_two_terms_pairs_and_df_semantics(spark):
    """twoTerms autocomplete: completions are adjacent (t1, t2) pairs with
    t1 matching the prefix; a matching term ending its document yields no
    completion; df counts DOCUMENTS containing the pair, not occurrences;
    empty prefix rejected."""
    import pytest as _pytest

    from azuredatalakeindexer_spark.operators.search import suggest_two_terms

    docs = spark.createDataFrame(
        [
            (1, "stream merge stream merge extra"),
            (2, "stream merge tail"),
            (3, "a stream"),          # 'stream' ends the doc -> no pair
            (4, "status quo"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["completion"]: r["df"]
        for r in suggest_two_terms(docs, "st", k=10).collect()
    }
    assert out == {
        "stream merge": 2,  # doc 1 has the pair twice but counts once; doc 2
        "status quo": 1,
    }
    with _pytest.raises(ValueError):
        suggest_two_terms(docs, "")


def test_suggest_with_context_disambiguates(spark):
    """oneTermWithContext: only completions following the exact context
    term qualify — the same prefix with a different context returns a
    different set; df counts documents; both args required."""
    import pytest as _pytest

    from azuredatalakeindexer_spark.operators.search import suggest_with_context

    docs = spark.createDataFrame(
        [
            (1, "new york city"),
            (2, "new york state"),
            (3, "last year today"),
            (4, "this year new yearnings"),
        ],
        "doc_id long, text string",
    )
    after_new = {
        r["term"]: r["df"]
        for r in suggest_with_context(docs, "new", "y", k=10).collect()
    }
    assert after_new == {"york": 2, "yearnings": 1}
    after_last = {
        r["term"]: r["df"]
        for r in suggest_with_context(docs, "last", "y", k=10).collect()
    }
    assert after_last == {"year": 1}  # context flips the completion set
    with _pytest.raises(ValueError):
        suggest_with_context(docs, "", "y")
    with _pytest.raises(ValueError):
        suggest_with_context(docs, "new", "")
