"""Dedup + similarity operators: semantic truths and plan-shape guarantees
(banded equi-joins — NEVER a cartesian product)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from azuredatalakeindexer_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_docs,
    simhash_pairs,
)
from azuredatalakeindexer_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
)
from azuredatalakeindexer_spark.sources.fixtures import load_table
from tests.conftest import SF_DIR

# Heavyweight lifecycle-integration suite: skipped in the default run so
# 'pytest tests/ -q' fits the driver's verify budget (VERDICT r14 next-#6);
# SPARK_GRAFT_RUN_SLOW=1 runs it (the repo's end-of-round battery does).
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base),                                  # exact dup of 0
        (2, base.replace("today", "tomorrow")),     # near dup of 0
        (3, "completely different words about spark window aggregation plans"),
        (4, "another unrelated document mentioning parquet bloom filters only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, near_dup_docs):
    out = exact_dedup(near_dup_docs)
    groups = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    assert groups[0] == 2          # 0 and 1 collapse, min id survives
    assert out.count() == 4


def test_minhash_finds_near_dups(spark, near_dup_docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(near_dup_docs).collect()}
    assert (0, 1) in pairs          # identical docs always collide
    assert (0, 2) in pairs          # one-word edit keeps most shingles
    assert (3, 4) not in pairs      # unrelated docs don't


def test_simhash_identical_docs_same_fp(spark, near_dup_docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_docs(near_dup_docs).collect()}
    assert fp[0] == fp[1]
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(near_dup_docs).collect()}
    assert pairs[(0, 1)] == 0


def test_ngram_jaccard_scores(spark, near_dup_docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(near_dup_docs, threshold=0.1, max_doc_freq=10).collect()
    }
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0


def test_mega_bucket_output_stays_linear(spark):
    """Degenerate corpus: n identical docs land in ONE bucket per band/block.
    The bucket cap must switch to star pairs — output O(n), not O(n²) —
    and every doc must still be flagged as a duplicate of the representative."""
    n = 2000
    rows = [(i, "spam spam wonderful spam baked beans and spam again forever") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    mh = minhash_lsh_pairs(docs, max_bucket_size=64)
    assert mh.count() == n - 1  # star around doc 0, no quadratic clique
    assert {r["id_a"] for r in mh.collect()} == {0}
    sp = simhash_pairs(docs, max_bucket_size=64)
    assert sp.count() == n - 1
    assert {r["hamming"] for r in sp.collect()} == {0}


def test_ngram_mega_gram_never_collected(spark):
    """A boilerplate shingle shared by every document (df ≫ max_doc_freq)
    must be dropped by the windowed df count BEFORE collect_list builds any
    array — candidates then come only from rare shingles, and the common
    gram contributes no pairs.  (Previously the mega-bucket was collected
    and THEN filtered — an OOM at corpus-scale df.)"""
    n = 300
    boiler = "common header words three"  # one shared 3-shingle source
    rows = [
        (i, boiler + f" unique{i} tail{i} words{i} here{i}") for i in range(n)
    ]
    # two planted near-dups sharing a rare shingle
    rows.append((n, "rare alpha beta gamma delta shared suffix one"))
    rows.append((n + 1, "rare alpha beta gamma delta shared suffix two"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(docs, threshold=0.4, max_doc_freq=50).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (n, n + 1) in got
    # the 300 boiler-sharing docs must not pair up through the common gram
    assert all(a >= n for a, _ in got)


def test_bucket_cap_boundary_keeps_clique(spark):
    """At exactly max_bucket_size members the full clique is still emitted."""
    rows = [(i, "identical tiny document body with enough words to shingle") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_lsh_pairs(docs, max_bucket_size=5)
    assert out.count() == 5 * 4 // 2  # full clique at the boundary
    star = minhash_lsh_pairs(docs, max_bucket_size=4)
    assert star.count() == 4  # one over the cap → star


def test_brute_force_topk_exact(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = emb.where(F.col("vec_id") == 0)
    out = brute_force_topk(emb, q, k=2)
    ranked = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    assert ranked == [1, 2]  # cosine order: 1 (≈0.99) > 2 (0.0) > 3 (-1)


def test_no_cartesian_product_in_banded_joins(spark):
    from azuredatalakeindexer_spark.operators.similarity import lsh_multitable_topk

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    for df in (
        minhash_lsh_pairs(docs),
        simhash_pairs(docs),
        ngram_jaccard_pairs(docs),
        lsh_bucketed_topk(emb, emb.where(F.col("vec_id") < 3)),
        lsh_multitable_topk(emb, emb.where(F.col("vec_id") < 3)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_brute_force_is_broadcast_not_shuffle(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = brute_force_topk(emb, emb.where(F.col("vec_id") < 3))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the deliberate baseline: corpus streams through a broadcast NL join —
    # the corpus itself is never shuffled for scoring
    assert "BroadcastNestedLoopJoin" in plan


def test_ivf_probes_recover_bruteforce_neighbors(spark):
    """IVF with enough probes ≈ brute force; with the seed quantizer the
    top-1 neighbor of most queries must appear in the probed cells."""
    from azuredatalakeindexer_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    ivf = ivf_topk(emb, q, k=5, n_centroids=8, n_probe=8)  # probe ALL cells
    bf = brute_force_topk(emb, q, k=5)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    want = {(r["query_id"], r["neighbor_id"]) for r in bf.collect()}
    assert got == want  # probing every cell == exact search


def test_ann_recall_floors(spark):
    """Pin measured recall@10 floors (sf0.001, queries vec_id<20) so a
    regression in bucketing/probing is caught.  Measured 2026-08-13:
    ivf(16,2)=0.775, ivf(32,4)=0.825, lsh(4,f4)=0.43; floors leave margin
    except ivf(32,4), which is THE documented default ANN path and must
    stay >= 0.8 (VERDICT r4 next-#6; everything here is deterministic, so
    the tight floor is reproducible).  Single-probe lsh_d8 recalls ~0.03
    here — that path is for near-dup retrieval, documented in
    lsh_bucketed_topk's docstring."""
    from azuredatalakeindexer_spark.operators.similarity import ann_recall, ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    q = emb.where(F.col("vec_id") < 20)
    bf = brute_force_topk(emb, q, k=10).cache()
    bf.count()
    assert ann_recall(bf, ivf_topk(emb, q, k=10, n_centroids=16, n_probe=2)) >= 0.6
    # the default-config ANN path: recall >= 0.8 (also pinned in bench)
    assert ann_recall(bf, ivf_topk(emb, q, k=10, n_centroids=32, n_probe=4)) >= 0.8
    lsh_multi = ann_recall(
        bf, lsh_bucketed_topk(emb, q, k=10, sign_dims=4, n_flip_bits=4)
    )
    lsh_single = ann_recall(bf, lsh_bucketed_topk(emb, q, k=10, sign_dims=4))
    assert lsh_multi >= 0.3
    assert lsh_multi >= lsh_single  # multi-probe can only widen the probe set
    bf.unpersist()
    emb.unpersist()


def test_multitable_lsh_recall_beats_single_table(spark):
    """OR-amplification: n independent tables can only widen the candidate
    set, so recall must be monotone in n_tables and beat the single-table
    path.  Measured 2026-08-13 (sf0.001): single d8 0.025 → 4×8 0.065 →
    8×8 0.12 — amplified ~5× but honestly still weak-cosine territory;
    the >= 0.8 default path is ivf(32,4) above."""
    from azuredatalakeindexer_spark.operators.similarity import (
        ann_recall,
        lsh_multitable_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    q = emb.where(F.col("vec_id") < 20)
    bf = brute_force_topk(emb, q, k=10).cache()
    bf.count()
    single = ann_recall(bf, lsh_bucketed_topk(emb, q, k=10, sign_dims=8))
    mt4 = ann_recall(bf, lsh_multitable_topk(emb, q, k=10, sign_dims=8, n_tables=4))
    mt8 = ann_recall(bf, lsh_multitable_topk(emb, q, k=10, sign_dims=8, n_tables=8))
    assert mt4 >= single
    assert mt8 >= mt4
    assert mt8 >= 0.08  # measured 0.12; deterministic
    bf.unpersist()
    emb.unpersist()


def test_embedding_near_dup_mega_bucket_is_linear(spark):
    """Planted boilerplate bucket (100 near-identical vectors, all in one
    sign bucket, > max_bucket_size=64): the guard must emit the linear star
    around the min-id member — n-1 pairs — not the O(m²) 4950-pair clique
    (VERDICT r4 next-#2, mirroring test_no_cartesian_product_in_banded_joins)."""
    from azuredatalakeindexer_spark.operators.dedup import embedding_near_dup_pairs

    n = 100
    rows = [(i, [1.0 + 0.001 * (i % 7)] * 8) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_dup_pairs(emb, threshold=0.5, sign_dims=4)
    got = pairs.collect()
    assert len(got) == n - 1
    assert all(r["id_a"] == 0 for r in got)  # star rep = bucket min id
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_centroids_high_dim(spark):
    """d=256 regression for the posexplode centroid update (VERDICT r4
    next-#5): the old d-wide aggregate list built 256×k avg expressions —
    a codegen blowup at embedding dims.  Two planted block-clusters must be
    recovered and every centroid must keep full dimensionality."""
    from azuredatalakeindexer_spark.operators.similarity import kmeans_centroids

    d, n = 256, 40
    rows = [
        (
            i,
            [
                (1.0 if (j < d // 2) == (i % 2 == 0) else 0.01)
                + 0.001 * ((i * 31 + j) % 5)
                for j in range(d)
            ],
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(emb, k=2, iters=3).collect()
    assert len(cents) == 2
    assert all(len(r["cvec"]) == d for r in cents)
    # the two centroids must land in different half-space blocks
    halves = {
        r["cid"]: sum(r["cvec"][: d // 2]) > sum(r["cvec"][d // 2 :]) for r in cents
    }
    assert halves[0] != halves[1]


def test_sample_frames_explodes_rows(spark):
    from azuredatalakeindexer_spark.operators.multimodal import sample_frames
    from azuredatalakeindexer_spark.operators.multimodal import attach_binary_payload

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    frames = sample_frames(attach_binary_payload(docs)).collect()
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert len(by_doc) == 20
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indices
        assert 1 <= len(idxs) <= 5


def test_real_decode_branch(spark):
    """The REAL decode branch (fake=False), env-gated on the runtime codec
    probe (VERDICT r10 next-#8): where Pillow exists, a genuine PNG decodes
    to its true width/height/mime; where it does not (this container), the
    branch must raise NotImplementedError — never silently fall back."""
    import pytest

    from azuredatalakeindexer_spark.operators.multimodal import (
        codecs_available,
        extract_features,
    )

    probe = codecs_available()
    docs = load_table(spark, SF_DIR, "documents").limit(3)
    from azuredatalakeindexer_spark.operators.multimodal import (
        attach_binary_payload,
    )

    mm = attach_binary_payload(docs)
    if not probe["image"]:
        with pytest.raises(Exception) as ei:
            extract_features(mm, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
        return
    # codecs present: a real 2x3 PNG must decode to its true dimensions
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (2, 3)).save(buf, format="PNG")
    png = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "image/png", len(buf.getvalue()))],
        "doc_id long, payload binary, mime string, byte_len long",
    )
    row = extract_features(png, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (2, 3)
    assert row["mime"] == "image/png"


def test_documents_fixture_is_ascii(spark):
    """The multimodal_frames oracle slices characters (substr) while
    sample_frames slices UTF-8 bytes — equivalent ONLY for ASCII text.
    DuckDB md5() can't hash a BLOB, so the byte-exact oracle isn't
    expressible; pin the fixture assumption instead (ADVICE r2)."""
    docs = load_table(spark, SF_DIR, "documents")
    non_ascii = docs.where(F.octet_length("text") != F.length("text")).count()
    assert non_ascii == 0


def test_connected_components_chain_and_triangle(spark):
    """Min-label propagation converges on a diameter-4 chain (multiple
    rounds needed) and keeps disjoint components apart."""
    from azuredatalakeindexer_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5 (diameter 4) + triangle 10-11-12
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    labels = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_dedup_cluster_assignments_singletons(spark, near_dup_docs):
    """Docs in no pair are their own singleton cluster; canonical = min id."""
    from azuredatalakeindexer_spark.operators.dedup import (
        dedup_cluster_assignments,
        minhash_lsh_pairs,
    )

    out = dedup_cluster_assignments(near_dup_docs, minhash_lsh_pairs(near_dup_docs))
    rows = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}
    assert len(rows) == 5                      # one row per document
    assert rows[0] == (0, 1) and rows[1] == (0, 0) and rows[2] == (0, 0)
    assert rows[3] == (3, 1) and rows[4] == (4, 1)
    # exactly one canonical doc per cluster
    from collections import Counter

    canon = Counter(cid for cid, keep in rows.values() if keep)
    assert all(v == 1 for v in canon.values())


def test_training_corpus_funnel_stages(spark):
    """Every doc gets the FIRST stage that dropped it; exact dups collapse
    to the min id; near-dup clusters keep one canonical member."""
    from azuredatalakeindexer_spark.plans.corpus import build_training_corpus

    good = (
        "the quick brown fox jumps over a lazy dog and the small fast cat "
        "watches the garden while a small bird sings near the old oak tree "
        "and the fast river runs through a quiet valley under the warm sun"
    )
    docs = spark.createDataFrame(
        [
            (0, good),                              # kept (canonical)
            (1, good),                              # exact dup of 0
            (2, good.replace("warm sun", "cold moon")),  # near dup of 0
            (3, "data table row " * 30),            # wrong language (es lexicon)
            (4, "zz qq"),                           # low quality (short, no stopwords)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["stage"], r["kept"]) for r in build_training_corpus(docs).collect()}
    assert out[0] == ("kept", 1)
    assert out[1] == ("exact_dup", 0)
    assert out[2] == ("near_dup", 0)
    assert out[3] == ("wrong_language", 0)
    assert out[4] == ("low_quality", 0)


def test_np_topk_matches_catalyst(spark):
    """The Arrow/numpy batched brute-force path returns the same neighbors
    and (1e-6-tolerant) scores as the Catalyst expression baseline, across
    multiple Arrow batches."""
    from azuredatalakeindexer_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_np,
    )

    emb = load_table(spark, SF_DIR, "embeddings").repartition(4)
    q = emb.where(F.col("vec_id") < 5)
    a = brute_force_topk(emb, q, k=10).collect()
    b = brute_force_topk_np(emb, q, k=10).collect()
    key = lambda rows: {(r["query_id"], r["rank"]): r for r in rows}
    ka, kb = key(a), key(b)
    assert set(ka) == set(kb)
    agree = sum(ka[x]["neighbor_id"] == kb[x]["neighbor_id"] for x in ka)
    # identical except possible 1e-6 rounding-boundary rank swaps
    assert agree >= len(ka) - 2
    for x in ka:
        assert abs(ka[x]["cosine"] - kb[x]["cosine"]) < 2e-6


def test_kmeans_centroids_recover_clusters_and_beat_seed_quantizer(spark):
    """On clustered embeddings, Lloyd iterations recover the true centers
    and the learned IVF quantizer beats the seed quantizer at equal probe
    cost.  (On isotropic data the two tie — measured at sf0.1: 0.81 vs
    0.84 recall@10, within noise — so the clustered case is the honest
    demonstration of value.)"""
    import numpy as np

    from azuredatalakeindexer_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(11)
    centers = np.eye(4, 8) * 10.0          # 4 well-separated centers in R^8
    rows = []
    i = 0
    for c in range(4):
        for _ in range(150):
            v = centers[c] + rng.normal(0, 0.5, 8)
            rows.append((i, [float(x) for x in v]))
            i += 1
    # ids are ordered by cluster → the seed quantizer's first-k centroids
    # all come from cluster 0, the worst case kmeans must fix
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    q = emb.where((F.col("vec_id") % 150) == 3)   # one query per cluster region
    bf = brute_force_topk(emb, q, k=5).cache()
    bf.count()

    km = kmeans_centroids(emb, k=4, iters=4).cache()
    # every learned centroid aligns with one true center
    learned = {r["cid"]: np.array(r["cvec"]) for r in km.collect()}
    for v in learned.values():
        best = max(
            float(v @ c / (np.linalg.norm(v) * np.linalg.norm(c) + 1e-12))
            for c in centers
        )
        assert best > 0.95

    r_seed = ann_recall(bf, ivf_topk(emb, q, k=5, n_centroids=4, n_probe=1))
    r_km = ann_recall(bf, ivf_topk(emb, q, k=5, n_probe=1, centroids=km))
    assert r_km > r_seed + 0.1    # measured: 1.0 vs 0.85
    assert r_km > 0.95
    bf.unpersist(); emb.unpersist(); km.unpersist()


def test_quantize_roundtrip_bound_and_retrieval_recall(spark):
    import pyspark.sql.functions as F

    from azuredatalakeindexer_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )
    from azuredatalakeindexer_spark.sources.fixtures import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q8 = quantize_embeddings(emb, bits=8)
    # codes stay in int8 range
    rng = q8.agg(
        F.min(F.array_min("qvec")).alias("lo"), F.max(F.array_max("qvec")).alias("hi")
    ).collect()[0]
    assert -127 <= rng["lo"] and rng["hi"] <= 127
    # per-element reconstruction error ≤ half a quantization step
    deq = dequantize_embeddings(q8).select("vec_id", "embedding", "scale")
    joined = emb.select("vec_id", F.col("embedding").alias("orig")).join(deq, "vec_id")
    max_rel = joined.select(
        F.array_max(
            F.zip_with("orig", "embedding", lambda a, b: F.abs(a - b) / F.col("scale"))
        ).alias("e")
    ).agg(F.max("e")).collect()[0][0]
    assert max_rel <= 0.5 / 127 + 1e-9
    # retrieval on the dequantized store matches the exact store
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    approx = brute_force_topk(deq.select("vec_id", "embedding"), queries, k=5)
    assert ann_recall(exact, approx) >= 0.9


def test_span_dedup_drops_repeated_spans_and_reassembles(spark):
    from azuredatalakeindexer_spark.operators.dedup import span_dedup

    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-word chunk
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + " ".join(f"x{i}" for i in range(10))),
            (2, boiler + " " + " ".join(f"y{i}" for i in range(10))),
            (3, " ".join(f"z{i}" for i in range(5))),  # short tail chunk only
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, span_words=10).collect()}
    # doc 1 keeps both chunks; doc 2 loses the boilerplate chunk it shares
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["cleaned"] == " ".join(f"y{i}" for i in range(10))
    assert out[1]["cleaned"].startswith(boiler)
    # sub-chunk documents survive untouched
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (1, 1)
    assert out[3]["cleaned"] == " ".join(f"z{i}" for i in range(5))


def test_span_dedup_keeps_zero_chunk_docs(spark):
    """ADVICE r4: documents with empty/whitespace-only text must appear in
    the output with n_chunks = 0 rather than vanishing — a pipeline
    reassembling the corpus from span_dedup output must not lose docs."""
    from azuredatalakeindexer_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "some normal words in a document here"),
            (2, ""),          # no tokens at all
            (3, "    "),      # whitespace-only
        ],
        ["doc_id", "text"],
    )
    for kwargs in ({}, {"broadcast_repeats": True}):
        out = {r["doc_id"]: r for r in span_dedup(docs, span_words=10, **kwargs).collect()}
        assert set(out) == {1, 2, 3}
        assert (out[2]["n_chunks"], out[2]["n_kept"], out[2]["cleaned"]) == (0, 0, "")
        assert (out[3]["n_chunks"], out[3]["n_kept"], out[3]["cleaned"]) == (0, 0, "")
        assert out[1]["n_kept"] == 1


def test_fuzzy_contamination_empty_benchmark_is_empty(spark):
    from azuredatalakeindexer_spark.operators.decontam import fuzzy_contamination_pairs

    train = spark.createDataFrame(
        [(1, "some words that form a training document")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert fuzzy_contamination_pairs(train, bench).count() == 0


def test_embedding_near_dup_single_vector_is_empty(spark):
    from azuredatalakeindexer_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.createDataFrame(
        [(1, [0.5] * 8)], "vec_id long, embedding array<double>"
    )
    assert embedding_near_dup_pairs(emb, sign_dims=4).count() == 0


def test_span_dedup_broadcast_repeats_identical_and_text_stays_local(spark):
    from azuredatalakeindexer_spark.operators.dedup import span_dedup
    from azuredatalakeindexer_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_DIR, "documents")
    base = span_dedup(docs, span_words=10)
    fast = span_dedup(docs, span_words=10, broadcast_repeats=True)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, fast.collect()))
    # the scale property: singleton-span text reaches the reassembly via
    # broadcast joins only — both repeat-set joins are broadcast, so no
    # SortMergeJoin appears before the doc_id reassembly
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2


def test_cluster_canonical_picks_quality_argmax(spark):
    from azuredatalakeindexer_spark.operators.dedup import cluster_canonical

    scored = spark.createDataFrame(
        [
            (1, 10, 0.5),
            (2, 10, 0.9),   # winner of cluster 10
            (3, 10, 0.9),   # ties with doc 2 on quality; doc 2 wins the id-asc tie-break
            (4, 40, 0.1),   # singleton
        ],
        ["doc_id", "cluster_id", "quality"],
    )
    out = {r["cluster_id"]: r for r in cluster_canonical(scored).collect()}
    assert out[10]["doc_id"] == 2 and out[10]["n_members"] == 3
    assert out[40]["doc_id"] == 4 and out[40]["n_members"] == 1


def test_semantic_dedup_drops_prototypes_keeps_outliers(spark):
    """SemDeDup keep-priority: within a duplicate pair the member with the
    LOWER centroid cosine survives; cross-cell near-dups are (documented)
    candidate misses; singleton cells always keep their member."""
    import numpy as np

    from azuredatalakeindexer_spark.operators.similarity import semantic_dedup

    c0 = np.zeros(8); c0[0] = 10.0
    c1 = np.zeros(8); c1[1] = 10.0
    as_list = lambda v: [float(x) for x in v]
    rows = [
        (0, as_list(c0)),                    # seed centroid of cell 0
        (1, as_list(c1)),                    # seed centroid of cell 1
        # a near-identical pair in cell 0: doc 2 is the prototype (closer
        # to the centroid), doc 3 the slightly-off copy
        (2, as_list(c0 + 0.01)),
        (3, as_list(c0 + 0.30)),
        # an unrelated singleton direction -> its own cosine-far member
        (4, [0.0, 0.0, 10.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(
        emb, n_centroids=2, threshold=0.95, max_cell=64
    ).collect()}
    assert len(out) == 5                      # one row per input vector
    # docs 0/2/3 share cell 0 and are pairwise-identical-grade; exactly the
    # lowest-centroid-cos member survives
    trio = [out[i] for i in (0, 2, 3)]
    assert {r["cell"] for r in trio} == {0}
    kept = [r["vec_id"] for r in trio if r["kept"] == 1]
    lowest = min(trio, key=lambda r: (r["centroid_cos"], r["vec_id"]))
    assert kept == [lowest["vec_id"]]
    # doc 1 is its own centroid, doc 4 is cosine-orthogonal to both cells —
    # whatever cell 4 lands in, nothing is near it, so both are kept
    assert out[1]["kept"] == 1 and out[4]["kept"] == 1


def test_semantic_dedup_mega_cell_star_guard(spark):
    """A cell above max_cell degrades to the linear star: output stays one
    row per vector, the top-priority member survives, every identical
    copy is dropped, and no O(m^2) clique is materialized."""
    from azuredatalakeindexer_spark.operators.similarity import semantic_dedup

    n = 40
    base = [1.0] * 8
    rows = [(i, base) for i in range(n)]     # one boilerplate embedding × 40
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, n_centroids=1, threshold=0.99, max_cell=8)
    rows_out = out.collect()
    assert len(rows_out) == n
    kept = sorted(r["vec_id"] for r in rows_out if r["kept"] == 1)
    # identical vectors: centroid_cos ties at 1.0, id-asc breaks -> vec 0
    assert kept == [0]
    # star guard: the plan carries no collect_list over the mega cell's
    # members (the clique branch filters it out), so candidate pairs are
    # linear in the cell size
    assert out.where(F.col("kept") == 0).count() == n - 1


def test_semantic_dedup_accepts_learned_centroids(spark):
    """kmeans_centroids plugs into semantic_dedup via the centroids= hook
    (the learned-quantizer production path)."""
    import numpy as np

    from azuredatalakeindexer_spark.operators.similarity import (
        kmeans_centroids,
        semantic_dedup,
    )

    rng = np.random.default_rng(3)
    rows = []
    for c in range(2):
        center = np.zeros(8); center[c] = 5.0
        for i in range(20):
            rows.append((c * 20 + i, [float(x) for x in center + rng.normal(0, 0.1, 8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()
    km = kmeans_centroids(emb, k=2, iters=3)
    out = semantic_dedup(emb, threshold=0.9, centroids=km)
    got = out.collect()
    assert len(got) == 40
    # the learned cells reproduce the two planted clusters; every within-
    # cell pair clears the 0.9 threshold (0.1-sigma jitter on a norm-5
    # center), so exists-dominance collapses each cell to its single
    # lowest-(centroid_cos, id) survivor
    assert {r["cell"] for r in got} == {0, 1}
    for cell in (0, 1):
        members = [r for r in got if r["cell"] == cell]
        kept = [r["vec_id"] for r in members if r["kept"] == 1]
        best = min(members, key=lambda r: (r["centroid_cos"], r["vec_id"]))
        assert kept == [best["vec_id"]]


def test_filtered_ivf_prefilter_guarantees_k_from_filtered_set(spark):
    """Azure filtered-vector-query semantics: the PRE-filter returns k
    neighbors from the filtered subset even when the query's k GLOBAL
    nearest all fail the filter (where a post-filter would starve)."""
    import numpy as np

    from azuredatalakeindexer_spark.operators.similarity import (
        brute_force_topk,
        filtered_ivf_topk,
    )

    rng = np.random.default_rng(11)
    rows = []
    # cluster A (ids 0-19, label 0) tight around +e1; cluster B (ids 20-39,
    # label 1) around -e1 — a cluster-A query's global top-k is all label 0
    for i in range(40):
        center = 1.0 if i < 20 else -1.0
        v = rng.normal(0, 0.05, 8)
        v[0] += center
        rows.append((i, [float(x) for x in v], 0 if i < 20 else 1))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    q = emb.where(F.col("vec_id") == 3)

    global_top = brute_force_topk(emb, q, k=5).collect()
    assert all(r["neighbor_id"] < 20 for r in global_top)      # post-filter on label=1 would starve to 0 rows

    filtered = filtered_ivf_topk(
        emb, q, F.col("label") == 1, k=5, n_centroids=4, n_probe=4
    ).collect()
    assert len(filtered) == 5
    assert all(r["neighbor_id"] >= 20 for r in filtered)       # every match from the filtered set


def test_learned_quantizer_holdout_recall_floor(spark):
    """The honest quantizer comparison (VERDICT r7, accepted): on queries
    DISJOINT from both quantizers' centroid sources, the learned (maxmin-
    seeded k-means) coarse quantizer must stay within 0.05 recall@10 of
    the first-k seed quantizer — pinned so the fair comparison cannot
    silently regress (in-sample queries flatter the seed quantizer by
    construction: each sits at the center of its own Voronoi cell)."""
    from azuredatalakeindexer_spark.operators.similarity import (
        ann_recall,
        ivf_topk,
        kmeans_centroids,
    )

    emb = load_table(spark, SF_DIR, "embeddings").cache()
    q_ho = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
    bf = brute_force_topk(emb, q_ho, k=10).cache()
    bf.count()
    learned = kmeans_centroids(emb, k=32, iters=8)
    seed_rec = ann_recall(bf, ivf_topk(emb, q_ho, k=10, n_centroids=32, n_probe=4))
    learned_rec = ann_recall(
        bf, ivf_topk(emb, q_ho, k=10, n_centroids=32, n_probe=4, centroids=learned)
    )
    assert learned_rec >= seed_rec - 0.05, (learned_rec, seed_rec)
    bf.unpersist()
    emb.unpersist()


# ------------------------------------------------------------ PQ (ADC)


def test_pq_encode_deterministic_and_exact_on_codewords(spark):
    """A vector that IS a codeword source must encode to its own codes
    (squared-L2 0 per subspace), and encoding is deterministic."""
    from azuredatalakeindexer_spark.operators.similarity import (
        pq_encode,
        seed_pq_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cb = seed_pq_codebooks(emb, m=4, k_pq=16)
    assert cb.count() == 64  # 4 subspaces x 16 codewords
    codes = pq_encode(emb, cb, m=4)
    # every vector gets exactly m codes
    bad = codes.groupBy("vec_id").count().where(F.col("count") != 4)
    assert bad.count() == 0
    # seed vectors (ids 0..15) reconstruct exactly: code == own id per sub
    own = codes.where(F.col("vec_id") < 16)
    assert own.where(F.col("code") != F.col("vec_id")).count() == 0


def test_pq_topk_rescore_is_exact_and_recall_reasonable(spark):
    """The ADC shortlist is approximate, but the returned cosines must be
    EXACT (identical to brute force for the same (query, neighbor)
    pairs), ranks consistent, and recall@5 vs brute force above a floor
    appropriate to 16-codeword seed codebooks."""
    from azuredatalakeindexer_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 5)
    pq = pq_topk(emb, q, k=5, m=4, k_pq=16, shortlist=50)
    rows = pq.collect()
    assert len(rows) == 25  # 5 queries x k
    bf = {(r["query_id"], r["neighbor_id"]): r["cosine"]
          for r in brute_force_topk(emb, q, k=50).collect()}
    hits = 0
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf:
            hits += 1
            assert bf[key] == r["cosine"], key  # rescore is exact cosine
    top5 = {(r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(emb, q, k=5).collect()}
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(top5 & got) / len(top5)
    assert recall >= 0.5, recall
    # shortlist large enough that k survivors always exist per query
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_pq_shortlist_full_corpus_degenerates_to_brute_force(spark):
    """With shortlist >= |corpus|, the rescore set is every vector, so
    pq_topk must equal brute force exactly — the ADC phase then only
    orders the shortlist, never drops a true neighbor."""
    from azuredatalakeindexer_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    q = emb.where(F.col("vec_id") < 3)
    n = emb.count()
    pq = [tuple(r) for r in pq_topk(emb, q, k=5, shortlist=n).collect()]
    bf = [tuple(r) for r in brute_force_topk(emb, q, k=5).collect()]
    assert pq == bf


def test_learned_pq_codebooks_deterministic_and_reduce_quantization_error(spark):
    """Per-subspace Lloyd's codebooks: bit-stable across reruns (RNG-free
    maxmin seeding + deterministic assignment), and they REDUCE the
    quantity k-means optimizes — mean squared subvector reconstruction
    error — versus the seed codebooks on the same corpus; they plug into
    pq_topk unchanged."""
    import numpy as np

    from azuredatalakeindexer_spark.operators.similarity import (
        learned_pq_codebooks,
        pq_topk,
        seed_pq_codebooks,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    m, k_pq = 4, 16
    learned = learned_pq_codebooks(emb, m=m, k_pq=k_pq, iters=5)
    again = learned_pq_codebooks(emb, m=m, k_pq=k_pq, iters=5)
    assert sorted(map(tuple, learned.collect())) == sorted(
        map(tuple, again.collect())
    )

    X = np.array([list(r[1]) for r in emb.collect()], dtype=np.float64)
    d_sub = X.shape[1] // m

    def mse(cb_df):
        books = {}
        for r in cb_df.collect():
            books.setdefault(r["sub"], {})[r["code"]] = np.array(r["cvec"])
        total = 0.0
        for s in range(m):
            Xs = X[:, s * d_sub : (s + 1) * d_sub]
            C = np.stack([books[s][c] for c in sorted(books[s])])
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            total += d2.min(axis=1).mean()
        return total

    seed_mse = mse(seed_pq_codebooks(emb, m, k_pq))
    learned_mse = mse(learned)
    assert learned_mse < seed_mse, (learned_mse, seed_mse)

    q = emb.where(F.col("vec_id") < 3)
    out = pq_topk(emb, q, k=5, m=m, k_pq=k_pq, shortlist=50, codebooks=learned)
    assert out.count() == 15


def test_real_video_branch(spark):
    """The REAL video branch of sample_frames (fake=False), env-gated on
    the runtime codec probe (VERDICT r11 missing-#3): where PyAV exists, a
    genuine encoded clip demuxes/decodes to strided frame fingerprints;
    where it does not (this container), the branch must raise
    NotImplementedError — never silently fall back to the fake sampler."""
    import pytest

    from azuredatalakeindexer_spark.operators.multimodal import (
        attach_binary_payload,
        codecs_available,
        sample_frames,
    )

    probe = codecs_available()
    docs = load_table(spark, SF_DIR, "documents").limit(3)
    mm = attach_binary_payload(docs)
    if not probe["video"]:
        with pytest.raises(Exception) as ei:
            sample_frames(mm, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )
        return
    # codec present: encode a tiny 4-frame clip and expect its frames back
    # (stride 1 via frame_bytes=16), dense indices, stable fingerprints
    import io

    import av
    import numpy as np

    buf = io.BytesIO()
    container = av.open(buf, mode="w", format="mp4")
    stream = container.add_stream("mpeg4", rate=4)
    stream.width, stream.height, stream.pix_fmt = 16, 16, "yuv420p"
    for i in range(4):
        arr = np.full((16, 16, 3), i * 40, dtype=np.uint8)
        for packet in stream.encode(av.VideoFrame.from_ndarray(arr, format="rgb24")):
            container.mux(packet)
    for packet in stream.encode():
        container.mux(packet)
    container.close()
    payload = buf.getvalue()
    clip = spark.createDataFrame(
        [(1, bytearray(payload), "video/mp4", len(payload))],
        "doc_id long, payload binary, mime string, byte_len long",
    )
    rows = sample_frames(clip, frame_bytes=16, fake=False).collect()
    assert len(rows) == 4
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2, 3]
    assert all(len(r["frame_hash"]) == 32 for r in rows)
    # undecodable bytes produce zero rows, not an error
    junk = spark.createDataFrame(
        [(2, bytearray(b"not a video"), "video/mp4", 11)],
        "doc_id long, payload binary, mime string, byte_len long",
    )
    assert sample_frames(junk, fake=False).count() == 0
