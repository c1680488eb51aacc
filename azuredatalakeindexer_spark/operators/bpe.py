"""Distributed BPE tokenizer training + vocabulary-cached encoding.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) as a Spark-first
pipeline stage: the corpus is touched ONCE to build the ``(word, count)``
vocabulary relation, and every training iteration then runs on that
vocabulary table — classically ~10³-10⁷ rows regardless of corpus size —
so 100 TB of text trains at the cost of one corpus shuffle plus
``n_merges`` vocabulary-sized jobs.  Per iteration only ONE (left, right,
count) row crosses to the driver — model traffic, exactly like
``kmeans_centroids``.

Symbol-string representation (the trick that keeps every step a built-in
JVM expression AND SQL-replayable by the DuckDB oracle): a word's current
segmentation is stored as each symbol wrapped in single spaces and
concatenated — ``[a, bc]`` ↔ ``' a  bc '`` (note the doubled space between
symbols: a's trailing + bc's leading wrapper).  Applying merge (l, r) is
then the plain-string ``replace(' l  r ', ' lr ')``: because every symbol
owns BOTH its delimiters, consecutive occurrences never share a boundary
character, so one left-to-right non-overlapping ``replace`` pass — the
exact semantics of both Spark's and DuckDB's ``replace`` — reproduces the
greedy "merge all occurrences" BPE iteration, including runs of identical
symbols (``' a  a  a  a '`` → ``' aa  aa '`` in one pass).  No regex, no
UDF, no lookahead (which RE2/DuckDB lacks anyway).

Words cannot contain whitespace (they come from the whitespace tokenizer),
so the space wrapper is collision-free.  Merges never cross word
boundaries (standard word-level BPE).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from azuredatalakeindexer_spark.functions.localrel import tiny_df
from azuredatalakeindexer_spark.functions.text import tokens
from azuredatalakeindexer_spark.operators.util import ensure_parallelism

#: merge-table schema shared by train_bpe and its consumers
MERGE_SCHEMA = "rank int, left string, right string, merged string, pair_count bigint"


def word_vocab(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The ``(word, wcount)`` vocabulary relation — the ONLY corpus-wide
    pass of BPE training (one explode + one hash-aggregate shuffle,
    map-side combined)."""
    docs = ensure_parallelism(docs)
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _char_sym_str(word: F.Column) -> F.Column:
    """Initial segmentation: every character wrapped ``' c '``."""
    return F.concat_ws(
        "",
        F.transform(F.split(word, ""), lambda c: F.concat(F.lit(" "), c, F.lit(" "))),
    )


def _symbols(sym_str: F.Column) -> F.Column:
    """Back from the wrapped string to the symbol array: trim the outer
    single spaces, split on the doubled inter-symbol space."""
    return F.split(F.trim(sym_str), "  ")


def pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a ``(sym_str, wcount)`` vocabulary:
    ``(left, right, cnt)`` weighted by word frequency.  Vocabulary-sized
    explode + one small aggregate — never touches the corpus."""
    syms = _symbols(F.col("sym_str"))
    pairs = F.arrays_zip(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))).alias("l"),
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))).alias("r"),
    )
    return (
        vocab_syms.select(F.explode(pairs).alias("p"), F.col("wcount"))
        .select(F.col("p.l").alias("left"), F.col("p.r").alias("right"), "wcount")
        .where((F.col("left") != "") & (F.col("right") != ""))
        .groupBy("left", "right")
        .agg(F.sum("wcount").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the rank-ordered merge table
    ``(rank, left, right, merged, pair_count)``.

    Iteration = one vocabulary-sized pair-count aggregate, a deterministic
    argmax (``cnt DESC, left ASC, right ASC`` — single LIMIT 1 row to the
    driver), and one narrow ``replace`` over the vocabulary, re-anchored
    with ``localCheckpoint`` so plan depth stays O(1) per round (at 100 TB
    use a reliable checkpoint / scratch table, as with
    ``connected_components``).  Stops early if no pair remains.

    The correctness oracle unrolls these exact steps as chained SQL CTEs
    (``__spark_entry__.py::oracle_sql()['bpe_train']``), so the whole
    training trajectory — not just the final vocab — is cross-checked.
    """
    vocab = (
        word_vocab(docs, text_col, id_col)
        .select(_char_sym_str(F.col("word")).alias("sym_str"), "wcount")
        .localCheckpoint()
    )
    spark = docs.sparkSession
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merges.append((rank, l, r, l + r, cnt))
        vocab = vocab.withColumn(
            "sym_str",
            F.replace(
                F.col("sym_str"), F.lit(f" {l}  {r} "), F.lit(f" {l + r} ")
            ),
        )
        # re-anchor every few rounds, not every round: a handful of stacked
        # `replace` expressions is cheap to recompute, while materializing
        # the vocabulary per iteration costs a full write+read of it (~2×
        # train time measured at sf0.1); unbounded stacking would still
        # blow plan depth, so the cadence bounds it at 4
        if rank % 4 == 0:
            vocab = vocab.localCheckpoint()
    return tiny_df(spark, merges, MERGE_SCHEMA)


#: above this many merges the expression-stack encoder is swapped for the
#: Arrow word-level encoder (one `replace` expression per merge blows the
#: codegen budget at production vocabulary sizes — ~30k merges)
ARROW_MERGE_THRESHOLD = 48


def apply_merges(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    use_arrow: bool | None = None,
) -> DataFrame:
    """Segment each distinct word with a learned merge list (rank order):
    adds ``bpe_tokens array<string>`` and ``n_bpe bigint``.

    Two physically different encoders with IDENTICAL semantics for
    WELL-FORMED merge lists — each rule's left/right symbols are single
    characters or outputs of earlier rules, as ``train_bpe`` produces
    (parity is pytest-pinned at the crossover).  For an arbitrary
    hand-built list violating that invariant (e.g. ``[("a","bc"),
    ("b","c")]``) the two paths can legitimately diverge: the expression
    stack replays rules in rank order and never revisits earlier ranks,
    while the Arrow loop always merges the lowest applicable rank.

    - ``use_arrow=False`` (default ≤ ``ARROW_MERGE_THRESHOLD`` merges): a
      stack of plain ``replace`` expressions over the wrapped symbol
      string — pure codegen, no shuffle, SQL-replayable merge-for-merge;
    - ``use_arrow=True`` (default above the threshold): an Arrow
      ``mapInPandas`` encoder applying the merge table in Python.  This is
      the legitimate Arrow-stage shape: it runs over the DISTINCT-word
      relation (vocabulary-sized, NOT corpus-sized), a production merge
      list is a driver-held dict, and a per-batch word cache makes each
      distinct word cost one O(len²) segmentation.

    Either way the corpus itself is never re-scanned — encoding joins back
    over distinct words (`encode_bpe`).
    """
    if use_arrow is None:
        use_arrow = len(merges) > ARROW_MERGE_THRESHOLD
    if use_arrow:
        return _apply_merges_arrow(words, merges, word_col)
    sym = _char_sym_str(F.col(word_col))
    for l, r in merges:
        sym = F.replace(sym, F.lit(f" {l}  {r} "), F.lit(f" {l + r} "))
    toks = _symbols(sym)
    return words.select(
        "*",
        toks.alias("bpe_tokens"),
        F.size(toks).cast("bigint").alias("n_bpe"),
    )


def _apply_merges_arrow(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Arrow word-level BPE encoder: lowest-rank-first pair merging with a
    rank dict, the standard production encoding loop.

    Equivalent to the sequential expression path: once merge k's pass has
    run, pair k can never reappear (merges only concatenate symbols —
    they neither create the shorter left/right symbols nor bring two
    symbols together by deleting between them), so picking the
    lowest-rank applicable pair and merging all its non-overlapping
    occurrences left-to-right replays the rank-order passes exactly,
    skipping the inapplicable ones.  Cost per word is O(len²) regardless
    of merge-table size, vs O(n_merges · len) for the expression stack.
    """
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {pair: i for i, pair in enumerate(merges)}
    merge_list = list(merges)
    out_schema = StructType(
        list(words.schema.fields)
        + [
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe", LongType()),
        ]
    )

    def encode_batches(batches):
        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            hit = cache.get(word)
            if hit is not None:
                return hit
            syms = list(word)
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                l, rgt = merge_list[best]
                out = []
                i = 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == rgt:
                        out.append(l + rgt)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[word] = syms
            return syms

        for pdf in batches:
            toks = pdf[word_col].map(seg)
            yield pdf.assign(bpe_tokens=toks, n_bpe=toks.map(len).astype("int64"))

    return words.mapInPandas(encode_batches, out_schema)


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    use_arrow: bool | None = None,
) -> DataFrame:
    """Vocabulary-cached BPE encoding: per-document BPE token counts
    ``(id_col, n_words, n_bpe_tokens)``.

    Scale shape: the merge chain runs once per DISTINCT word (the
    vocabulary relation), then a broadcast join maps every (doc, word)
    occurrence to its cached subword count — the corpus is exploded to
    id+word pairs but the expensive segmentation never touches it.  This
    is the distributed analog of the word-cache every production BPE
    tokenizer keeps in memory.
    """
    docs = ensure_parallelism(docs)
    occurrences = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    vocab = apply_merges(
        occurrences.select("word").distinct(), merges, use_arrow=use_arrow
    ).select("word", "n_bpe")
    return (
        occurrences.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_bpe").cast("bigint").alias("n_bpe_tokens"),
        )
    )
