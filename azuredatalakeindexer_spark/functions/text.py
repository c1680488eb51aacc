"""Text-analysis column primitives for the LLM-data-pipeline operators.

These generalize the reference's analyzer semantics (keyword_v2 + lowercase,
reference SearchIndexerTest/Program.cs:59-60 → SURVEY §2.8 F6/F7) into the
tokenize / shingle / hash toolbox that dedup (MinHash-LSH, SimHash), document
fingerprinting, and quality scoring need at 100 TB scale.

Everything is a pure Catalyst expression (JVM-side, codegen'd) — no Python
UDFs in any hot path.  Hashing is built on md5 so results are bit-identical
across engines (the DuckDB correctness oracle reproduces every function with
``('0x' || substr(md5(x),1,15))::BIGINT`` — verified equal to Spark's
``conv(substring(md5(x),1,15),16,10)``).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: modulus for the rolling document fingerprint (fits comfortably in int64
#: during the fold: acc < 1e9, acc*131 + code < 2^63)
FINGERPRINT_MOD = 1_000_000_007
#: per-word code space for the rolling fingerprint (2^28)
WORD_CODE_MOD = 268_435_456
#: Mersenne prime 2^31 - 1: modulus of the affine universal-hash family used
#: for MinHash.  base < p and a < p keep ``a*h + b`` under 2^62 — no int64
#: overflow, and ``%`` on nonnegative operands is identical in Spark/DuckDB.
MERSENNE31 = 2_147_483_647
#: fixed (a, b) parameters of the affine family h_i(x) = (a_i*x + b_i) mod p.
#: Arbitrary odd multipliers / offsets below 2^31, hardcoded so both engines
#: (and reruns) derive the same signatures.
MINHASH_AB: list[tuple[int, int]] = [
    (1_203_793_951, 395_008_081), (1_636_843_941, 910_118_291),
    (824_918_393, 1_518_049_661), (593_116_427, 134_217_689),
    (1_926_227_239, 552_398_111), (1_073_807_359, 789_024_847),
    (389_046_883, 1_842_617_393), (1_500_450_271, 262_144_071),
    (715_827_883, 1_104_001_273), (982_451_653, 472_882_049),
    (1_257_787_003, 86_028_157), (472_882_027, 1_300_609_429),
    (198_491_317, 694_847_539), (879_190_841, 1_111_111_121),
    (1_727_913_571, 333_667_111), (611_953_517, 1_555_555_567),
]


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens (F6/F7 generalized).

    The reference's ``keyword_v2`` analyzer treats the whole string as one
    lowercase token; for the LLM-pipeline operators we need word tokens, so
    this is the standard whitespace tokenizer over ``lower(text)``.
    """
    return F.filter(F.split(F.lower(_col(text)), r"\s+"), lambda t: t != "")


def regex_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, single symbols."""
    return F.regexp_extract_all(F.lower(_col(text)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0))


def portable_hash64(value: Column | str, seed: int = 0) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB.

    ``bigint(conv(substr(md5(seed || '|' || value), 1, 15), 16, 10))`` — the
    first 15 hex chars of an md5, which DuckDB reproduces exactly as
    ``('0x' || substr(md5(...), 1, 15))::BIGINT``.  Used for MinHash seeds,
    SimHash token bits, and band keys so the correctness oracle can replay
    the whole dedup pipeline in SQL.
    """
    payload = F.concat_ws("|", F.lit(str(seed)), _col(value))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def word_ngrams(token_array: Column, n: int) -> Column:
    """Contiguous word n-grams joined with spaces; empty array if too short.

    Implemented as ``arrays_zip`` of ``n`` shifted slices + one concat per
    gram, NOT a per-position ``slice`` inside a ``transform`` lambda: Catalyst
    does no common-subexpression elimination across higher-order-function
    lambdas, so a per-position slice re-evaluates the full ``token_array``
    expression (often a ``split`` over the raw text) once per gram — O(n²)
    splits per document.  The zip form references ``token_array`` a constant
    ``n+1`` times regardless of length (5.5× faster on the sf0.1 corpus).
    """
    sz = F.size(token_array)
    width = F.greatest(sz - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(token_array, i + 1, width) for i in range(n)])
    # arrays_zip names fields positionally ("0", "1", ...) for non-column
    # inputs; the slice expressions above guarantee that naming
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))


def gram_hashes(grams: Column) -> Column:
    """One 31-bit base hash per shingle: ``portable_hash64(g) % MERSENNE31``.

    This is the ONLY md5 evaluation in the MinHash pipeline — callers
    project this array in its own select so the signature derivation below
    reuses it instead of re-hashing the gram strings once per hash function
    (8 md5/gram → 1 md5/gram, the dominant dedup_minhash_lsh cost).
    """
    return F.transform(grams, lambda g: portable_hash64(g) % MERSENNE31)


def minhash_signature(hashes: Column, num_hashes: int) -> Column:
    """MinHash signature from pre-hashed shingles: array of
    ``min_h (a_i*h + b_i) mod p`` for i in [0, num_hashes).

    The per-function hashes are an affine universal family
    (Carter–Wegman) over the single md5-derived base hash from
    :func:`gram_hashes` — standard MinHash practice, and 8× cheaper than
    salting md5 per function.  ``num_hashes`` ≤ ``len(MINHASH_AB)``.

    Null-safe: an empty shingle set yields nulls in the signature (callers
    filter docs with too little text before banding).
    """
    def hasher(i: int):
        a, b = MINHASH_AB[i]
        # NB: a 2-arg lambda would receive the ARRAY INDEX as its second
        # argument from F.transform — closure required
        return lambda h: (h * F.lit(a) + F.lit(b)) % MERSENNE31

    sig = [F.array_min(F.transform(hashes, hasher(i))) for i in range(num_hashes)]
    return F.array(*sig)


def band_key(signature: Column, band: int, band_size: int) -> Column:
    """LSH band key: hash of one band of the MinHash signature.

    Banding theory (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets"
    ch.3): docs sharing any band collide; join on (band_id, band_key) is an
    equi-join — never an all-pairs product.
    """
    slice_ = F.slice(signature, band * band_size + 1, band_size)
    return F.md5(F.concat_ws(",", F.lit(str(band)), F.array_join(F.transform(slice_, lambda h: h.cast("string")), ",")))


def rolling_fingerprint(token_array: Column) -> Column:
    """Karp-Rabin-style rolling polynomial fingerprint over word codes.

    ``fp = fold(tokens, 0, (acc, w) -> (acc*131 + code(w)) % 1e9+7)`` with
    ``code(w) = portable_hash64(w) % 2^28``.  Order-sensitive (unlike a bag
    hash) so re-ordered documents fingerprint differently.
    """
    return F.aggregate(
        token_array,
        F.lit(0).cast("bigint"),
        lambda acc, w: (acc * 131 + portable_hash64(w) % WORD_CODE_MOD) % FINGERPRINT_MOD,
    )


def char_fingerprint(text: Column | str, prefix_len: int = 64) -> Column:
    """Cheap exact-dup fingerprint: md5 of the normalized char prefix."""
    norm = F.regexp_replace(F.lower(_col(text)), r"\s+", " ")
    return F.md5(F.substring(norm, 1, prefix_len))


def stopword_hits(token_array: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in the given stopword list."""
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(token_array, lambda t: F.array_contains(sw, t)))
