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
    """Contiguous word n-grams joined with spaces; empty array if too short."""
    sz = F.size(token_array)
    grams = F.transform(
        F.sequence(F.lit(1), sz - (n - 1)),
        lambda i: F.array_join(F.slice(token_array, i, n), " "),
    )
    return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))


def minhash_signature(grams: Column, num_hashes: int) -> Column:
    """MinHash signature: array of ``min_g hash_i(g)`` for i in [0, num_hashes).

    Null-safe: an empty shingle set yields nulls in the signature (callers
    filter docs with too little text before banding).
    """
    def hasher(seed: int):
        # NB: a 2-arg lambda (``lambda g, i=seed``) would receive the ARRAY
        # INDEX as its second argument from F.transform — closure required
        return lambda g: portable_hash64(g, seed)

    sig = [F.array_min(F.transform(grams, hasher(i))) for i in range(num_hashes)]
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
