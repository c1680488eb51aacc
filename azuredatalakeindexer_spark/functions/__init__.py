from azuredatalakeindexer_spark.functions.keys import (
    doc_size_bytes,
    iso_ts,
    path_key,
    split_url,
    url_decode_path,
    url_encode_path,
)
from azuredatalakeindexer_spark.functions.text import (
    char_fingerprint,
    simhash32,
    token_fp,
    tokens,
    word_ngrams,
)

__all__ = [
    "path_key",
    "url_encode_path",
    "url_decode_path",
    "split_url",
    "doc_size_bytes",
    "iso_ts",
    "tokens",
    "token_fp",
    "word_ngrams",
    "char_fingerprint",
    "simhash32",
]
