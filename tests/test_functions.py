"""Golden parity tests for the key/url/timestamp functions (F1-F5, F8).

SURVEY §7 risk list: base64/url-encoding parity for key determinism must be
golden-tested against the C# outputs.  The expected values below are computed
with Python's stdlib (`base64`, `urllib`), which matches C#
``Convert.ToBase64String`` / ``HttpUtility.UrlEncode`` for these inputs
(reference PathIndexModel.cs:13, PathIndexerFunc.cs:33).
"""

from __future__ import annotations

import base64

import pyspark.sql.functions as F

from azuredatalakeindexer_spark.functions.keys import (
    iso_ts,
    path_interpolate,
    path_key,
    split_url,
    url_decode_path,
    url_encode_full,
    url_encode_path,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_path_key_matches_csharp_base64(spark):
    # long path >= 57 input bytes → would contain CRLF if MIME-chunked
    fs = "stuff-large"
    path = "partition_1%2fcustomer_123%2fdocument_456789.json" * 3
    expected = base64.b64encode(f"{fs}%2f{path}".encode()).decode()
    got = one(spark, path_key(F.lit(fs), F.lit(path)))
    assert got == expected
    assert "\r" not in got and "\n" not in got


def test_path_key_short(spark):
    expected = base64.b64encode(b"fs%2fa.json").decode()
    assert one(spark, path_key(F.lit("fs"), F.lit("a.json"))) == expected


def test_url_encode_lake_charset(spark):
    # charset assumption pinned (ADVICE r1): [a-z0-9_./-] paths only escape '/'
    assert (
        one(spark, url_encode_path(F.lit("partition_1/customer_2/doc-3.json")))
        == "partition_1%2fcustomer_2%2fdoc-3.json"
    )


def test_url_encode_full_matches_httputility(spark):
    # HttpUtility.UrlEncode: space → '+', lowercase hex escapes
    assert one(spark, url_encode_full(F.lit("a b/c.json"))) == "a+b%2fc.json"
    assert one(spark, url_encode_full(F.lit("päth"))) == "p%c3%a4th"


def test_url_decode_roundtrip(spark):
    p = "partition_1/customer_2/document_3.json"
    assert one(spark, url_decode_path(url_encode_path(F.lit(p)))) == p
    # C# UrlEncode emits lowercase %2f; tolerate uppercase too
    assert one(spark, url_decode_path(F.lit("a%2Fb"))) == "a/b"


def test_split_url(spark):
    fs, path = split_url(F.lit("https://acct.dfs.core.windows.net/stuff/partition_1/doc.json"))
    row = (
        spark.range(1)
        .select(fs.alias("fs"), path.alias("p"))
        .collect()[0]
    )
    # url.Split('/', 5): parts[3]=container, parts[4]=remainder (Utils.cs:10-14)
    assert row["fs"] == "stuff"
    assert row["p"] == "partition_1/doc.json"


def test_iso_ts_format_matches_csharp_o(spark):
    # C# round-trip "o": 7 fractional digits + offset (Z under UTC)
    got = one(spark, iso_ts(F.lit("2024-01-02 03:04:05.123456").cast("timestamp")))
    assert got == "2024-01-02T03:04:05.1234560Z"


def test_path_interpolate(spark):
    got = one(spark, path_interpolate(F.lit(1), F.lit(22), F.lit(333)))
    assert got == "partition_1/customer_22/document_333.json"
