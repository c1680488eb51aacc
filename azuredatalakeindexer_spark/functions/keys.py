"""Scalar column functions F1-F13 (SURVEY §2.8) — pure Catalyst expressions.

Everything here is a built-in-function composition (JVM-side, codegen'd); no
Python UDFs. Each function cites the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def url_encode_path(path: Column | str) -> Column:
    """URL-encode a lake path the way the reference stores it (F1).

    The reference uses ``HttpUtility.UrlEncode`` (lowercase percent-escapes;
    reference PathIndexClient.cs:125, PathIndexerFunc.cs:33). Lake paths are
    ``[a-z0-9_./-]`` so the only escaped character is '/', giving '%2f'. We
    encode exactly that, keeping byte-for-byte parity with the reference's
    stored form. For arbitrary charsets use ``F.url_encode`` (uppercase
    escapes) and normalize with ``lower()`` before comparisons.
    """
    return F.replace(F.col(path) if isinstance(path, str) else path, F.lit("/"), F.lit("%2f"))


def url_decode_path(path_url_encoded: Column | str) -> Column:
    """Inverse of url_encode_path (F2; reference DataLakeIndexer.cs:87)."""
    col = F.col(path_url_encoded) if isinstance(path_url_encoded, str) else path_url_encoded
    return F.replace(F.replace(col, F.lit("%2f"), F.lit("/")), F.lit("%2F"), F.lit("/"))


def path_key(filesystem: Column | str, path_url_encoded: Column | str) -> Column:
    """Deterministic surrogate key for a lake path (F3/F4).

    ``base64(utf8(filesystem + "%2f" + pathUrlEncoded))`` — reference
    PathIndexModel.cs:13. Standard RFC-4648 base64 with padding, which matches
    C# ``Convert.ToBase64String``.
    """
    fs = F.col(filesystem) if isinstance(filesystem, str) else filesystem
    p = F.col(path_url_encoded) if isinstance(path_url_encoded, str) else path_url_encoded
    return F.base64(F.to_binary(F.concat_ws("%2f", fs, p), F.lit("utf-8")))


def split_url(url: Column | str) -> tuple[Column, Column]:
    """Split a blob URL into (filesystem, path) (F5/P12).

    Reference ``Utils.cs:10-14``: ``url.Split('/', 5)`` → parts[3] is the
    container, parts[4] the path ('https:', '', host, container, path).
    """
    col = F.col(url) if isinstance(url, str) else url
    parts = F.split(col, "/", 5)
    return F.element_at(parts, 4), F.element_at(parts, 5)


def doc_size_bytes(*cols: Column | str) -> Column:
    """Serialized JSON byte size of a document (F10).

    The reference measures serialized size with a write-only counting stream
    (Utils.cs:50-55, CountingStream.cs:6-47); Spark computes it directly as
    ``octet_length(to_json(struct(...)))`` — codegen'd, no materialization.
    """
    struct = F.struct(*cols) if cols else F.struct("*")
    return F.octet_length(F.to_json(struct))


def iso_ts(ts: Column | str) -> Column:
    """ISO-8601 round-trip format (F8; reference PathIndexClient.cs:53)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
