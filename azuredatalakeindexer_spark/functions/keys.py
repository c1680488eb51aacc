"""Scalar column functions F1-F5, F8-F10, F12-F13 (SURVEY §2.8) — pure
Catalyst expressions.

Everything here is a built-in-function composition (JVM-side, codegen'd); no
Python UDFs.  Each function cites the reference behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_encode_path(path: Column | str) -> Column:
    """URL-encode a lake path the way the reference stores it (F1).

    The reference uses ``HttpUtility.UrlEncode`` (lowercase percent-escapes;
    reference PathIndexClient.cs:125, PathIndexerFunc.cs:33).  Lake paths are
    ``[a-z0-9_./-]`` (reference DataLakeWriter.cs:18 generates exactly that
    charset), so the only escaped character is '/', giving '%2f'.  We encode
    exactly that, keeping byte-for-byte parity with the reference's stored
    form; tests/test_functions.py pins the charset assumption.  For arbitrary
    charsets use :func:`url_encode_full`.
    """
    return F.replace(_col(path), F.lit("/"), F.lit("%2f"))


def url_encode_full(path: Column | str) -> Column:
    """General URL-encode matching HttpUtility.UrlEncode semantics (F1).

    ``F.url_encode`` emits uppercase percent-escapes and '+' for space;
    ``HttpUtility.UrlEncode`` (reference PathIndexerFunc.cs:33) emits
    lowercase hex.  Spark has no "lowercase the regex match" replace, so the
    encoded string is split on '%' and the two hex digits opening every
    subsequent fragment are lowercased.  Slower than :func:`url_encode_path`
    — use only for data outside the lake ``[a-z0-9_./-]`` charset.
    """
    parts = F.split(F.url_encode(_col(path)), "%")
    head = F.element_at(parts, 1)
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    fixed = F.transform(
        tail,
        lambda frag: F.concat(
            F.lit("%"), F.lower(F.substring(frag, 1, 2)), F.substring(frag, 3, 1_000_000)
        ),
    )
    return F.concat(head, F.array_join(fixed, ""))


def url_decode_path(path_url_encoded: Column | str) -> Column:
    """Inverse of url_encode_path (F2; reference DataLakeIndexer.cs:87)."""
    col = _col(path_url_encoded)
    return F.replace(F.replace(col, F.lit("%2f"), F.lit("/")), F.lit("%2F"), F.lit("/"))


def path_key(filesystem: Column | str, path_url_encoded: Column | str) -> Column:
    """Deterministic surrogate key for a lake path (F3/F4).

    ``base64(utf8(filesystem + "%2f" + pathUrlEncoded))`` — reference
    PathIndexModel.cs:13.  C# ``Convert.ToBase64String`` emits RFC-4648
    standard base64 with padding and NO line breaks; PySpark 4's ``base64``
    emits MIME-chunked output (CRLF every 76 chars) unless
    ``spark.sql.legacy.chunkBase64String.enabled=false``, so the CRLFs are
    stripped here to guarantee parity for long paths regardless of session
    config (golden-tested in tests/test_functions.py).
    """
    raw = F.base64(
        F.to_binary(F.concat_ws("%2f", _col(filesystem), _col(path_url_encoded)), F.lit("utf-8"))
    )
    return F.replace(raw, F.lit("\r\n"), F.lit(""))


def split_url(url: Column | str) -> tuple[Column, Column]:
    """Split a blob URL into (filesystem, path) (F5/P12).

    Reference ``Utils.cs:10-14``: ``url.Split('/', 5)`` → parts[3] is the
    container, parts[4] the path ('https:', '', host, container, path).
    """
    parts = F.split(_col(url), "/", 5)
    return F.element_at(parts, 4), F.element_at(parts, 5)


def doc_size_bytes(*cols: Column | str) -> Column:
    """Serialized JSON byte size of a document (F10).

    The reference measures serialized size with a write-only counting stream
    (Utils.cs:50-55, CountingStream.cs:6-47); Spark computes it directly as
    ``octet_length(to_json(struct(...)))`` — codegen'd, no materialization.
    Divergence note: ``to_json`` omits null-valued fields while
    System.Text.Json writes ``"field":null``, so sizes differ for documents
    with null columns (documented per ADVICE r1; callers that need C# parity
    must coalesce nulls first).
    """
    struct = F.struct(*[_col(c) for c in cols]) if cols else F.struct("*")
    return F.octet_length(F.to_json(struct))


def iso_ts(ts: Column | str) -> Column:
    """ISO-8601 round-trip format (F8; reference PathIndexClient.cs:53).

    C# ``{ts:o}`` emits 7 fractional digits plus an offset (``Z`` under UTC):
    ``2024-01-01T00:09:58.7785490Z``.  Spark timestamps carry microseconds, so
    the 7th digit is always 0 — matching C#'s ticks rendering of any
    microsecond-precision value.  ``XXX`` renders ``Z`` for UTC sessions.
    """
    return F.date_format(_col(ts), "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSXXX")


def current_utc_ts() -> Column:
    """Current UTC timestamp (F9; reference PathIndexerFunc.cs:22,46).

    The session factory pins ``spark.sql.session.timeZone=UTC`` so
    ``current_timestamp()`` is UTC wall time; deterministic tests pass an
    explicit literal instead.
    """
    return F.current_timestamp()


def gen_uuid() -> Column:
    """GUID generation (F12; reference DataLakeIndexer.cs:81) — non-deterministic."""
    return F.uuid()


def path_interpolate(partition: Column | str, customer: Column | str, document: Column | str) -> Column:
    """Path interpolation (F13; reference DataLakeWriter.cs:18):
    ``partition_{p}/customer_{o}/document_{f}.json``."""
    return F.format_string(
        "partition_%s/customer_%s/document_%s.json",
        _col(partition).cast("string"),
        _col(customer).cast("string"),
        _col(document).cast("string"),
    )
