"""Page-level HEAD metadata + charset handling for crawled HTML —
the step between raw WARC payload bytes and the extraction kernel.

A real crawl is NOT uniformly UTF-8: pages declare encodings via BOM,
``<meta charset=…>``, or the legacy http-equiv form, and title /
meta-description / canonical-link are the head signals every curation
pipeline keys on (dedup by canonical URL, title-based clustering,
description-bearing quality priors). The reference never faces this —
its inputs are PDFs it renders itself (``table_ocr/core.py``) — but
the BASELINE.json input hint (Common-Crawl-style pages) does.

Pinned semantics (regex contract surface, identical in Java regex,
RE2, and Python ``re``; a production pipeline may swap the DOM walk
from :mod:`kernel.html_extract` in behind the same columns):

- ``title``            := group 1 of the FIRST ``(?i)<title[^>]*>``…
                          ``</title>`` match, trimmed to the ASCII
                          whitespace set; '' when absent.
- ``meta_description`` := first ``(?i)<meta name="description"
                          content="…">`` (canonical attribute order —
                          the cross-engine contract; the DOM walk
                          handles reordered attributes).
- ``canonical_url``    := first ``(?i)<link rel="canonical"
                          href="…">``.
- ``html_lang``        := first ``(?i)<html … lang="…">``, lowercased.
- ``charset``          := BOM sniff first (UTF-8 / UTF-16 LE / BE —
                          byte-prefix compare on the BINARY column,
                          before any lossy string cast), then
                          ``<meta charset=…>``, then the ``charset=``
                          parameter inside a meta tag's ``content``
                          attribute (the http-equiv Content-Type
                          form, either attribute order), else 'utf-8';
                          lowercased. WHATWG-encoding-style priority
                          without the full label table.

Scale shape: everything here is map-only column expressions over the
page scan — no Python, no exchange, fused into the same whole-stage
codegen pass as the extraction filter that follows. The decode kernel
(:func:`decode_payloads`) is the one Arrow hop, placed ONCE right
after WARC parse so every downstream operator sees clean UTF-8
strings; it is a bulk ``bytes.decode`` per row inside a batch, not
per-character Python.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TITLE_RE = "(?i)<title[^>]*>([^<]*)</title>"
META_DESC_RE = '(?i)<meta name="description" content="([^"]*)"'
CANONICAL_RE = '(?i)<link rel="canonical" href="([^"]*)"'
HTML_LANG_RE = '(?i)<html[^>]*\\slang="([^"]*)"'
META_CHARSET_RE = "(?i)<meta charset=\"?'?([a-z0-9_-]+)"
# charset= inside a META tag's content attribute (either attribute
# order: http-equiv first or content first). SCOPED deliberately — a
# bare 'charset=' match would sniff from unrelated page content such
# as <a href="/conv?charset=latin1">, silently mojibake-decoding a
# UTF-8 page (decode never fails into latin-1)
HTTP_EQUIV_CHARSET_RE = '(?i)<meta[^>]*content="[^"]*charset=([a-z0-9_-]+)'
_TRIM_RE = "^[ \\t\\r\\n]+|[ \\t\\r\\n]+$"

_BOM_UTF8 = bytes([0xEF, 0xBB, 0xBF])
_BOM_UTF16_LE = bytes([0xFF, 0xFE])
_BOM_UTF16_BE = bytes([0xFE, 0xFF])

# decode whitelist: stdlib codecs a crawl actually declares; anything
# else falls back to utf-8-replace (auditable via the charset column)
DECODABLE = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "ascii": "ascii",
    "us-ascii": "ascii",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "iso-8859-1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_charset(html_bin: Column) -> Column:
    """Charset of a BINARY html payload per the pinned priority
    (module doc). The BOM compare runs on raw bytes; the meta/
    http-equiv regexes run on the lossy UTF-8 string cast, which
    preserves the ASCII substrings they match."""
    s = html_bin.cast("string")
    meta = F.lower(F.regexp_extract(s, META_CHARSET_RE, 1))
    equiv = F.lower(F.regexp_extract(s, HTTP_EQUIV_CHARSET_RE, 1))
    return (
        F.when(
            F.substring(html_bin, 1, 3) == F.lit(_BOM_UTF8), F.lit("utf-8")
        )
        .when(
            F.substring(html_bin, 1, 2) == F.lit(_BOM_UTF16_LE),
            F.lit("utf-16le"),
        )
        .when(
            F.substring(html_bin, 1, 2) == F.lit(_BOM_UTF16_BE),
            F.lit("utf-16be"),
        )
        .when(meta != "", meta)
        .when(equiv != "", equiv)
        .otherwise(F.lit("utf-8"))
    )


def sniff_charset_py(payload: bytes) -> str:
    """Python twin of :func:`sniff_charset` — one pinned rule, two
    engines; differential-tested in tests/test_pagemeta.py."""
    import re

    if payload.startswith(_BOM_UTF8):
        return "utf-8"
    if payload.startswith(_BOM_UTF16_LE):
        return "utf-16le"
    if payload.startswith(_BOM_UTF16_BE):
        return "utf-16be"
    s = payload.decode("utf-8", "replace")
    m = re.search(META_CHARSET_RE, s)
    if m and m.group(1):
        return m.group(1).lower()
    m = re.search(HTTP_EQUIV_CHARSET_RE, s)
    if m and m.group(1):
        return m.group(1).lower()
    return "utf-8"


def page_metadata(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Pages → (url, title, meta_description, canonical_url,
    html_lang, charset). Map-only expressions; absent signals are ''
    (never NULL — '' composes with groupBy/joins without null-key
    surprises, and absence is itself the signal)."""
    h = F.col(html_col)
    s = h.cast("string")

    def rx(pattern: str) -> Column:
        return F.regexp_extract(s, pattern, 1)

    return df.select(
        F.col(url_col),
        F.regexp_replace(rx(TITLE_RE), _TRIM_RE, "").alias("title"),
        rx(META_DESC_RE).alias("meta_description"),
        rx(CANONICAL_RE).alias("canonical_url"),
        F.lower(rx(HTML_LANG_RE)).alias("html_lang"),
        sniff_charset(h).alias("charset"),
    )


DECODED_SCHEMA_FIELDS = [
    T.StructField("decoded_text", T.StringType()),
    T.StructField("decode_errors", T.BooleanType()),
]


def decode_payloads(
    df: DataFrame,
    html_col: str = "html",
    charset_col: str = "charset",
    keep_columns: tuple = ("url",),
) -> DataFrame:
    """(…, html binary, charset) → (keep_columns…, decoded_text,
    decode_errors): bulk ``bytes.decode`` per row inside an Arrow
    batch against the DECODABLE whitelist; unknown labels and decode
    failures fall back to utf-8-replace with ``decode_errors=True``
    (auditable, never a dropped row, never an executor crash on
    mojibake). One Arrow hop placed once after WARC parse; the BOM is
    stripped by the utf-16 family codecs and manually for utf-8-sig
    payloads so downstream byte-identity never sees U+FEFF."""
    import pandas as pd

    keep = [c for c in keep_columns if c not in (html_col, charset_col)]
    fields = [T.StructField(c, df.schema[c].dataType) for c in keep]
    out_schema = T.StructType(fields + DECODED_SCHEMA_FIELDS)

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            texts, errs = [], []
            for raw, label in zip(pdf[html_col], pdf[charset_col]):
                b = bytes(raw) if raw is not None else b""
                codec = DECODABLE.get((label or "").lower())
                err = codec is None
                if codec is None:
                    codec = "utf-8"
                try:
                    t = b.decode(codec)
                except (UnicodeDecodeError, LookupError):
                    t = b.decode("utf-8", "replace")
                    err = True
                if t[:1] == "\ufeff":  # utf-8 BOM survives the codec
                    t = t[1:]
                texts.append(t)
                errs.append(err)
            out = pdf[keep].copy()
            out["decoded_text"] = texts
            out["decode_errors"] = errs
            yield out

    cols = keep + [html_col, charset_col]
    return df.select(*cols).mapInPandas(kernel, out_schema)
