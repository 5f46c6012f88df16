"""Page HEAD metadata + charset sniff/decode (operators/pagemeta.py)."""

import pytest

from table_ocr_spark.operators.pagemeta import (
    decode_payloads,
    page_metadata,
    sniff_charset_py,
)


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (
            "u1",
            b'<html lang="EN-us"><head><title> My Page \t</title>'
            b'<meta name="description" content="a fine page">'
            b'<link rel="canonical" href="http://c.test/p1"></head>'
            b"<body>hi</body></html>",
        ),
        ("u2", b"<HTML><TITLE>caps title</TITLE><p>x</p>"),
        ("u3", b"<p>no head at all</p>"),
        ("u4", b'<meta charset="ISO-8859-1"><p>x</p>'),
        (
            "u5",
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=Windows-1252"><p>x</p>',
        ),
        ("u6", b"\xef\xbb\xbf<meta charset=\"latin-1\"><p>bom wins</p>"),
        ("u7", b"\xff\xfe<p>utf-16le bom</p>"),
        ("u8", b"\xfe\xff<p>utf-16be bom</p>"),
        ("u9", None),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


class TestMetadata:
    def test_pinned_fields(self, pages):
        m = {r.url: r for r in page_metadata(pages).collect()}
        assert m["u1"].title == "My Page"
        assert m["u1"].meta_description == "a fine page"
        assert m["u1"].canonical_url == "http://c.test/p1"
        assert m["u1"].html_lang == "en-us"
        assert m["u2"].title == "caps title"  # (?i) tag match
        # absence is '' everywhere, never NULL
        u3 = m["u3"]
        assert (u3.title, u3.meta_description, u3.canonical_url,
                u3.html_lang) == ("", "", "", "")

    def test_charset_priority_and_twin(self, pages):
        m = {r.url: r.charset for r in page_metadata(pages).collect()}
        expect = {
            "u1": "utf-8",       # default
            "u4": "iso-8859-1",  # meta charset, lowercased
            "u5": "windows-1252",  # http-equiv param
            "u6": "utf-8",       # BOM beats meta
            "u7": "utf-16le",
            "u8": "utf-16be",
        }
        for k, v in expect.items():
            assert m[k] == v, k
        # differential: python twin agrees on every fixture payload
        raw = {
            "u1": b'<html lang="EN-us"><head><title> My Page \t</title>'
                  b'<meta name="description" content="a fine page">'
                  b'<link rel="canonical" href="http://c.test/p1"></head>'
                  b"<body>hi</body></html>",
            "u4": b'<meta charset="ISO-8859-1"><p>x</p>',
            "u5": b'<meta http-equiv="Content-Type" '
                  b'content="text/html; charset=Windows-1252"><p>x</p>',
            "u6": b"\xef\xbb\xbf<meta charset=\"latin-1\"><p>bom wins</p>",
            "u7": b"\xff\xfe<p>utf-16le bom</p>",
            "u8": b"\xfe\xff<p>utf-16be bom</p>",
        }
        for k, payload in raw.items():
            assert sniff_charset_py(payload) == expect[k], k


    def test_charset_sniff_is_meta_scoped(self, spark):
        """Round-5 review regression: a bare 'charset=' in page
        CONTENT (a link href, visible text) must not set the sniffed
        charset -- only a meta tag's content attribute counts, in
        either attribute order."""
        rows = [
            # charset= in an href: stays utf-8 (was 'latin1' mojibake)
            ("u1", b'<a href="/conv?charset=latin1&id=3">x</a>'),
            # charset= in visible text: stays utf-8
            ("u2", b"<p>use charset=ascii here</p>"),
            # reversed attribute order still sniffs
            ("u3", b'<meta content="text/html; charset=Windows-1252" '
                   b'http-equiv="Content-Type">'),
        ]
        pages = spark.createDataFrame(rows, "url string, html binary")
        got = {r.url: r.charset for r in page_metadata(pages).collect()}
        assert got == {"u1": "utf-8", "u2": "utf-8", "u3": "windows-1252"}
        for url, payload in rows:
            assert sniff_charset_py(payload) == got[url], url


class TestDecode:
    def test_whitelist_roundtrip(self, spark):
        cases = [
            ("a", "café überwelt".encode("utf-8"), "utf-8", False),
            ("b", "café".encode("latin-1"), "iso-8859-1", False),
            ("c", "smart “quotes”".encode("cp1252"), "windows-1252", False),
            ("d", "wide text".encode("utf-16-le"), "utf-16le", False),
            ("e", "﻿bom text".encode("utf-8"), "utf-8", False),
            # unknown label → utf-8 fallback, flagged
            ("f", b"plain ascii", "shift_jis", True),
            # declared latin-1 never fails (every byte maps)
            ("g", b"\xff\xfe\x80", "latin-1", False),
            # declared utf-8 but invalid bytes → replace, flagged
            ("h", b"ok \xff\xfe bad", "utf-8", True),
        ]
        df = spark.createDataFrame(
            [(u, b, c) for u, b, c, _ in cases],
            "url string, html binary, charset string",
        )
        got = {r.url: r for r in decode_payloads(df).collect()}
        assert got["a"].decoded_text == "café überwelt"
        assert got["b"].decoded_text == "café"
        assert got["c"].decoded_text == "smart “quotes”"
        assert got["d"].decoded_text == "wide text"
        assert got["e"].decoded_text == "bom text"  # BOM stripped
        assert got["f"].decoded_text == "plain ascii"
        for u, _, _, want_err in cases:
            assert got[u].decode_errors is want_err, u

    def test_sniff_then_decode_chain(self, spark):
        # the real chain: binary page -> sniff -> decode
        payloads = [
            ("p1", "título en UTF-8".encode("utf-8")),
            (
                "p2",
                b'<meta charset="iso-8859-1">' + "señal".encode("latin-1"),
            ),
            ("p3", "﻿utf16 page".encode("utf-16-le")),
        ]
        df = spark.createDataFrame(payloads, "url string, html binary")
        from table_ocr_spark.operators.pagemeta import sniff_charset
        from pyspark.sql import functions as F

        staged = df.withColumn("charset", sniff_charset(F.col("html")))
        out = {r.url: r.decoded_text for r in decode_payloads(staged).collect()}
        assert out["p1"] == "título en UTF-8"
        assert "señal" in out["p2"]
        assert out["p3"] == "utf16 page"  # BOM consumed by utf-16le
