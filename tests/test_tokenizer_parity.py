"""Differential test: the fast regex tokenizer must produce
byte-identical extractions to a stdlib html.parser-driven twin of the
same event state machine — on the full synthetic corpus AND on crafted
edge-case markup. This locks the tokenizer-swap optimization to the
original semantics."""

from html.parser import HTMLParser

import pytest

from table_ocr_spark.datagen.pages import generate_pages
from table_ocr_spark.kernel.html_extract import _Extractor, extract_html


class _StdlibDriver(HTMLParser):
    """Feeds the SAME _Extractor state machine from html.parser events
    (the pre-optimization architecture), converting the attrs list to
    the raw-string protocol the extractor now expects."""

    def __init__(self, ex: _Extractor):
        super().__init__(convert_charrefs=True)
        self.ex = ex

    def handle_starttag(self, tag, attrs):
        raw = " ".join(
            f'{k}="{v}"' if v is not None else k for k, v in attrs
        )
        self.ex.handle_starttag(tag, raw)

    def handle_startendtag(self, tag, attrs):
        # stdlib default semantics: start THEN end (round-5 fix — the
        # old start-only twin pinned the depth-leak bug into parity)
        self.handle_starttag(tag, attrs)
        self.ex.handle_endtag(tag)

    def handle_endtag(self, tag):
        self.ex.handle_endtag(tag)

    def handle_data(self, data):
        self.ex.handle_data(data)


def _extract_stdlib(html):
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    ex = _Extractor()
    drv = _StdlibDriver(ex)
    try:
        drv.feed(html)
        drv.close()
    finally:
        ex.close()
    from table_ocr_spark.kernel.html_extract import (
        MAX_LINK_DENSITY,
        MIN_BLOCK_CHARS,
        MIN_TABLE_COLS,
        MIN_TABLE_ROWS,
        _build_grid,
        _resolve_dittos,
        ExtractionResult,
    )
    from table_ocr_spark.kernel.textops import normalize_text

    kept = []
    for raw, total, link, in_article in ex.blocks:
        norm = normalize_text(raw)
        if not norm:
            continue
        if in_article:
            kept.append(norm)
            continue
        if total and (link / total) > MAX_LINK_DENSITY:
            continue
        if len(norm) < MIN_BLOCK_CHARS:
            continue
        kept.append(norm)
    cells, tid = [], 0
    for t in ex.tables:
        cs, n_rows, n_cols = _build_grid(tid, t.rows)
        if n_rows < MIN_TABLE_ROWS or n_cols < MIN_TABLE_COLS:
            continue
        cells.extend(cs)
        tid += 1
    _resolve_dittos(cells)
    return ExtractionResult("\n".join(kept), cells, tid)


EDGE_CASES = [
    b"<html><body><article><p>A &amp; B &lt;tag&gt; &#65;&#x42;</p></article></body></html>",
    b"<ARTICLE><P>UPPERCASE TAGS with words enough</P></ARTICLE>",
    b"<article><p>a < b and c > d stray brackets</p></article>",
    b"<article><p>text<!-- comment --><b>bold</b><br>line</p></article>",
    b'<article><p>quoted <a href="x>y">attr with gt</a> end</p></article>',
    b"<script>var x = '<p>not a tag</p>';</script><article><p>after script ok</p></article>",
    b"<style>p > a { color: red }</style><article><p>after style ok</p></article>",
    b"<table><tr><td rowspan='2'>a</td><td>b</td></tr><tr><td>c</td></tr></table>",
    b"<table><tr><th colspan=2>h</th></tr><tr><td>x</td><td>\"</td></tr><tr><td>y</td><td>z</td></tr></table>",
    b"<article><p>unclosed paragraph",
    b"<table><tr><td>nested <table><tr><td>inner</td></tr></table> host</td><td>k</td></tr><tr><td>r</td><td>s</td></tr></table>",
    b"<?xml version='1.0'?><!DOCTYPE html><article><p>after decls fine</p></article>",
    b"<article><p>self-closing <td/> inline</p></article>",
    # round-5 regression: self-closing container tags must not leak
    # skip/boiler/link depth and empty the rest of the page
    b'<html><body><script src="a.js"/><p>content after a self-closing script tag survives extraction</p></body></html>',
    b"<header/><p>content after a self-closing header tag survives extraction here</p>",
    b'<a/><p>content after a self-closing anchor is not all link-density-dropped text</p>',
    b'<article><table/><p>self-closing table then enough words for a block</p></article>',
    # unquoted-value trailing slash is NOT self-closing (stdlib attr
    # scan consumes it into the value)
    b'<article><a href=http://x.test/>linked words</a><p>trailing slash in unquoted href stays open</p></article>',
    b'<article><p rowspan="2" />spaced self-close then words enough to keep</p></article>',
]


def test_parity_on_edge_cases():
    for html in EDGE_CASES:
        fast = extract_html(html)
        ref = _extract_stdlib(html)
        assert fast.text == ref.text, html
        assert fast.cells_as_dicts() == ref.cells_as_dicts(), html
        assert fast.n_tables == ref.n_tables, html


def test_parity_on_generated_corpus():
    pages, _ = generate_pages(n_docs=150, seed=31)
    for p in pages:
        fast = extract_html(p["html"])
        ref = _extract_stdlib(p["html"])
        assert fast.text == ref.text, p["url"]
        assert fast.cells_as_dicts() == ref.cells_as_dicts(), p["url"]


def test_parity_fuzz_truncation_free():
    # Property: on any input that does not END mid-tag, the regex
    # tokenizer and the stdlib-driven twin produce identical
    # extractions. (EOF-truncated tags are a PINNED deviation — the
    # kernel drops the fragment, stdlib flushes it as data — so the
    # property is scoped to truncation-free inputs by terminating
    # every sample with a text sentinel.)
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    soup = st.lists(
        st.sampled_from(
            list("ab <>/=\"'&;!-\n") + ["<td>", "</td>", "<tr>", "<table>",
                 "</table>", "<p>", "</p>", "<a href='x'>", "</a>", "&amp;",
                 "&#65;", "<article>", "</article>", "<nav>", "</nav>",
                 "<div>", "</div>", "<br>", "<b>", "</b>", "word ",
                 "rowspan='2'", "<!-- c -->", "<!DOCTYPE html>"]
        ),
        max_size=80,
    ).map(lambda parts: "".join(parts) + " terminal text sentinel")

    @settings(max_examples=300, deadline=None, derandomize=True,
              suppress_health_check=list(HealthCheck))
    @given(soup)
    def chk(html):
        if "<" in html.rsplit(">", 1)[-1]:
            return  # a quote swallowed the sentinel: ends mid-tag, out of scope
        fast = extract_html(html)
        ref = _extract_stdlib(html)
        assert fast.text == ref.text, html
        assert fast.cells_as_dicts() == ref.cells_as_dicts(), html

    chk()
