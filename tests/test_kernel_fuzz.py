"""Property-based kernel robustness (hypothesis): the extraction
kernels must never crash on arbitrary input, must be deterministic,
and the pinned normalization must be idempotent — the properties that
make a 10^12-document run survivable (one poison document must not
kill a 4-hour stage)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from table_ocr_spark.kernel.html_extract import extract_html
from table_ocr_spark.kernel.layout import Span, segment_page
from table_ocr_spark.kernel.textops import normalize_text

# text including the whitespace/zero-width traps the normalizer pins
_weird_text = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Z", "C"), include_characters=" ​　\n\t"
    ),
    max_size=400,
)

_html_soup = st.lists(
    st.sampled_from(
        list("abc <>/=\"'&;!-\n\t") + ["<td", "<tr>", "<table", "</table>",
             "<p>", "</p>", "<a href=", "&amp;", "&#65;", "<!--", "-->",
             "<script>", "</script>", "rowspan=", "colspan=", '"2"']
    ),
    max_size=120,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(_weird_text)
def test_normalize_idempotent_and_single_spaced(s):
    once = normalize_text(s)
    assert normalize_text(once) == once
    assert "  " not in once
    assert once == once.strip()


@settings(max_examples=200, deadline=None)
@given(_html_soup)
def test_extract_html_never_crashes_and_is_deterministic(soup):
    r1 = extract_html(soup)
    r2 = extract_html(soup)
    assert r1.text == r2.text
    assert r1.cells_as_dicts() == r2.cells_as_dicts()
    assert r1.n_tables == r2.n_tables
    # grid invariants: non-negative positions, spans clamped
    for c in r1.cells:
        assert c.row >= 0 and c.col >= 0
        assert 1 <= c.rowspan <= 1000 and 1 <= c.colspan <= 1000


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=300))
def test_extract_html_accepts_arbitrary_bytes(b):
    r = extract_html(b)  # must decode with errors=replace, not raise
    assert isinstance(r.text, str)


_span = st.builds(
    Span,
    x0=st.floats(0, 500, allow_nan=False),
    y0=st.floats(0, 800, allow_nan=False),
    x1=st.floats(0, 520, allow_nan=False),
    y1=st.floats(0, 820, allow_nan=False),
    text=st.text(max_size=12),
)


@settings(max_examples=100, deadline=None)
@given(st.lists(_span, max_size=40))
def test_segment_page_never_crashes(spans):
    texts, cells, n_tables = segment_page(spans)
    assert n_tables >= 0
    for c in cells:
        assert c.row >= 0 and c.col >= 0
