"""Derive a deterministic Common-Crawl-style pages table from the
driver's ``documents.parquet`` — pure SQL-expressible construction, so
the extraction pipeline can run against driver-provided data with an
EXACT DuckDB oracle (the wrap is invertible by design).

Each document becomes one HTML page containing:
- ``<nav>`` boilerplate + a link-farm ``<div>`` + a short noise block
  (all of which the kernel must DROP),
- ``<article><p>{text}</p></article>`` (the kernel must return exactly
  ``text`` — documents.text is verified pre-normalized, so
  ``normalize_text`` is the identity on it),
- a 1-column sliver "page-bleed" table (must be SKIPPED),
- one real 4x2 key/value table with a ditto mark on doc_id % 5 == 0
  (cells recoverable in closed form — the oracle reconstructs them).

The reference analogue is the fixture/golden-file strategy
(``ui/ocr_data/results/...`` golden JSONs); here the golden is
construction itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# doc_id % 5 == 0 -> the "source" row carries a ditto mark that must
# resolve to the lang value above it (kernel ditto semantics).
DITTO_MOD = 5

_PRE = (
    "<!DOCTYPE html><html><head><title>d</title></head><body>"
    '<nav><a href="/a">section one</a> | <a href="/b">section two</a></nav>'
    '<div><a href="/x">related</a> <a href="/y">links</a> <a href="/z">farm</a></div>'
    "<div>tiny note</div>"
    "<article><p>"
)
_MID = (
    "</p></article>"
    "<table><tr><td>s1</td></tr><tr><td>s2</td></tr></table>"  # sliver: skipped
    "<table><tr><th>k</th><th>v</th></tr>"
    "<tr><td>lang</td><td>"
)
_MID2 = "</td></tr><tr><td>source</td><td>"
_MID3 = "</td></tr><tr><td>chars</td><td>"
_POST = "</td></tr></table></body></html>"


def documents_as_pages(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages
    (url, warc_ts, html:binary, text, lang). Pure column expressions;
    the html construction never leaves the JVM."""
    source_cell = F.when(
        F.col("doc_id") % DITTO_MOD == 0, F.lit("&quot;")
    ).otherwise(F.col("source"))
    html_str = F.concat(
        F.lit(_PRE),
        F.col("text"),
        F.lit(_MID),
        F.col("lang"),
        F.lit(_MID2),
        source_cell,
        F.lit(_MID3),
        F.col("n_chars").cast("string"),
        F.lit(_POST),
    )
    return docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        html_str.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def expected_source_cell(docs: DataFrame) -> DataFrame:
    """Closed-form expected ditto-resolved 'source' cell text."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % DITTO_MOD == 0, F.col("lang"))
        .otherwise(F.col("source"))
        .alias("source_cell"),
    )


def doc_id_from_url(url_col) -> F.Column:
    return F.regexp_extract(url_col, r"^doc:(\d+)$", 1).cast("long")


# multi-page documents: page body closes the article immediately (no
# tables on inner pages — the table fixture lives in the single-page
# wrap above)
_PAGE_POST = "</p></article></body></html>"

MULTIPAGE_MOD = 4  # doc i has 1 + (i % MULTIPAGE_MOD) pages


def documents_as_multipage(docs: DataFrame) -> DataFrame:
    """documents -> one row per (url, page): doc ``i`` has
    ``1 + (i % MULTIPAGE_MOD)`` pages numbered from 0, each a full HTML
    page whose article body is ``"p{page} {text}"`` (closed form, so
    extraction has an exact oracle). This is the reference's actual
    document shape — N rasterized pages per PDF, sliced by
    ``start_page..max_pages`` (``table_ocr/core.py:187-192``) — which
    the single-page wrap above doesn't model.

    Page explosion is ``explode(sequence(...))`` — pure JVM, and the
    heavy html string is only constructed for rows that SURVIVE any
    later page filter (Catalyst computes projections after filters), so
    slicing pages before extraction costs nothing per skipped page.
    """
    paged = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("doc_id") % MULTIPAGE_MOD)
        ).alias("page"),
    )
    html_str = F.concat(
        F.lit(_PRE),
        F.lit("p"),
        F.col("page").cast("string"),
        F.lit(" "),
        F.col("text"),
        F.lit(_PAGE_POST),
    )
    return paged.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("url"),
        F.col("page"),
        html_str.cast("binary").alias("html"),
    )


def page_range_slice(pages: DataFrame, start_page: int, end_page: int) -> DataFrame:
    """The reference's page-range predicate (``core.py:187-192``:
    ``start_page .. start_page+max_pages``) as a pushable filter —
    apply BEFORE extraction so skipped pages never reach the kernel."""
    return pages.filter(F.col("page").between(start_page, end_page))


def documents_as_fake_pdfs(docs: DataFrame) -> DataFrame:
    """documents -> (url, payload) FAKEPDF pages: the text flowed as
    proportional spans (8 px/char, 6 px word gap, 8 words/line) plus a
    2x2 key/value table in a gap-separated block below. Layout is
    closed-form, so extraction has an exact oracle: extracted_text ==
    text, one table, four cells."""
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.BinaryType())
    def _fake_pdf_udf(text, lang, source):  # type: ignore[no-untyped-def]
        from table_ocr_spark.kernel.layout import encode_fake_pdf

        out = []
        for t, lg, src in zip(text, lang, source):
            spans = []
            x0, y0, lh, per = 20.0, 20.0, 12.0, 8
            cx, line = x0, 0
            words = t.split(" ")
            for i, w in enumerate(words):
                if i and i % per == 0:
                    line += 1
                    cx = x0
                wpx = 8.0 * len(w)
                yy = y0 + line * lh
                spans.append(
                    {"x0": cx, "y0": yy, "x1": cx + wpx, "y1": yy + 10.0, "text": w}
                )
                cx += wpx + 6.0
            ty = y0 + (line + 1) * lh + 60.0
            for r, (k, v) in enumerate((("lang", lg), ("source", src))):
                for c, cell in enumerate((k, v)):
                    sx = 20.0 + c * 150.0
                    spans.append(
                        {"x0": sx, "y0": ty + r * 14.0, "x1": sx + 8.0 * len(cell),
                         "y1": ty + r * 14.0 + 10.0, "text": cell}
                    )
            out.append(encode_fake_pdf([spans]))
        return pd.Series(out)

    return docs.select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("url"),
        _fake_pdf_udf("text", "lang", "source").alias("payload"),
    )
