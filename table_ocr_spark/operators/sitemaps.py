"""Sitemap XML parsing — the crawl-frontier seed source robots.txt
points at (``robots.robots_sitemaps`` harvests the pointers; this
module parses the documents behind them).

The reference ingests user uploads only (``table_ocr/core.py``); its
crawl-fed production analogue (BASELINE.json north rule) seeds the
frontier from sitemaps.org documents: ``<urlset>`` files carrying
``<url><loc>…</loc><lastmod>…</lastmod></url>`` entries and
``<sitemapindex>`` files nesting further sitemaps under
``<sitemap><loc>…</loc></sitemap>``.

Pinned parse subset (each deliberate, shared with the DuckDB oracle):

- Element scan is a non-greedy regex over ``<url>…</url>`` /
  ``<sitemap>…</sitemap>`` blocks — NO backreferences (DuckDB's RE2
  has none) and dotall via ``(?s)``, so one pattern works in Java
  regex and RE2 identically (the webfilter portability pin).
- ``<loc>`` / ``<lastmod>`` are taken from inside the block,
  whitespace-trimmed. A block with no ``<loc>`` is dropped; a missing
  ``<lastmod>`` is NULL.
- The five XML named entities (``&amp; &lt; &gt; &quot; &apos;``) are
  decoded in ``loc`` — the sitemaps spec REQUIRES entity-escaped urls,
  so ``&amp;`` appears in practically every query-string url. Numeric
  character references and CDATA are out of the pinned subset
  (documented; both are rare in real sitemaps and a fetcher can
  re-canonicalize).
- Namespaces/attributes on the scanned elements are tolerated by
  matching the bare tag names only (sitemaps in the wild carry the
  default xmlns on the ROOT element, not on ``url``/``loc``).

Scale shape (100-TB argument): map-only — one ``regexp_extract_all``
+ ``explode`` + per-block ``regexp_extract`` per sitemap body, all
inside JVM codegen; no Python, no shuffle. A sitemap is ≤50k urls /
50 MB by spec, so the explode fan-out per row is bounded by the
format itself. Frontier assembly downstream is
``parse_sitemaps → (robots) filter_robots_allowed → plan_fetches``
(``operators/frontier.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BLOCK_RX = r"(?s)(<url>.*?</url>|<sitemap>.*?</sitemap>)"
_LOC_RX = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RX = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"

# decode order matters: &amp; LAST would re-interpret '&amp;lt;' wrong;
# &amp; FIRST would turn '&amp;lt;' into '&lt;' then '<' (double
# decode). XML burns one level only, so &amp; must be decoded last.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def xml_unescape(col: Column) -> Column:
    """Decode the five XML named entities (single level, ``&amp;``
    last so double-escaped input is not double-decoded)."""
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def parse_sitemaps(
    df: DataFrame,
    key_cols: tuple = ("host",),
    body_col: str = "sitemap_xml",
) -> DataFrame:
    """Sitemap bodies → one row per entry:
    ``(*key_cols, kind, loc, lastmod)`` where ``kind`` is ``url`` for
    urlset entries and ``sitemap`` for nested index entries. Map-only
    (see module doc); rows with an un-parseable/absent ``<loc>`` drop.
    """
    blocks = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(_BLOCK_RX), 1)
    ).alias("_block")
    b = F.col("_block")
    loc_raw = F.regexp_extract(b, _LOC_RX, 1)
    return (
        df.select(*[F.col(c) for c in key_cols], blocks)
        .select(
            *key_cols,
            F.when(b.startswith("<url>"), F.lit("url"))
            .otherwise(F.lit("sitemap"))
            .alias("kind"),
            xml_unescape(loc_raw).alias("loc"),
            F.nullif(
                F.regexp_extract(b, _LASTMOD_RX, 1), F.lit("")
            ).alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )
