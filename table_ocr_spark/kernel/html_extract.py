"""HTML main-content + table-structure extraction kernel.

This replaces the reference's per-page LLM call
(``table_ocr/direct.py:14-79`` — one Gemini request per (page, sample))
with a deterministic parse: stdlib ``html.parser`` streaming parse,
text-density / link-density boilerplate stripping (Boilerpipe /
trafilatura-style heuristics), and table-grid reconstruction with
rowspan/colspan occupancy and ditto-mark resolution (the reference's
document phenomenology: scanned registers with ditto marks and
page-edge bleed, ``table_ocr/config.py:40-51``).

Pure Python, stdlib only, ZERO Spark imports — the identical function
runs standalone (golden generator, pytest) and inside Arrow-batched
UDFs (SURVEY.md §7.0: byte-identical by construction).

Pinned semantics (deviations from the reference are deliberate and
documented; the reference has no deterministic extractor to match):

* Boilerplate containers ``nav/header/footer/aside`` are dropped with
  their whole subtree.
* ``script/style/noscript/template/head/title/svg/iframe`` content is
  ignored.
* A text block is the inline text between block-element boundaries.
  Blocks inside ``<article>``/``<main>`` are always kept; other blocks
  are kept iff normalized length ≥ MIN_BLOCK_CHARS and link density
  (chars inside <a> / total chars) ≤ MAX_LINK_DENSITY.
* ``extracted_text`` = kept blocks, each pinned-normalized
  (``textops.normalize_text``), joined with ``"\\n"``. Table content is
  NOT part of extracted_text — it is returned structurally in
  ``cells``.
* Tables: top-level ``<table>`` elements only (a nested table's text
  flows into its host cell). Grid built with standard rowspan/colspan
  occupancy. Tables with < 2 rows or < 2 columns are page-edge-bleed /
  layout artifacts and are skipped entirely (the analogue of the
  reference's ``crop_sides`` page-bleed cropping,
  ``table_ocr/core.py:197-205``).
* Ditto marks (``"``, ``″``, ``''``, ``-"-`` — config.py:50) in a cell
  resolve to the nearest non-ditto cell text above in the same column
  of the same table.
* Truncated documents (crawl HTML is frequently cut mid-tag): a
  trailing fragment that ends inside a tag is DROPPED entirely —
  browser-like eof-in-tag handling — never flushed into the text (a
  trailing ``<td`` must not mint a phantom cell). An unterminated
  quoted attribute value is recovered at the next ``>`` (the tag is
  kept, the value truncated) when a ``>`` exists, else the whole
  fragment falls under the drop rule.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from typing import Dict, List, Optional, Tuple

from table_ocr_spark.kernel.textops import normalize_text

# -- pinned heuristics ------------------------------------------------------
MIN_BLOCK_CHARS = 40       # non-article blocks shorter than this are noise
MAX_LINK_DENSITY = 0.35    # non-article blocks more linky than this are nav
MIN_TABLE_ROWS = 2         # below → page-bleed artifact
MIN_TABLE_COLS = 2
MAX_SPAN = 1000            # defensive cap on rowspan/colspan
MAX_GRID_CELLS = 2_000_000  # occupancy footprint budget per table
                            # (beyond it cells place as 1x1)

DITTO_MARKS = {'"', "″", "''", '-"-', "〃"}

_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "title", "svg", "iframe"}
)
_BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside"})
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
        "article", "section", "main", "blockquote", "pre", "body", "html",
        "figure", "figcaption", "dl", "dt", "dd", "form", "fieldset",
        "address", "hr",
    }
)
_VOID_TAGS = frozenset(
    {"br", "img", "hr", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


@dataclass
class Cell:
    table_id: int
    row: int
    col: int
    rowspan: int
    colspan: int
    text: str

    def as_dict(self) -> Dict:
        return {
            "table_id": self.table_id,
            "row": self.row,
            "col": self.col,
            "rowspan": self.rowspan,
            "colspan": self.colspan,
            "text": self.text,
        }


@dataclass
class ExtractionResult:
    text: str
    cells: List[Cell] = field(default_factory=list)
    n_tables: int = 0

    def cells_as_dicts(self) -> List[Dict]:
        return [c.as_dict() for c in self.cells]


class _RawCell:
    __slots__ = ("rowspan", "colspan", "parts")

    def __init__(self, rowspan: int, colspan: int):
        self.rowspan = rowspan
        self.colspan = colspan
        self.parts: List[str] = []


class _TableCtx:
    __slots__ = ("rows", "cur_row", "cur_cell", "nested")

    def __init__(self):
        self.rows: List[List[_RawCell]] = []
        self.cur_row: Optional[List[_RawCell]] = None
        self.cur_cell: Optional[_RawCell] = None
        self.nested = 0


# the lookbehind is the attribute-NAME boundary: without it,
# aria-colspan="2" / data-rowspan="5" (standard ARIA grid markup and
# common JS table libraries) parse as real spans and shift every
# subsequent cell in the grid
_SPAN_ATTR_RE = re.compile(
    r"(?<![\w-])(rowspan|colspan)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>/]*)",
    re.IGNORECASE,
)


def _parse_spans(attrs: str) -> Tuple[int, int]:
    """Extract (rowspan, colspan) from a raw attribute string; missing
    or non-integer values default to 1, clamped to [1, MAX_SPAN].
    Parsed lazily — only td/th tags ever pay this cost."""
    rs = cs = 1
    # lowercase before the cheap substring gate: HTML attribute names
    # are case-insensitive (rowSPan=3 is valid) and the regex itself is
    # IGNORECASE — a case-sensitive gate silently dropped mixed-case
    # spans and misplaced every cell below them
    if attrs and "span" in attrs.lower():
        for m in _SPAN_ATTR_RE.finditer(attrs):
            v = m.group(2)
            if v[:1] in "\"'":
                v = v[1:-1]
            if "&" in v:
                v = unescape(v)
            try:
                n = int(v.strip())
            except ValueError:
                continue
            n = max(1, min(n, MAX_SPAN))
            if m.group(1).lower() == "rowspan":
                rs = n
            else:
                cs = n
    return rs, cs


class _Extractor:
    """Streaming block/table accumulator. Single pass, O(doc). Driven
    by the regex tokenizer in :func:`_feed` (same event protocol as
    ``html.parser.HTMLParser`` with ``convert_charrefs=True``, but ~3x
    faster and far lighter on small-object allocation — the kernel is
    memory-bandwidth-bound at high core counts, so allocation churn
    directly costs scaling efficiency, not just absolute speed)."""

    def __init__(self):
        self.skip_depth = 0          # inside script/style/... subtree
        self.boiler_depth = 0        # inside nav/header/footer/aside
        self.article_depth = 0       # inside article/main
        self.link_depth = 0          # inside <a>
        self.blocks: List[Tuple[str, int, int, bool]] = []
        # (raw_text, total_chars, link_chars, in_article)
        self._buf: List[str] = []
        self._buf_total = 0
        self._buf_link = 0
        self._buf_article = False
        self.tables: List[_TableCtx] = []   # finished top-level tables
        self._tstack: List[_TableCtx] = []  # open table contexts

    # -- block buffer -------------------------------------------------------
    def _flush(self):
        if self._buf_total:
            self.blocks.append(
                ("".join(self._buf), self._buf_total, self._buf_link,
                 self._buf_article)
            )
        self._buf = []
        self._buf_total = 0
        self._buf_link = 0
        self._buf_article = self.article_depth > 0

    def _emit_text(self, data: str):
        if not data:
            return
        t = self._tstack[-1] if self._tstack else None
        if t is not None:
            if t.cur_cell is not None:
                t.cur_cell.parts.append(data)
            return  # text between cells (or in caption) is dropped
        if not self._buf:
            self._buf_article = self.article_depth > 0
        self._buf.append(data)
        self._buf_total += len(data)
        if self.link_depth > 0:
            self._buf_link += len(data)

    # -- parser callbacks ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag in ("br", "hr") and self.skip_depth == 0 and self.boiler_depth == 0:
                self._emit_text(" " if tag == "br" else "")
                if tag == "hr":
                    self._flush()
            return
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag in _BOILERPLATE_TAGS:
            self.boiler_depth += 1
            return
        if self.boiler_depth:
            return
        if tag == "table":
            if self._tstack:
                self._tstack[-1].nested += 1
            else:
                self._flush()
                self._tstack.append(_TableCtx())
            return
        if self._tstack:
            t = self._tstack[-1]
            if t.nested:
                return  # inside a nested table: everything flows to host cell
            if tag == "tr":
                t.cur_row = []
                t.rows.append(t.cur_row)
                t.cur_cell = None
            elif tag in ("td", "th"):
                if t.cur_row is None:
                    t.cur_row = []
                    t.rows.append(t.cur_row)
                rs, cs = _parse_spans(attrs)
                t.cur_cell = _RawCell(rs, cs)
                t.cur_row.append(t.cur_cell)
            elif tag in _BLOCK_TAGS and t.cur_cell is not None:
                # block boundary INSIDE a cell separates words — cell
                # text is whitespace-normalized at grid build, so a
                # space is exact ('<td><p>alpha</p><p>beta</p></td>'
                # must not read 'alphabeta')
                t.cur_cell.parts.append(" ")
            return
        if tag == "a":
            self.link_depth += 1
        if tag in ("article", "main"):
            self._flush()
            self.article_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self.skip_depth:
                self.skip_depth -= 1
            return
        if self.skip_depth:
            return
        if tag in _BOILERPLATE_TAGS:
            if self.boiler_depth:
                self.boiler_depth -= 1
            return
        if self.boiler_depth:
            return
        if tag == "table":
            if self._tstack:
                t = self._tstack[-1]
                if t.nested:
                    t.nested -= 1
                else:
                    self._tstack.pop()
                    self.tables.append(t)
            return
        if self._tstack:
            t = self._tstack[-1]
            if t.nested:
                return
            if tag in ("td", "th"):
                t.cur_cell = None
            elif tag == "tr":
                t.cur_row = None
                t.cur_cell = None
            elif tag in _BLOCK_TAGS and t.cur_cell is not None:
                t.cur_cell.parts.append(" ")  # see starttag twin
            return
        if tag == "a":
            if self.link_depth:
                self.link_depth -= 1
            return
        if tag in ("article", "main"):
            self._flush()
            if self.article_depth:
                self.article_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self.skip_depth or self.boiler_depth:
            return
        self._emit_text(data)

    def close(self):
        self._flush()
        # unclosed tables at EOF still count
        while self._tstack:
            self.tables.append(self._tstack.pop())


# -- fast tokenizer ----------------------------------------------------------
#
# One scanning regex over the whole document replaces
# html.parser.HTMLParser (whose updatepos/parse_starttag bookkeeping is
# ~85% of kernel time and allocation). Event protocol and semantics
# match HTMLParser(convert_charrefs=True): charrefs decoded in data
# (not inside script/style raw text), tag names lowercased, stray '<'
# left as text, self-closing tags delivered as start+end (stdlib
# handle_startendtag's default) — delivering the start event ONLY was
# a round-5 bug: '<script/>' / '<header/>' / '<a/>' permanently leaked
# skip/boiler/link depth and silently emptied the rest of the page.

# Attrs scanning is LINEAR by construction: the three alternatives are
# disjoint on their first character ('"', "'", or neither), so every
# position has exactly one parse and the engine never explores an
# exponential backtrack tree (the old `[^>]` alternative also matched
# quote chars — 20 unbalanced quote pairs in a truncated tag took >10 s;
# crawl HTML is untrusted and frequently cut mid-tag, so that was a
# one-page executor-core hang). An unbalanced trailing quote falls into
# the `["'][^>]*` tail (consume to the tag close), and `(?:>|$)` treats
# EOF as the close so a doc truncated mid-tag can't trigger the O(n^2)
# fail-and-pop cascade either.
_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:-->|$)"                      # comment
    r"|!\[CDATA\[.*?(?:\]\]>|$)"            # CDATA (treated as markup noise)
    r"|![^>]*>?"                            # doctype / declaration
    r"|\?[^>]*>?"                           # processing instruction
    r"|/\s*(?P<ctag>[a-zA-Z][^\s>]*)[^>]*(?:>|$)"  # end tag
    r"|(?P<tag>[a-zA-Z][^\t\n\r\f />]*)"           # start tag name
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>\"'])*(?:[\"'][^>]*)?)(?:>|$)"
    r")",
    re.DOTALL,
)
_RAWTEXT_TAGS = ("script", "style")  # HTMLParser CDATA_CONTENT_ELEMENTS
_RAWTEXT_END = {
    t: re.compile(r"</\s*%s" % t, re.IGNORECASE) for t in _RAWTEXT_TAGS
}


def _is_self_closing(attrs: str) -> bool:
    """stdlib-faithful self-closing test on the raw attrs blob: the
    '/' must sit IMMEDIATELY before the tag close ('/ >' is stdlib's
    data-not-a-tag error path, unchanged here) and must not be the
    tail of an unquoted attribute value (stdlib's attr scan consumes
    '<a href=http://x/>'s slash into the value — that is a plain
    start tag)."""
    return attrs.endswith("/") and (
        len(attrs) == 1 or attrs[-2] in " \t\n\r\f\"'"
    )


def _feed(html: str, ex: _Extractor) -> None:
    pos = 0
    n = len(html)
    find = _TAG_RE.search
    ends_gt = html.endswith(">")
    while pos < n:
        m = find(html, pos)
        if m is None:
            data = html[pos:]
            if data:
                ex.handle_data(unescape(data) if "&" in data else data)
            break
        start = m.start()
        if start > pos:
            data = html[pos:start]
            ex.handle_data(unescape(data) if "&" in data else data)
        pos = m.end()
        if pos == n and not ends_gt:
            # document truncated mid-tag: the fragment is DROPPED, no
            # event (pinned eof-in-tag semantics, browser-like — a
            # trailing "<td" must not mint a phantom cell and markup
            # junk must not leak into extracted text; the stdlib
            # parser would flush it as data instead)
            break
        tag = m.group("tag")
        if tag is not None:
            tag = tag.lower()
            attrs = m.group("attrs")
            ex.handle_starttag(tag, attrs)
            selfclose = _is_self_closing(attrs)
            # raw-text elements: content is opaque until the real close
            if tag in _RAWTEXT_TAGS and not selfclose:
                em = _RAWTEXT_END[tag].search(html, pos)
                if em is None:
                    ex.handle_data(html[pos:])
                    pos = n
                else:
                    ex.handle_data(html[pos : em.start()])
                    gt = html.find(">", em.end())
                    pos = n if gt == -1 else gt + 1
                    ex.handle_endtag(tag)
            elif selfclose and tag not in _VOID_TAGS:
                # start+end, stdlib handle_startendtag semantics —
                # start-only leaked skip/boiler/link/table depth and
                # emptied the rest of the page (void tags' start
                # handler never touches depth, so no end needed)
                ex.handle_endtag(tag)
            continue
        ctag = m.group("ctag")
        if ctag is not None:
            ex.handle_endtag(ctag.lower())
        # comments / doctype / PI: no event


def _build_grid(table_id: int, rows: List[List[_RawCell]]) -> Tuple[List[Cell], int, int]:
    """Rowspan/colspan occupancy placement → positioned cells.

    Standard HTML table algorithm: each cell is placed at the first
    unoccupied column of its row; its span footprint blocks cells below.
    Spanless tables (the overwhelmingly common case) take a sequential
    fast path with no occupancy set — identical placement by
    construction, since nothing ever blocks a lower row.
    """
    cells: List[Cell] = []
    max_col = -1
    if all(
        raw.rowspan == 1 and raw.colspan == 1 for row in rows for raw in row
    ):
        for r, row in enumerate(rows):
            for c, raw in enumerate(row):
                cells.append(
                    Cell(table_id, r, c, 1, 1, normalize_text("".join(raw.parts)))
                )
            if row and len(row) - 1 > max_col:
                max_col = len(row) - 1
        return cells, len(rows), max_col + 1

    # Occupancy work is BUDGETED: the standard algorithm's footprint is
    # O(sum of rowspan*colspan) and untrusted crawl HTML can declare a
    # 1000-cell table of 1000x1000 spans (~10^9 set inserts — a one-page
    # executor-core hang, the same failure class as the old regex
    # backtracking). Rowspan is first clamped to the remaining rows
    # (browser behavior); once the footprint budget is exhausted,
    # remaining cells degrade deterministically to 1x1 placement.
    occupied = set()
    budget = MAX_GRID_CELLS
    n_rows = len(rows)
    for r, row in enumerate(rows):
        c = 0
        for raw in row:
            while (r, c) in occupied:
                c += 1
            text = normalize_text("".join(raw.parts))
            rs = min(raw.rowspan, n_rows - r)
            cs = raw.colspan
            if rs * cs > budget:
                rs = cs = 1
            budget -= rs * cs
            cells.append(Cell(table_id, r, c, rs, cs, text))
            for dr in range(rs):
                for dc in range(cs):
                    occupied.add((r + dr, c + dc))
            end = c + cs - 1
            if end > max_col:
                max_col = end
            c += cs
    return cells, n_rows, max_col + 1


def _resolve_dittos(cells: List[Cell]) -> None:
    """Replace ditto-mark cells with the nearest non-ditto text above in
    the same (table, col)."""
    last_by_col: Dict[Tuple[int, int], str] = {}
    for cell in sorted(cells, key=lambda x: (x.table_id, x.row, x.col)):
        key = (cell.table_id, cell.col)
        if cell.text in DITTO_MARKS:
            prev = last_by_col.get(key)
            if prev is not None:
                cell.text = prev
        else:
            if cell.text:
                last_by_col[key] = cell.text


def extract_html(html: bytes | str) -> ExtractionResult:
    """Extract main-content text + table cell structures from one HTML
    document. Deterministic; the per-url byte-identity gate is defined
    over this function's ``text`` output."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    try:
        _feed(html, p)
    finally:
        p.close()

    kept: List[str] = []
    for raw, total, link, in_article in p.blocks:
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

    all_cells: List[Cell] = []
    table_id = 0
    for t in p.tables:
        cells, n_rows, n_cols = _build_grid(table_id, t.rows)
        if n_rows < MIN_TABLE_ROWS or n_cols < MIN_TABLE_COLS:
            continue  # page-bleed sliver / layout artifact
        all_cells.extend(cells)
        table_id += 1
    _resolve_dittos(all_cells)

    return ExtractionResult(text="\n".join(kept), cells=all_cells, n_tables=table_id)
