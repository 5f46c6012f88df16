"""PDF / scanned-page layout segmentation kernel.

The reference rasterizes PDF pages and ships each image to an LLM
(``table_ocr/core.py:158-215`` → ``direct.py:14-79``). Here the page is
a set of positioned text spans ``(x0, y0, x1, y1, text)`` and layout
recovery is deterministic geometry:

1. **Lines**: spans clustered by vertical-center proximity (within 60%
   of the span height), each line sorted by x0.
2. **Blocks**: lines split on vertical gaps > 1.8x the median line
   height (paragraph / region boundaries).
3. **Table regions**: a block is a table iff it has ≥2 lines and ≥2
   x-column bins shared by the majority of its lines — the
   "row/column grid reconstruction from cell bounding geometry" of the
   north star. Column bins quantize span x0 with a tolerance; each
   span becomes a positioned cell (row, col).
4. **Text blocks**: remaining blocks, spans joined in reading order
   (line by line, left to right), pinned-normalized.

``extracted_text`` = text blocks joined with "\\n"; table cells reuse
the same :class:`~table_ocr_spark.kernel.html_extract.Cell` structure
(rowspan/colspan always 1 — span merging needs glyph metrics the fake
format doesn't model).

Real PDF decoding needs PyMuPDF (absent in this container): the span
source is pluggable — ``parse_pdf_payload`` handles the deterministic
``FAKEPDF`` container (JSON span lists) used by tests and the golden
generator, and falls back to fitz when importable. Pure Python, zero
Spark imports (same byte-identity argument as html_extract).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from statistics import median
from typing import List, Optional, Sequence, Tuple

from table_ocr_spark.kernel.html_extract import (
    Cell,
    ExtractionResult,
    _resolve_dittos,
)
from table_ocr_spark.kernel.textops import normalize_text

FAKE_PDF_MAGIC = b"FAKEPDF"

LINE_TOL = 0.6        # vertical-center distance, in units of span height
BLOCK_GAP = 1.8       # gap > BLOCK_GAP * median line height -> new block
COL_TOL = 6.0         # x0 quantization tolerance for column bins
MIN_TABLE_LINES = 2
MIN_TABLE_COLS = 2


@dataclass(frozen=True)
class PageConfig:
    """Config-driven page transforms ahead of segmentation — the
    analogue of the reference's pre-OCR image pipeline
    (``table_ocr/core.py:163,197-205``, ``config.py:29-33``: grayscale
    conversion + ``crop_sides`` trimming page-edge bleed from scanned
    registers). For a span-based page, cropping = dropping spans whose
    center falls outside the kept region; ``grayscale`` has no
    geometric effect on spans and is threaded into the real-PDF render
    call instead (fitz pixmap colorspace), where it halves raster
    bytes.

    ``crop_*`` are fractions of the page extent (0.05 = trim 5% off
    that side), matching the reference's side-crop semantics."""

    crop_left: float = 0.0
    crop_right: float = 0.0
    crop_top: float = 0.0
    crop_bottom: float = 0.0
    grayscale: bool = False


def crop_spans(spans: List["Span"], cfg: PageConfig) -> List["Span"]:
    """Drop spans whose CENTER lies in a cropped margin. Page extent is
    the span bounding box (FAKEPDF pages carry no page rect); an empty
    page or zero crop passes through untouched."""
    if not spans or not (
        cfg.crop_left or cfg.crop_right or cfg.crop_top or cfg.crop_bottom
    ):
        return spans
    x_lo = min(s.x0 for s in spans)
    x_hi = max(s.x1 for s in spans)
    y_lo = min(s.y0 for s in spans)
    y_hi = max(s.y1 for s in spans)
    w = x_hi - x_lo
    h = y_hi - y_lo
    keep_x0 = x_lo + cfg.crop_left * w
    keep_x1 = x_hi - cfg.crop_right * w
    keep_y0 = y_lo + cfg.crop_top * h
    keep_y1 = y_hi - cfg.crop_bottom * h
    return [
        s
        for s in spans
        if keep_x0 <= (s.x0 + s.x1) / 2.0 <= keep_x1
        and keep_y0 <= s.yc <= keep_y1
    ]


@dataclass
class Span:
    x0: float
    y0: float
    x1: float
    y1: float
    text: str

    @property
    def yc(self) -> float:
        return (self.y0 + self.y1) / 2.0

    @property
    def h(self) -> float:
        return self.y1 - self.y0


def encode_fake_pdf(pages: Sequence[Sequence[dict]]) -> bytes:
    """Deterministic stand-in container: FAKEPDF + JSON page/span list.
    (The golden generator and tests build documents with it; swapping
    in fitz changes only ``parse_pdf_payload``, never the geometry.)"""
    return FAKE_PDF_MAGIC + json.dumps(
        [{"spans": list(p)} for p in pages], sort_keys=True
    ).encode("utf-8")


def parse_pdf_payload(payload: bytes) -> List[List[Span]]:
    """payload -> per-page span lists. FAKEPDF fast path; real PDFs via
    PyMuPDF when available; otherwise NotImplementedError (stub gate,
    like the multimodal decoders)."""
    if payload.startswith(FAKE_PDF_MAGIC):
        try:
            doc = json.loads(payload[len(FAKE_PDF_MAGIC):].decode("utf-8"))
            out: List[List[Span]] = []
            for p in doc:
                spans: List[Span] = []
                for s in p["spans"]:
                    text = s["text"]
                    if not isinstance(text, str):
                        raise ValueError("span text must be a string")
                    spans.append(
                        Span(
                            float(s["x0"]),
                            float(s["y0"]),
                            float(s["x1"]),
                            float(s["y1"]),
                            text,
                        )
                    )
                out.append(spans)
            return out
        except (TypeError, KeyError, AttributeError) as e:
            # shape-corrupt containers (dict top-level, string coords,
            # non-dict spans) must raise the DEGRADABLE error class —
            # a raw TypeError here escaped extract's degrade catch and
            # one poison document failed the whole stage
            raise ValueError(f"malformed FAKEPDF container: {e!r}") from e
    # real branch: covered by tests/test_real_codecs.py wherever PyMuPDF
    # is installed (pytest.importorskip); absent in this container
    try:
        import fitz

        out: List[List[Span]] = []
        with fitz.open(stream=bytes(payload), filetype="pdf") as doc:
            for page in doc:
                spans: List[Span] = []
                for block in page.get_text("dict")["blocks"]:
                    for line in block.get("lines", []):
                        for s in line.get("spans", []):
                            x0, y0, x1, y1 = s["bbox"]
                            spans.append(Span(x0, y0, x1, y1, s["text"]))
                out.append(spans)
        return out
    except ImportError as e:
        raise NotImplementedError(
            "real PDF decode requires PyMuPDF (not in this container); "
            "use FAKEPDF payloads"
        ) from e


def _cluster_lines(spans: List[Span]) -> List[List[Span]]:
    lines: List[List[Span]] = []
    for s in sorted(spans, key=lambda s: (s.yc, s.x0)):
        if lines:
            cur = lines[-1]
            ref = cur[0]
            tol = LINE_TOL * max(ref.h, s.h, 1e-9)
            if abs(s.yc - ref.yc) <= tol:
                cur.append(s)
                continue
        lines.append([s])
    for line in lines:
        line.sort(key=lambda s: s.x0)
    return lines


def _split_blocks(lines: List[List[Span]]) -> List[List[List[Span]]]:
    if not lines:
        return []
    heights = [max(s.h for s in line) for line in lines]
    med_h = median(heights) or 1.0
    blocks: List[List[List[Span]]] = [[lines[0]]]
    for prev, cur in zip(lines, lines[1:]):
        gap = min(s.y0 for s in cur) - max(s.y1 for s in prev)
        if gap > BLOCK_GAP * med_h:
            blocks.append([cur])
        else:
            blocks[-1].append(cur)
    return blocks


MAX_COL_BINS = 256  # no real table grid has more columns


def _column_bins(block: List[List[Span]]) -> List[float]:
    """Quantized x0 bins shared across the block's lines. The bin scan
    is O(spans × bins); ``MAX_COL_BINS`` bounds it — an untrusted
    payload with thousands of distinct x0 values in one block is not a
    grid, and an unbounded scan there was a quadratic one-core hang
    (the same footprint-budget class html_extract's MAX_GRID_CELLS
    caps)."""
    bins: List[Tuple[float, int]] = []  # (representative x, hits)
    for line in block:
        for s in line:
            for i, (bx, n) in enumerate(bins):
                if abs(s.x0 - bx) <= COL_TOL:
                    bins[i] = (bx, n + 1)
                    break
            else:
                if len(bins) >= MAX_COL_BINS:
                    # un-grid-like block: treat as flowing text
                    return []
                bins.append((s.x0, 1))
    # a column bin must recur on most lines (>= half, min 2)
    need = max(2, (len(block) + 1) // 2)
    cols = sorted(bx for bx, n in bins if n >= need)
    return cols


MIN_BIN_COVERAGE = 0.8
MIN_GUTTER = 1.5  # min median inter-span gap, in units of median span height


def _is_table(block: List[List[Span]], cols: List[float]) -> bool:
    if len(block) < MIN_TABLE_LINES or len(cols) < MIN_TABLE_COLS:
        return False
    # majority of lines must have >= 2 spans (a paragraph wraps as one)
    multi = sum(1 for line in block if len(line) >= 2)
    if multi * 2 < len(block):
        return False
    # grid coverage: nearly all spans must sit ON a recurring column
    # bin. Flowing text aligns only at the left margin (ragged right),
    # so its coverage stays low even when a few x positions coincide.
    spans = [s for line in block for s in line]
    on_bin = sum(
        1 for s in spans if any(abs(s.x0 - c) <= COL_TOL for c in cols)
    )
    if on_bin < MIN_BIN_COVERAGE * len(spans):
        return False
    # gutter width: column gutters are wide (>= ~1em), word gaps are
    # narrow (~0.25em). Quantized span widths can make flowing text
    # accidentally bin-aligned; the gap statistic separates the cases.
    gaps = [
        b.x0 - a.x1
        for line in block
        for a, b in zip(line, line[1:])
    ]
    if not gaps:
        return False
    med_h = median([s.h for s in spans]) or 1.0
    return median(gaps) >= MIN_GUTTER * med_h


def _nearest_col(cols: List[float], x0: float) -> int:
    best, bd = 0, float("inf")
    for i, c in enumerate(cols):
        d = abs(x0 - c)
        if d < bd:
            best, bd = i, d
    return best


def segment_page(spans: List[Span], table_id_base: int = 0):
    """-> (text_blocks: List[str], cells: List[Cell], n_tables)."""
    texts: List[str] = []
    cells: List[Cell] = []
    tid = table_id_base
    for block in _split_blocks(_cluster_lines(spans)):
        cols = _column_bins(block)
        if _is_table(block, cols):
            for r, line in enumerate(block):
                for s in line:
                    cells.append(
                        Cell(tid, r, _nearest_col(cols, s.x0), 1, 1,
                             normalize_text(s.text))
                    )
            tid += 1
        else:
            block_text = normalize_text(
                " ".join(s.text for line in block for s in line)
            )
            if block_text:
                texts.append(block_text)
    return texts, cells, tid - table_id_base


def extract_pdf(
    payload: bytes, config: Optional[PageConfig] = None
) -> ExtractionResult:
    """Whole-document extraction: pages concatenated in order, table
    ids global across pages (mirrors ``extract_html``'s contract).
    ``config`` applies the reference's pre-segmentation page transforms
    (side crops; ``grayscale`` is raster-only and takes effect where
    pages are rendered, not on the span geometry)."""
    texts: List[str] = []
    cells: List[Cell] = []
    n_tables = 0
    for spans in parse_pdf_payload(bytes(payload)):
        if config is not None:
            spans = crop_spans(spans, config)
        t, c, n = segment_page(spans, table_id_base=n_tables)
        texts.extend(t)
        cells.extend(c)
        n_tables += n
    # ditto marks are the scanned-register phenomenology (reference
    # config.py:50) — they arrive through THIS modality above all, so
    # the PDF path resolves them exactly like extract_html does
    _resolve_dittos(cells)
    return ExtractionResult(text="\n".join(texts), cells=cells, n_tables=n_tables)
