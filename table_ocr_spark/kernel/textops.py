"""String-level kernel ops: normalization + ports of the reference's
payload parsers.

Reference parity (behavior, not code — see SURVEY.md §2.8):
- ``strip_json_codeblock``  ≙ ``table_ocr/parser.py:7-36``   (F1)
- ``extract_first_json``    ≙ ``table_ocr/batch.py:355-368`` (F2)
- ``parse_request_key``     ≙ ``table_ocr/batch.py:333-353`` (F3)
- ``parse_markdown_table``  ≙ ``table_ocr/parser.py:130-152``(F4)
- ``normalize_text``        — OUR pinned normalization (the reference has
  none; byte-identity demands exactly one definition, SURVEY.md §7.3.1).

Pure Python, stdlib only. No Spark imports.
"""

from __future__ import annotations

import json
import re
import unicodedata
from typing import Any, Dict, List, Optional, Tuple

# --------------------------------------------------------------------------
# Pinned text normalization (SURVEY.md §7.3.1)
# --------------------------------------------------------------------------

# Every Unicode space-ish codepoint we fold to ASCII space. NBSP and the
# typographic spaces appear in real crawls and in our fixtures.
_SPACE_CHARS = (
    "\u00a0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u202f\u205f\u3000"
)
_SPACE_TRANS = {ord(c): " " for c in _SPACE_CHARS}
# Zero-width characters are dropped outright.
_ZW_CHARS = "\u200b\u200c\u200d\ufeff"
for _c in _ZW_CHARS:
    _SPACE_TRANS[ord(_c)] = None

_WS_RUN = re.compile(r"[ \t\r\n\f\v]+")


def normalize_text(s: str) -> str:
    """Pinned normalization: NFC → fold unicode spaces → drop zero-width
    → collapse all whitespace runs to a single ASCII space → strip.

    This is THE single definition of "normalized text" for the whole
    engine; both the golden generator and the Spark UDFs call it.

    ASCII fast path: NFC is the identity on ASCII and every key of the
    fold/drop table is non-ASCII, so skipping both steps is exactly
    equivalent — and this function is the kernel's hottest call (once
    per block and per table cell).
    """
    if not s.isascii():
        s = unicodedata.normalize("NFC", s)
        s = s.translate(_SPACE_TRANS)
    s = _WS_RUN.sub(" ", s)
    return s.strip()


# --------------------------------------------------------------------------
# F1 — markdown fence stripper (table_ocr/parser.py:7-36)
# --------------------------------------------------------------------------

_FENCE_LANG = re.compile(r"^```[A-Za-z0-9_-]*")


def strip_json_codeblock(text: str) -> str:
    """Strip a leading ```` ```json ```` / ```` ``` ```` fence and a
    trailing ```` ``` ```` fence, tolerating the fence-without-newline
    form (reference parser.py:28-30). Returns the stripped payload.
    """
    s = text.strip()
    if s.startswith("```"):
        nl = s.find("\n")
        if nl != -1:
            s = s[nl + 1 :]
        else:
            s = _FENCE_LANG.sub("", s, count=1)
    if s.endswith("```"):
        s = s[: -3]
    return s.strip()


# --------------------------------------------------------------------------
# F2 — first-JSON-object recovery (table_ocr/batch.py:355-368)
# --------------------------------------------------------------------------

_JSON_OBJ = re.compile(r"\{.*\}", re.DOTALL)


def extract_first_json(text: str) -> Tuple[Optional[Dict[str, Any]], str]:
    """Find the first ``{...}`` span (greedy, DOTALL) and ``json.loads``
    it. Returns ``(parsed_or_None, raw_text_fallback)`` — mirroring the
    reference's fallback-to-raw-text behavior (batch.py:364-368).
    """
    m = _JSON_OBJ.search(text)
    if m:
        try:
            obj = json.loads(m.group(0))
            if isinstance(obj, dict):
                return obj, text
        except (ValueError, TypeError):
            pass
    return None, text


# --------------------------------------------------------------------------
# F3 — composite request-key parser (table_ocr/batch.py:333-353)
# --------------------------------------------------------------------------

_KEY_RE = re.compile(r"^(.*)_page_(\d+)_sample_(\d+)$")


def parse_request_key(key: str) -> Optional[Tuple[str, int, int]]:
    """Parse ``"{doc}_page_{p}_sample_{s}"`` → ``(doc, page, sample)``.

    Underscores inside the doc name are preserved (the anchored regex
    matches the LAST ``_page_..._sample_...`` suffix, like the
    reference's marker-split). Malformed keys → ``None`` (skip path,
    batch.py:341-343).
    """
    m = _KEY_RE.match(key)
    if not m:
        return None
    return m.group(1), int(m.group(2)), int(m.group(3))


# --------------------------------------------------------------------------
# F4 — markdown table parser (table_ocr/parser.py:130-152)
# --------------------------------------------------------------------------

_SEP_ROW = re.compile(r"^\|[\s\-:|]+\|?\s*$")
_CELL_SPLIT = re.compile(r"\s*\|\s*")


def parse_markdown_table(text: str) -> List[Dict[str, str]]:
    """Parse a markdown table: keep ``|``-prefixed lines (P6), drop the
    ``|---|`` separator row, split on ``\\s*\\|\\s*``, first row =
    header. Rows shorter than the header are padded with ``""``; longer
    rows are truncated (permissive, like the reference's strict=False
    coercion).
    """
    rows: List[List[str]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("|"):
            continue
        if _SEP_ROW.match(line):
            continue
        # strip ONE delimiter pipe per side: strip("|") removes ALL
        # of them, deleting a genuinely empty first/last cell (`||x|`)
        # and shifting every value under the wrong header
        inner = line[1:]
        if inner.endswith("|"):
            inner = inner[:-1]
        cells = [c.strip() for c in _CELL_SPLIT.split(inner)]
        rows.append(cells)
    if not rows:
        return []
    header = rows[0]
    out: List[Dict[str, str]] = []
    for cells in rows[1:]:
        rec = {}
        for i, h in enumerate(header):
            rec[h] = cells[i] if i < len(cells) else ""
        out.append(rec)
    return out
