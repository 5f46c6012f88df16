"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md §1).

Schema matches BASELINE.json's input_hint exactly:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Each document's HTML is assembled from blocks with a KNOWN expected
extraction (``text`` column == the golden extracted text; the expected
table cells are returned alongside), so end-to-end tests compare the
Spark pipeline's output against a golden that does NOT come from the
kernel — it comes from construction. This catches kernel bugs and
pipeline corruption alike.

Covers the reference's document phenomenology (scanned registers,
dittos, page-edge bleed — ``table_ocr/config.py:40-51``) plus crawl
encoding traps: entities, umlauts, NBSP, CJK, RTL, mixed newlines.

Pure Python + pyarrow. Seeded; same (seed, n_docs) ⇒ identical bytes.
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import random
from typing import Dict, List, Optional, Tuple

HOSTS = [
    "big-portal.example",  # hot host: ~30% of documents (skew fixture)
    "alpha.example", "beta.example", "gamma.example", "delta.example",
    "epsilon.example", "zeta.example", "eta.example", "theta.example",
    "iota.example", "kappa.example", "lambda.example", "mu.example",
]
HOT_HOST_SHARE = 0.30

LANGS = ["de", "en", "fr", "zh", "ar"]

_WORDS = {
    "de": ["der", "schnelle", "Fuchs", "springt", "über", "müde", "Hünde",
           "Straße", "Zürich", "schön", "größer", "weiß", "Tür", "Übung"],
    "en": ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dogs",
           "table", "scan", "page", "value", "query", "batch"],
    "fr": ["le", "renard", "brun", "rapide", "saute", "pardessus", "chien",
           "paresseux", "déjà", "élève", "garçon", "être", "noël"],
    "zh": ["快速", "棕色", "狐狸", "跳过", "懒惰", "的狗", "表格", "扫描",
           "页面", "数值", "查询", "批次"],
    "ar": ["الثعلب", "البني", "السريع", "يقفز", "فوق", "الكلب", "الكسول",
           "جدول", "مسح", "صفحة", "قيمة"],
}

_TABLE_HEADERS = [
    ["Name", "Ort", "Jahr", "Nr"],
    ["Familienname", "Vornamen", "geb_am", "Fam_Buch_Nr"],
    ["Namen", "Heimath_Stadt", "Heimath_Land", "Studium"],
]

_TRAPS = [
    "A & B",           # written as &amp; in HTML
    "Größe",           # umlaut (NFC)
    "café",            # accent
    "天地玄黄",         # CJK
    "مرحبا بالعالم",   # RTL
    "x y",             # plain
]


def _words(rng: random.Random, lang: str, n: int) -> str:
    pool = _WORDS[lang]
    return " ".join(rng.choice(pool) for _ in range(n))


def _mk_paragraph(rng: random.Random, lang: str) -> str:
    """Golden paragraph text — already in pinned-normalized form
    (single-spaced, no leading/trailing space)."""
    base = _words(rng, lang, rng.randint(8, 25))
    if rng.random() < 0.3:
        base += " " + rng.choice(_TRAPS)
    return base


def _para_html(rng: random.Random, golden: str) -> str:
    """Render a golden paragraph as messy HTML that must normalize back
    to exactly ``golden``: entity-escape, inject NBSP / newlines /
    double spaces at word boundaries."""
    esc = _html.escape(golden)
    words = esc.split(" ")
    seps = []
    for _ in range(len(words) - 1):
        x = rng.random()
        if x < 0.08:
            seps.append("&nbsp;")
        elif x < 0.14:
            seps.append("\n  ")
        elif x < 0.18:
            seps.append("  ")
        else:
            seps.append(" ")
    out = words[0]
    for sep, w in zip(seps, words[1:]):
        out += sep + w
    return out


def _mk_table(
    rng: random.Random, lang: str, table_id: int
) -> Tuple[str, List[Dict]]:
    """Build a <table> and its expected positioned cells."""
    header = rng.choice(_TABLE_HEADERS)
    n_cols = len(header)
    n_rows = rng.randint(2, 5)  # data rows
    expected: List[Dict] = []
    html_rows: List[str] = []

    # header row
    html_rows.append("<tr>" + "".join(f"<th>{h}</th>" for h in header) + "</tr>")
    for c, h in enumerate(header):
        expected.append(
            {"table_id": table_id, "row": 0, "col": c, "rowspan": 1,
             "colspan": 1, "text": h}
        )

    # rowspan state: col -> rows remaining blocked
    blocked = [0] * n_cols
    last_text = [h for h in header]
    for r in range(1, n_rows + 1):
        tds = []
        c = 0
        while c < n_cols:
            if blocked[c] > 0:
                blocked[c] -= 1
                c += 1
                continue
            val = _words(rng, lang, rng.randint(1, 3))
            rowspan, colspan = 1, 1
            # spans only where they fit cleanly
            if rng.random() < 0.12 and r < n_rows:
                rowspan = 2
            elif rng.random() < 0.10 and c + 1 < n_cols and blocked[c + 1] == 0:
                colspan = 2
            use_ditto = rng.random() < 0.12 and last_text[c] and rowspan == 1 and colspan == 1
            empty = rng.random() < 0.06 and not use_ditto
            shown = '"' if use_ditto else ("" if empty else val)
            golden_text = last_text[c] if use_ditto else ("" if empty else val)
            attrs = ""
            if rowspan > 1:
                attrs += f' rowspan="{rowspan}"'
            if colspan > 1:
                attrs += f' colspan="{colspan}"'
            tds.append(f"<td{attrs}>{_html.escape(shown)}</td>")
            expected.append(
                {"table_id": table_id, "row": r, "col": c, "rowspan": rowspan,
                 "colspan": colspan, "text": golden_text}
            )
            if golden_text:
                last_text[c] = golden_text
            if rowspan > 1:
                blocked[c] = rowspan - 1
            c += colspan
        html_rows.append("<tr>" + "".join(tds) + "</tr>")
    return "<table>" + "".join(html_rows) + "</table>", expected


def _boilerplate(rng: random.Random) -> Tuple[str, str, str]:
    nav = (
        "<nav>"
        + " | ".join(f'<a href="/s{i}">sec {i}</a>' for i in range(rng.randint(3, 8)))
        + "</nav>"
    )
    footer = (
        '<footer><a href="/imprint">Imprint</a> <a href="/privacy">Privacy</a>'
        " © 2024 example</footer>"
    )
    sidebar = (
        "<div>"
        + " ".join(
            f'<a href="/t{i}">related link {i}</a>' for i in range(rng.randint(4, 9))
        )
        + "</div>"
    )
    return nav, footer, sidebar


def generate_pages(
    n_docs: int = 200, seed: int = 42, dup_frac: float = 0.05
) -> Tuple[List[Dict], List[Dict]]:
    """Generate the corpus.

    Returns ``(pages, expected_cells)`` where pages rows are
    ``{url, warc_ts, html(bytes), text(golden), lang}`` and
    expected_cells rows are ``{url, cells(list), n_tables}``.

    ``dup_frac`` of urls get a second capture with a later ``warc_ts``
    and IDENTICAL golden extraction (latest-capture dedup fixture,
    SURVEY.md §2.10/W3).
    """
    rng = random.Random(seed)
    base_ts = _dt.datetime(2024, 3, 1, tzinfo=_dt.timezone.utc)
    pages: List[Dict] = []
    goldens: List[Dict] = []

    for i in range(n_docs):
        host = HOSTS[0] if rng.random() < HOT_HOST_SHARE else rng.choice(HOSTS[1:])
        lang = rng.choice(LANGS)
        url = f"https://{host}/{lang}/doc-{i:06d}"
        paras = [_mk_paragraph(rng, lang) for _ in range(rng.randint(1, 4))]
        golden_text = "\n".join(paras)

        n_tables = rng.randint(0, 3)
        tables_html: List[str] = []
        expected_cells: List[Dict] = []
        for t in range(n_tables):
            th, exp = _mk_table(rng, lang, t)
            tables_html.append(th)
            expected_cells.extend(exp)
        # page-bleed decoy: a 1-column sliver table the extractor must skip
        if rng.random() < 0.3:
            sliver = (
                "<table>"
                + "".join(f"<tr><td>{_words(rng, lang, 1)}</td></tr>" for _ in range(3))
                + "</table>"
            )
            tables_html.insert(rng.randrange(len(tables_html) + 1), sliver)

        nav, footer, sidebar = _boilerplate(rng)
        body = [nav, "<article>"]
        for p in paras:
            body.append(f"<p>{_para_html(rng, p)}</p>")
        body.append("</article>")
        for th in tables_html:
            body.append(th)
        body.append(sidebar)
        body.append(footer)
        html_doc = (
            "<!DOCTYPE html><html><head><meta charset='utf-8'>"
            f"<title>doc {i}</title><style>body{{margin:0}}</style></head>"
            "<body>" + "".join(body) + "</body></html>"
        )

        ts = base_ts + _dt.timedelta(seconds=rng.randint(0, 90 * 86400))
        pages.append(
            {"url": url, "warc_ts": ts, "html": html_doc.encode("utf-8"),
             "text": golden_text, "lang": lang}
        )
        goldens.append(
            {"url": url, "cells": expected_cells,
             "n_tables": n_tables}
        )
        if rng.random() < dup_frac:
            pages.append(
                {"url": url, "warc_ts": ts + _dt.timedelta(days=rng.randint(1, 30)),
                 "html": html_doc.encode("utf-8"), "text": golden_text,
                 "lang": lang}
            )
    return pages, goldens


def write_pages_parquet(path: str, n_docs: int = 200, seed: int = 42,
                        dup_frac: float = 0.05) -> int:
    """Write the corpus as a parquet file; returns row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pages, _ = generate_pages(n_docs=n_docs, seed=seed, dup_frac=dup_frac)
    table = pa.table(
        {
            "url": pa.array([p["url"] for p in pages], pa.string()),
            "warc_ts": pa.array(
                [p["warc_ts"].replace(tzinfo=None) for p in pages],
                pa.timestamp("us"),
            ),
            "html": pa.array([p["html"] for p in pages], pa.binary()),
            "text": pa.array([p["text"] for p in pages], pa.string()),
            "lang": pa.array([p["lang"] for p in pages], pa.string()),
        }
    )
    pq.write_table(table, path)
    return table.num_rows
