"""PDF layout-segmentation kernel + Spark operator: line clustering,
block splitting, table-region detection from cell geometry, reading
order, and the mapInArrow pipeline."""

import pytest

from table_ocr_spark.kernel.layout import (
    Span,
    encode_fake_pdf,
    extract_pdf,
    parse_pdf_payload,
    segment_page,
)


def sp(x0, y0, text, w=None, h=10):
    w = w if w is not None else 8 * len(text)
    return {"x0": x0, "y0": y0, "x1": x0 + w, "y1": y0 + h, "text": text}


def para_spans(words, x=20, y=20, per_line=4, lh=12):
    # flowing text: x advances by span width + word gap (ragged right,
    # like proportional fonts — only the left margin aligns)
    out = []
    cx, line = x, 0
    for i, w in enumerate(words):
        if i and i % per_line == 0:
            line += 1
            cx = x
        s = sp(cx, y + line * lh, w)
        out.append(s)
        cx = s["x1"] + 6
    return out


def table_spans(rows, x=20, y=200, col_w=90, lh=14):
    out = []
    for r, row in enumerate(rows):
        for c, cell in enumerate(row):
            out.append(sp(x + c * col_w, y + r * lh, cell))
    return out


PARA = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
TABLE = [["name", "city"], ["Huber", "Munich"], ["Meier", "Berlin"]]


def test_segment_paragraph_and_table():
    spans = [Span(**s) for s in para_spans(PARA) + table_spans(TABLE)]
    texts, cells, n_tables = segment_page(spans)
    assert texts == ["alpha beta gamma delta epsilon zeta"]
    assert n_tables == 1
    grid = {(c.row, c.col): c.text for c in cells}
    assert grid[(0, 0)] == "name" and grid[(0, 1)] == "city"
    assert grid[(2, 0)] == "Meier" and grid[(2, 1)] == "Berlin"


def test_two_blocks_split_by_gap():
    a = para_spans(["one", "two"], y=20, per_line=2)
    b = para_spans(["three", "four"], y=100, per_line=2)
    texts, cells, n = segment_page([Span(**s) for s in a + b])
    assert texts == ["one two", "three four"]
    assert n == 0


def test_ragged_lines_are_not_a_table():
    # wrapped paragraph: one span per line, left-aligned -> 1 shared
    # column bin only -> not a table
    spans = [Span(**sp(20, 20 + i * 12, f"word{i} word{i}b")) for i in range(4)]
    texts, cells, n = segment_page(spans)
    assert n == 0 and len(texts) == 1


def test_multi_page_and_roundtrip():
    payload = encode_fake_pdf(
        [para_spans(PARA), table_spans(TABLE, y=20)]
    )
    pages = parse_pdf_payload(payload)
    assert len(pages) == 2
    r = extract_pdf(payload)
    assert r.text == "alpha beta gamma delta epsilon zeta"
    assert r.n_tables == 1
    assert len(r.cells) == 6


def test_spark_pdf_pipeline(spark):
    from table_ocr_spark.operators.extract import extract_pdf_documents

    rows = [
        ("p1", encode_fake_pdf([para_spans(PARA) + table_spans(TABLE)])),
        ("p2", encode_fake_pdf([para_spans(["solo", "page"], per_line=2)])),
        ("p3", None),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in extract_pdf_documents(df).collect()}
    assert got["p1"]["extracted_text"] == "alpha beta gamma delta epsilon zeta"
    assert got["p1"]["n_tables"] == 1 and len(got["p1"]["cells"]) == 6
    assert got["p2"]["extracted_text"] == "solo page"
    assert got["p3"]["extracted_text"] == "" and got["p3"]["n_tables"] == 0


def test_unknown_payload_raises():
    with pytest.raises(NotImplementedError):
        parse_pdf_payload(b"%PDF-1.7 not really")


def test_page_config_crop_removes_edge_bleed():
    # the reference's crop_sides (table_ocr/core.py:197-205): page-edge
    # bleed from the neighboring scanned page shows up as a thin text
    # column at the extreme margin; cropping 10% off that side removes
    # it before segmentation
    from table_ocr_spark.kernel.layout import PageConfig

    body = para_spans(PARA, x=20, y=20)
    # bleed column: tall thin strip at far right (x ~ 600)
    bleed = [sp(600, 20 + i * 12, "|", w=6) for i in range(4)]
    payload = encode_fake_pdf([body + bleed])

    uncropped = extract_pdf(payload)
    assert "|" in uncropped.text

    cropped = extract_pdf(payload, PageConfig(crop_right=0.10))
    assert "|" not in cropped.text
    assert "alpha beta gamma" in cropped.text  # body intact

    # top crop removes a running header
    header = [sp(20, 0, "PAGE 17 OF THE REGISTER", h=8)]
    payload2 = encode_fake_pdf([header + [dict(s, y0=s["y0"] + 60, y1=s["y1"] + 60) for s in body]])
    r2 = extract_pdf(payload2, PageConfig(crop_top=0.15))
    assert "REGISTER" not in r2.text
    assert "alpha" in r2.text


def test_page_config_zero_is_identity():
    from table_ocr_spark.kernel.layout import PageConfig, crop_spans

    spans = [Span(**s) for s in para_spans(PARA)]
    assert crop_spans(spans, PageConfig()) is spans
    assert extract_pdf(encode_fake_pdf([para_spans(PARA)])).text == extract_pdf(
        encode_fake_pdf([para_spans(PARA)]), PageConfig()
    ).text


def test_spark_pdf_pipeline_with_page_config(spark):
    from table_ocr_spark.kernel.layout import PageConfig
    from table_ocr_spark.operators.extract import extract_pdf_documents

    bleed = [sp(600, 20 + i * 12, "|", w=6) for i in range(4)]
    rows = [("p1", bytearray(encode_fake_pdf([para_spans(PARA) + bleed])))]
    pdfs = spark.createDataFrame(rows, "url string, payload binary")
    out = extract_pdf_documents(
        pdfs, page_config=PageConfig(crop_right=0.10)
    ).collect()
    assert len(out) == 1 and "|" not in out[0]["extracted_text"]


def test_corrupt_fakepdf_degrades_per_row_in_spark(spark):
    # a malformed container must not fail the stage; a missing-capability
    # payload (real PDF without PyMuPDF) must still surface clearly
    from table_ocr_spark.operators.extract import extract_pdf_documents

    good = encode_fake_pdf([para_spans(PARA)])
    rows = [
        ("good", bytearray(good)),
        ("corrupt", bytearray(b"FAKEPDF{not valid json")),
    ]
    pdfs = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in extract_pdf_documents(pdfs).collect()}
    assert got["good"]["extracted_text"] != ""
    assert got["corrupt"]["extracted_text"] == ""
    assert got["corrupt"]["n_tables"] == 0
    # degradation is ACCOUNTED, not silent (ADVICE r2): per-row flag
    assert got["corrupt"]["degraded"] is True
    assert got["good"]["degraded"] is False

    try:
        import fitz  # noqa: F401
        has_fitz = True
    except ImportError:
        has_fitz = False
    if not has_fitz:
        real = spark.createDataFrame(
            [("r", bytearray(b"%PDF-1.4 pretend"))], "url string, payload binary"
        )
        with pytest.raises(Exception, match="PyMuPDF|NotImplemented"):
            extract_pdf_documents(real).collect()

def test_type_corrupt_fakepdf_degrades_not_typeerror(spark):
    """Round-5 regression (confirmed by execution pre-fix): shape-
    corrupt FAKEPDF containers raised TypeError past the degrade catch
    and one poison document failed the whole stage. parse_pdf_payload
    now validates shapes and raises the degradable ValueError."""
    from table_ocr_spark.operators.extract import extract_pdf_documents

    good = encode_fake_pdf([para_spans(PARA)])
    rows = [
        ("good", bytearray(good)),
        ("dict_top", bytearray(b'FAKEPDF{"spans": []}')),
        ("str_coords", bytearray(
            b'FAKEPDF[{"spans":[{"x0":"a","y0":1,"x1":2,"y1":3,"text":"t"}]}]'
        )),
        ("int_span", bytearray(b'FAKEPDF[{"spans":[5]}]')),
        ("int_text", bytearray(
            b'FAKEPDF[{"spans":[{"x0":1,"y0":1,"x1":2,"y1":3,"text":9}]}]'
        )),
    ]
    pdfs = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in extract_pdf_documents(pdfs).collect()}
    assert got["good"]["degraded"] is False
    for k in ("dict_top", "str_coords", "int_span", "int_text"):
        assert got[k]["degraded"] is True, k
        assert got[k]["extracted_text"] == ""


def test_pdf_dittos_resolved_like_html():
    """Round-5 parity fix: ditto marks are the scanned-register (PDF)
    phenomenology; extract_pdf resolves them exactly like the HTML
    kernel (value above, same table/col)."""
    spans = [
        {"x0": 20.0, "y0": 20.0, "x1": 60.0, "y1": 30.0, "text": "alpha"},
        {"x0": 170.0, "y0": 20.0, "x1": 210.0, "y1": 30.0, "text": "one"},
        {"x0": 20.0, "y0": 34.0, "x1": 60.0, "y1": 44.0, "text": "beta"},
        {"x0": 170.0, "y0": 34.0, "x1": 180.0, "y1": 44.0, "text": '"'},
    ]
    r = extract_pdf(encode_fake_pdf([spans]))
    cells = {(c.row, c.col): c.text for c in r.cells}
    assert cells[(1, 1)] == "one"


def test_column_bins_footprint_bounded():
    """An untrusted block with thousands of distinct x0 values is not
    a grid; the bin scan bails at MAX_COL_BINS instead of scanning
    O(spans x bins) on one executor core."""
    import time

    from table_ocr_spark.kernel.layout import MAX_COL_BINS

    spans = []
    for i in range(20_000):
        x = 20.0 + i * 10.0
        spans.append(
            {"x0": x, "y0": 20.0 + (i % 40) * 12.0,
             "x1": x + 4.0, "y1": 30.0 + (i % 40) * 12.0, "text": "w"}
        )
    t0 = time.monotonic()
    r = extract_pdf(encode_fake_pdf([spans]))
    dt = time.monotonic() - t0
    assert r.n_tables == 0  # un-grid-like: flowing text, no table
    assert dt < 5.0, f"bin scan took {dt:.1f}s — budget regressed"
    assert MAX_COL_BINS == 256

