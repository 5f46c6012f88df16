"""Text canonicalization (operators/normalize.py)."""

import unicodedata

import pytest

from table_ocr_spark.operators.normalize import normalize_text, nfc_udf


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "plain ascii stays put"),
        (1, "cafe\u0301 decomposed"),    # -> U+00E9 precomposed
        (2, "bell\x07 and\x00 controls\x7f"),  # controls die
        (3, "crlf\r\nline"),                   # \r dies, \n stays
        (4, "a  b\t\tc"),                      # ws runs (collapse opt)
        (5, " edge  \ntrail "),                # line-edge trim
        (6, None),
        (7, "Å ring"),                   # -> Å
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNormalize:
    def test_nfc_and_controls_default(self, docs):
        out = {r.doc_id: r for r in normalize_text(docs).collect()}
        assert out[0].text_norm == "plain ascii stays put"
        assert out[0].changed is False
        assert out[1].text_norm == "café decomposed"
        assert out[1].changed is True
        assert out[2].text_norm == "bell and controls"
        assert out[3].text_norm == "crlf\nline"
        # no collapse by default: ws runs survive
        assert out[4].text_norm == "a  b\t\tc" and out[4].changed is False
        assert out[6].text_norm is None and out[6].changed is False
        assert out[7].text_norm == "Å ring"

    def test_collapse_ws(self, docs):
        out = {
            r.doc_id: r
            for r in normalize_text(docs, collapse_ws=True).collect()
        }
        assert out[4].text_norm == "a b c"
        assert out[5].text_norm == "edge\ntrail"
        # newlines never collapse
        assert out[3].text_norm == "crlf\nline"

    def test_forms_differential_vs_unicodedata(self, spark):
        cases = [
            "cafe\u0301", "\ufb01re ligature", "①②③", "ｆｕｌｌwidth",
            "A\u030a", "x\u0338", "ascii only",
        ]
        df = spark.createDataFrame([(c,) for c in cases], "t string")
        for form in ("NFC", "NFKC", "NFD", "NFKD"):
            got = [
                r.n for r in df.select(nfc_udf(form)("t").alias("n")).collect()
            ]
            want = [unicodedata.normalize(form, c) for c in cases]
            assert got == want, form

    def test_bad_form_rejected(self, docs):
        with pytest.raises(ValueError):
            normalize_text(docs, form="NFX")
