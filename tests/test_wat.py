"""WAT sidecar: envelope grammar, deterministic file layout, and the
write→read round trip (exact title/status/ctype and ORDERED link list).

Reference parity: the reference keeps per-document metadata inside its
result JSONs (table_ocr/core.py result sink); the crawl-scale metadata
sidecar layout is CC's WAT — written here so downstream link-graph /
anchor consumers never re-scan the HTML column.
"""

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.sources.warc import iter_warc_records
from table_ocr_spark.sources.wat import (
    build_wat_payload,
    read_wat,
    wat_record_bytes,
    write_wat,
)


def _pages(spark, n=30):
    html = F.concat(
        F.lit("<html><head><title> Doc "),
        F.col("id").cast("string"),
        F.lit(" </title></head><body>"),
        # one absolute link, one relative link, one nofollow link,
        # one anchor with no href (must not mint a link)
        F.lit('<a href="http://x.test/abs">a</a>'),
        F.lit('<a href="/rel/path">r</a>'),
        F.lit('<a href="http://y.test/nf" rel="ugc nofollow">n</a>'),
        F.lit('<a name="top">plain</a>'),
        F.lit("</body></html>"),
    )
    return spark.range(n).select(
        F.concat(
            F.lit("http://h"), (F.col("id") % 5).cast("string"),
            F.lit(".test/p"), F.col("id").cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2026-02-03 04:05:06")).alias("warc_ts"),
        html.cast("binary").alias("html"),
        (F.lit(200) + (F.col("id") % 2) * 104).alias("status"),
        F.lit("text/html; charset=utf-8").alias("ctype"),
    )


class TestRecord:
    def test_record_grammar(self):
        rec = wat_record_bytes(
            "http://a.test/x", "2026-02-03T04:05:06Z", '{"Envelope":{}}'
        )
        got = list(iter_warc_records(rec))
        assert len(got) == 1
        r = got[0]
        assert r["warc_type"] == "metadata"
        assert r["url"] == "http://a.test/x"
        assert r["warc_ts"] == "2026-02-03T04:05:06Z"
        assert r["block"] == b'{"Envelope":{}}'


class TestEnvelope:
    def test_payload_fields_and_link_order(self, spark):
        row = build_wat_payload(
            _pages(spark, 1), status_col="status", ctype_col="ctype"
        ).collect()[0]
        env = json.loads(row["wat_json"])["Envelope"]
        assert env["WARC-Header-Metadata"]["WARC-Target-URI"] == row["url"]
        assert env["WARC-Header-Metadata"]["WARC-Date"] == "2026-02-03T04:05:06Z"
        http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
        assert http["Response-Message"]["Status"] == 200
        assert http["Headers"]["Content-Type"] == "text/html; charset=utf-8"
        meta = http["HTML-Metadata"]
        assert meta["Head"]["Title"] == "Doc 0"  # trimmed
        links = meta["Links"]
        # hrefs VERBATIM (relative included), document order, no-href
        # anchors dropped, nofollow flagged
        assert [ln["url"] for ln in links] == [
            "http://x.test/abs", "/rel/path", "http://y.test/nf",
        ]
        assert [ln["nofollow"] for ln in links] == [False, False, True]
        assert all(ln["path"] == "A@/href" for ln in links)

    def test_absent_optional_columns_pin_defaults(self, spark):
        row = build_wat_payload(_pages(spark, 1)).collect()[0]
        http = json.loads(row["wat_json"])["Envelope"]["Payload-Metadata"][
            "HTTP-Response-Metadata"
        ]
        assert http["Response-Message"]["Status"] == 200
        assert http["Headers"]["Content-Type"] == ""


class TestRoundTrip:
    def test_write_read_exact(self, spark, tmp_path):
        out = str(tmp_path / "wat")
        pages = _pages(spark, 30)
        manifest = write_wat(
            pages, out, n_files=4, status_col="status", ctype_col="ctype"
        )
        assert manifest.agg(F.sum("n_records")).collect()[0][0] == 30
        back = read_wat(spark, os.path.join(out, "*.warc.wat.gz"))
        rows = {r["url"]: r for r in back.collect()}
        assert len(rows) == 30
        for i in [0, 7, 29]:
            r = rows[f"http://h{i % 5}.test/p{i}"]
            assert r["title"] == f"Doc {i}"
            assert r["http_status"] == 200 + (i % 2) * 104
            assert r["http_content_type"] == "text/html; charset=utf-8"
            assert [ln["url"] for ln in r["links"]] == [
                "http://x.test/abs", "/rel/path", "http://y.test/nf",
            ]
            assert [ln["nofollow"] for ln in r["links"]] == [
                False, False, True,
            ]

    def test_byte_deterministic_rerun(self, spark, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        pages = _pages(spark, 25)
        write_wat(pages, a, n_files=3)
        write_wat(pages, b, n_files=3)
        fa = sorted(glob.glob(os.path.join(a, "*")))
        fb = sorted(glob.glob(os.path.join(b, "*")))
        assert [os.path.basename(p) for p in fa] == [
            os.path.basename(p) for p in fb
        ]
        for pa, pb in zip(fa, fb):
            assert open(pa, "rb").read() == open(pb, "rb").read()

    def test_gzip_members_individually_decodable(self, spark, tmp_path):
        out = str(tmp_path / "wat")
        write_wat(_pages(spark, 10), out, n_files=2)
        f = sorted(glob.glob(os.path.join(out, "*")))[0]
        blob = open(f, "rb").read()
        # whole-file gzip decode works because members concatenate
        body = gzip.decompress(blob)
        assert body.startswith(b"WARC/1.0\r\nWARC-Type: metadata\r\n")

    def test_n_files_guard(self, spark, tmp_path):
        with pytest.raises(ValueError, match="n_files"):
            write_wat(_pages(spark, 2), str(tmp_path / "x"), n_files=0)
