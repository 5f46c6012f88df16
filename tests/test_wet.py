"""WET sink: conversion-record grammar, deterministic file layout,
and the write→read_warc round trip (byte-identity on text).

Reference parity: the reference exports per-document results as JSON
keyed by pdf stem (table_ocr/core.py result sink); the crawl-scale
"extracted text per source document" interchange layout is CC's WET.
"""

import glob
import gzip
import os

import pytest

from table_ocr_spark.sources.warc import iter_warc_records, read_warc
from table_ocr_spark.sources.wet import wet_record_bytes, write_wet


def _pages(spark, n=40):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                     F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
            F.to_timestamp(
                F.concat(F.lit("2026-01-"),
                         F.lpad(((F.col("id") % 27) + 1).cast("string"), 2, "0"),
                         F.lit(" 12:00:00"))
            ).alias("warc_ts"),
            F.concat(F.lit("text of doc "), F.col("id").cast("string"),
                     F.lit(" with unicode café é")).alias("text"),
        )
    )


class TestRecord:
    def test_record_parses_back(self):
        rec = wet_record_bytes(
            "http://a.test/x", "2026-01-01T00:00:00Z", "hello café"
        )
        rows = list(iter_warc_records(rec))
        assert len(rows) == 1
        r = rows[0]
        assert r["warc_type"] == "conversion"
        assert r["url"] == "http://a.test/x"
        assert r["block"] == "hello café".encode("utf-8")

    def test_content_length_is_octets_not_chars(self):
        rec = wet_record_bytes("http://a.test/x", "2026-01-01T00:00:00Z", "é")
        # 'é' is 2 octets in utf-8; a char-counted length would truncate
        rows = list(iter_warc_records(rec))
        assert rows[0]["block"].decode("utf-8") == "é"


class TestWriteWet:
    def test_roundtrip_byte_identity(self, spark, tmp_path):
        pages = _pages(spark)
        out = str(tmp_path / "wet")
        manifest = write_wet(pages, out, n_files=4)
        m = {r["file"]: r for r in manifest.collect()}
        assert sum(r["n_records"] for r in m.values()) == 40

        back = read_warc(spark, out + "/*.warc.wet.gz",
                         warc_types=("conversion",))
        got = {
            r["url"]: bytes(r["html"])
            for r in back.collect()
        }
        want = {
            r["url"]: r["text"].encode("utf-8")
            for r in pages.collect()
        }
        assert got == want  # byte-identical text per url

    def test_deterministic_output(self, spark, tmp_path):
        pages = _pages(spark)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        write_wet(pages, a, n_files=3)
        write_wet(pages.orderBy("text"), b, n_files=3)  # input order differs
        fa = sorted(os.path.basename(p) for p in glob.glob(a + "/*.gz"))
        fb = sorted(os.path.basename(p) for p in glob.glob(b + "/*.gz"))
        assert fa == fb
        for name in fa:
            with open(os.path.join(a, name), "rb") as f1, open(
                os.path.join(b, name), "rb"
            ) as f2:
                assert f1.read() == f2.read(), name

    def test_gzip_members_individually_seekable(self, spark, tmp_path):
        out = str(tmp_path / "wet")
        write_wet(_pages(spark, 10), out, n_files=1)
        [path] = glob.glob(out + "/*.gz")
        blob = open(path, "rb").read()
        # every record must be its own gzip member (CC layout): count
        # member magics at decompressobj boundaries
        import zlib

        members = 0
        while blob:
            d = zlib.decompressobj(wbits=31)
            d.decompress(blob)
            members += 1
            blob = d.unused_data
        assert members == 10

    def test_n_files_guard(self, spark, tmp_path):
        with pytest.raises(ValueError):
            write_wet(_pages(spark, 1), str(tmp_path / "x"), n_files=0)


class TestHeaderInjection:
    def test_crlf_url_sanitized_in_wet_record(self):
        """The sink grammar shares the builder's header-value
        hardening: a url carrying raw CR/LF percent-encodes instead of
        injecting headers into the conversion record."""
        rec = wet_record_bytes(
            "http://a.test/x\r\nContent-Length: 0\r\n",
            "2026-01-01T00:00:00Z",
            "body text",
        )
        from table_ocr_spark.sources.warc import iter_warc_records

        rows = list(iter_warc_records(rec))
        assert len(rows) == 1
        assert rows[0]["block"] == b"body text"
        assert rows[0]["url"] == (
            "http://a.test/x%0D%0AContent-Length: 0%0D%0A"
        )
