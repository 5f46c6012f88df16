"""WARC source: record grammar round-trip, gzip-member layout,
malformed-tail semantics, and the Spark file-grain reader.

Reference parity: the reference's only ingest is one uploaded PDF at a
time (table_ocr/core.py); WARC is the container its production-scale
analogue (Common-Crawl-style snapshots, BASELINE.json input_hint)
actually arrives in.
"""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.sources.warc import (
    build_warc_record,
    gzip_members,
    iter_warc_records,
    parse_warc_blobs,
    read_warc,
    split_http_payload,
    warc_record_expr,
)


def _mk_records(n, typ="response"):
    return [
        build_warc_record(
            f"http://h{i % 7}.test/p{i}",
            f"2026-01-{(i % 27) + 1:02d}T12:00:00Z",
            f"<html><body>doc {i} body words</body></html>".encode(),
            warc_type=typ,
        )
        for i in range(n)
    ]


class TestKernel:
    def test_roundtrip_plain_and_gzip(self):
        recs = _mk_records(20)
        for blob in (b"".join(recs), gzip_members(recs)):
            out = list(iter_warc_records(blob))
            assert len(out) == 20
            assert out[13]["url"] == "http://h6.test/p13"
            status, ctype, body, location = split_http_payload(out[13]["block"])
            assert location is None
            assert status == 200
            assert ctype == "text/html; charset=utf-8"
            assert body == b"<html><body>doc 13 body words</body></html>"

    def test_whole_file_gzip_layout(self):
        # one gzip stream over ALL records (the non-CC layout) still
        # parses: the member iterator yields one big member, the plain
        # iterator slices it
        recs = _mk_records(6)
        blob = gzip.compress(b"".join(recs), mtime=0)
        assert len(list(iter_warc_records(blob))) == 6

    def test_truncated_tails_dropped_never_phantom(self):
        recs = _mk_records(5)
        plain, gz = b"".join(recs), gzip_members(recs)
        for bad in (
            plain + recs[0][:40],          # truncated header
            plain + recs[0][:-10],         # truncated block
            gz + gz[:25],                  # truncated gzip member
            plain + b"WARC/1.0\r\nContent-Length: oops\r\n\r\nx",
            # negative length must not regress pos (loop guard)
            plain + b"WARC/1.0\r\nContent-Length: -7\r\n\r\nx",
        ):
            out = list(iter_warc_records(bad))
            assert len(out) == 5
            assert all(r["url"].startswith("http://") for r in out)

    def test_resync_over_inter_record_junk(self):
        recs = _mk_records(3)
        blob = b"\r\n\r\njunk" + recs[0] + b"garbage here" + recs[1] + recs[2]
        assert len(list(iter_warc_records(blob))) == 3

    def test_non_http_block_and_bad_status(self):
        raw = build_warc_record(
            "http://a.test/", "2026-01-01T00:00:00Z", b"raw bytes",
            warc_type="metadata", http=False,
        )
        rec = next(iter(iter_warc_records(raw)))
        status, ctype, body, location = split_http_payload(rec["block"])
        assert status is None and ctype is None and body == b"raw bytes"
        assert location is None
        assert split_http_payload(b"HTTP/1.1 nope\r\n\r\nB") == (
            None, None, b"B", None,
        )
        assert split_http_payload(b"HTTP/1.1 200 OK\r\nnever-ends") == (
            None, None, b"", None,
        )

    def test_redirect_location_surfaced(self):
        raw = build_warc_record(
            "http://a.test/old", "2026-01-01T00:00:00Z", b"",
            http_status=301, location="https://a.test/new",
        )
        rec = next(iter(iter_warc_records(raw)))
        status, ctype, body, location = split_http_payload(rec["block"])
        assert status == 301
        assert location == "https://a.test/new"
        # first Location wins; header name is case-insensitive
        assert split_http_payload(
            b"HTTP/1.1 302 Found\r\nLOCATION:  /rel\r\n"
            b"Location: /other\r\n\r\nB"
        ) == (302, None, b"B", "/rel")


class TestSpark:
    def test_read_warc_file_grain(self, spark, tmp_path):
        recs = _mk_records(30)
        (tmp_path / "a.warc").write_bytes(b"".join(recs[:15]))
        (tmp_path / "b.warc.gz").write_bytes(gzip_members(recs[15:]))
        df = read_warc(spark, str(tmp_path) + "/*")
        rows = df.collect()
        assert len(rows) == 30
        assert {os.path.basename(r.warc_file.replace("file:", "")) for r in rows} == {
            "a.warc",
            "b.warc.gz",
        }
        by_url = {r.url: r for r in rows}
        r7 = by_url["http://h0.test/p7"]
        assert r7.http_status == 200
        assert r7.http_content_type == "text/html; charset=utf-8"
        assert bytes(r7.html) == b"<html><body>doc 7 body words</body></html>"
        # request/metadata records are filtered by the default types
        mixed = b"".join(_mk_records(4) + _mk_records(2, typ="request"))
        (tmp_path / "c.warc").write_bytes(mixed)
        only_c = read_warc(spark, str(tmp_path / "c.warc"))
        assert only_c.count() == 4
        assert (
            read_warc(spark, str(tmp_path / "c.warc"), warc_types=None).count()
            == 6
        )

    def test_expr_builder_matches_python_twin(self, spark):
        # the contract query's Spark-expression builder must emit the
        # exact bytes build_warc_record emits — one grammar, two engines
        from pyspark.sql import functions as F

        df = spark.range(8).select(
            F.concat(F.lit("http://h"), F.col("id"), F.lit(".test/p")).alias("u"),
            F.lit("2026-02-02T00:00:00Z").alias("ts"),
            F.concat(F.lit("<p>body "), F.col("id"), F.lit("</p>")).alias("b"),
        )
        got = {
            r.u: r.rec.encode("ascii")
            for r in df.select(
                "u", warc_record_expr(F.col("u"), F.col("ts"), F.col("b")).alias("rec")
            ).collect()
        }
        for i in range(8):
            u = f"http://h{i}.test/p"
            assert got[u] == build_warc_record(
                u, "2026-02-02T00:00:00Z", f"<p>body {i}</p>".encode()
            )

    def test_parse_blobs_batch_bound(self, spark):
        # batch_rows=3 forces multi-batch yield paths inside one file
        recs = _mk_records(10)
        df = spark.createDataFrame(
            [("f0", b"".join(recs[:7])), ("f1", gzip_members(recs[7:]))],
            "warc_file string, blob binary",
        )
        out = parse_warc_blobs(df, batch_rows=3)
        assert out.count() == 10
        assert out.where("http_status = 200").count() == 10

    def test_streaming_availablenow_equals_batch(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from table_ocr_spark.sources.warc import read_warc_stream

        src = tmp_path / "bucket"
        src.mkdir()
        recs = _mk_records(24)
        (src / "f0.warc").write_bytes(b"".join(recs[:9]))
        (src / "f1.warc.gz").write_bytes(gzip_members(recs[9:17]))
        (src / "f2.warc").write_bytes(b"".join(recs[17:]))
        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

        def run_once():
            q = (
                read_warc_stream(spark, str(src), max_files_per_trigger=1)
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        cols = ["url", "http_status", "h"]
        got = sorted(
            tuple(r)
            for r in spark.read.parquet(out_dir)
            .select("url", "http_status", F.col("html").cast("string").alias("h"))
            .collect()
        )
        batch = sorted(
            tuple(r)
            for r in read_warc(spark, str(src) + "/*")
            .select("url", "http_status", F.col("html").cast("string").alias("h"))
            .collect()
        )
        assert got == batch and len(got) == 24

        # restart over the same checkpoint with no new files: completed
        # files never re-emit (file-granularity exactly-once)
        run_once()
        assert spark.read.parquet(out_dir).count() == 24
        # a NEW file is picked up incrementally on the next restart
        (src / "f3.warc").write_bytes(b"".join(_mk_records(3)))
        run_once()
        assert spark.read.parquet(out_dir).count() == 27


class TestRevisit:
    def test_digest_header_roundtrip(self):
        dg = "sha256:" + "ab" * 32
        rec = build_warc_record(
            "http://a.test/p", "2026-01-01T00:00:00Z", b"<html>x</html>",
            payload_digest=dg,
        )
        [row] = list(iter_warc_records(rec))
        assert row["payload_digest"] == dg
        # absent header -> empty string, never a crash
        plain = build_warc_record(
            "http://a.test/q", "2026-01-01T00:00:00Z", b"y"
        )
        assert list(iter_warc_records(plain))[0]["payload_digest"] == ""

    def test_digest_expr_matches_hashlib(self, spark):
        import hashlib

        from table_ocr_spark.sources.warc import payload_digest_expr

        body = b"the payload bytes \xc3\xa9"
        df = spark.createDataFrame([(body,)], "b binary").select(
            payload_digest_expr("b").alias("dg")
        )
        want = "sha256:" + hashlib.sha256(body).hexdigest()
        assert df.collect()[0]["dg"] == want

    def test_resolve_revisits(self, spark):
        from table_ocr_spark.sources.warc import resolve_revisits

        dg = "sha256:d1"
        rows = [
            # two responses share the digest: the (ts, url)-smallest
            # is the canonical donor
            ("response", "http://b.test/p", "2026-02-01T00:00:00Z",
             bytearray(b"PAYLOAD"), dg),
            ("response", "http://a.test/p", "2026-01-01T00:00:00Z",
             bytearray(b"PAYLOAD"), dg),
            ("revisit", "http://c.test/p", "2026-03-01T00:00:00Z",
             bytearray(b""), dg),
            ("revisit", "http://d.test/p", "2026-03-02T00:00:00Z",
             bytearray(b""), "sha256:unknown"),
            ("request", "http://a.test/p", "2026-01-01T00:00:00Z",
             bytearray(b""), None),
        ]
        df = spark.createDataFrame(
            rows,
            "warc_type string, url string, warc_ts string, "
            "html binary, payload_digest string",
        )
        got = {
            (r["warc_type"], r["url"]): r
            for r in resolve_revisits(df).collect()
        }
        assert len(got) == 5  # row count conserved
        c = got[("revisit", "http://c.test/p")]
        assert bytes(c["html"]) == b"PAYLOAD"
        assert c["revisit_resolved"] is True
        assert c["revisit_of_url"] == "http://a.test/p"  # earliest wins
        assert c["revisit_of_ts"] == "2026-01-01T00:00:00Z"
        d = got[("revisit", "http://d.test/p")]
        assert d["revisit_resolved"] is False
        assert bytes(d["html"]) == b"" and d["revisit_of_url"] is None
        # non-revisit rows pass through unchanged, flag NULL
        b = got[("response", "http://b.test/p")]
        assert b["revisit_resolved"] is None
        assert bytes(b["html"]) == b"PAYLOAD"
        assert got[("request", "http://a.test/p")]["revisit_resolved"] is None
        # re-annotating an annotated frame refuses loudly
        import pytest as _pt

        with _pt.raises(ValueError, match="revisit_resolved"):
            resolve_revisits(resolve_revisits(df))

    def test_resolve_revisits_via_files(self, spark, tmp_path):
        """End to end through the real container: a response + revisit
        pair written as gzip members, read with read_warc, resolved."""
        import hashlib

        from table_ocr_spark.sources.warc import (
            gzip_members,
            read_warc,
            resolve_revisits,
        )

        body = b"<html><body>stable content</body></html>"
        dg = "sha256:" + hashlib.sha256(body).hexdigest()
        recs = [
            build_warc_record(
                "http://s.test/p", "2026-01-01T00:00:00Z", body,
                payload_digest=dg,
            ),
            build_warc_record(
                "http://s.test/p", "2026-02-01T00:00:00Z", b"",
                warc_type="revisit", payload_digest=dg,
            ),
        ]
        p = tmp_path / "f.warc.gz"
        p.write_bytes(gzip_members(recs))
        parsed = read_warc(spark, str(p), warc_types=None)
        out = resolve_revisits(parsed)
        rev = out.where(F.col("warc_type") == "revisit").collect()[0]
        assert rev["revisit_resolved"] is True
        assert bytes(rev["html"]) == body
        assert rev["revisit_of_ts"] == "2026-01-01T00:00:00Z"

    def test_ingest_crawl_with_revisits(self, spark, tmp_path):
        """Pipeline wiring: with_revisits=True turns resolved revisits
        into pages under their own capture identity and DROPS
        unresolved ones."""
        import hashlib

        from table_ocr_spark.pipelines import ingest_crawl
        from table_ocr_spark.sources.warc import gzip_members

        body = b"<html><body>stable content here</body></html>"
        dg = "sha256:" + hashlib.sha256(body).hexdigest()
        recs = [
            build_warc_record(
                "http://s.test/p", "2026-01-01T00:00:00Z", body,
                payload_digest=dg,
            ),
            build_warc_record(
                "http://s.test/p", "2026-02-01T00:00:00Z", b"",
                warc_type="revisit", payload_digest=dg,
            ),
            build_warc_record(
                "http://s.test/q", "2026-02-01T00:00:00Z", b"",
                warc_type="revisit", payload_digest="sha256:gone",
            ),
        ]
        p = tmp_path / "f.warc.gz"
        p.write_bytes(gzip_members(recs))

        # default: revisit records never enter the pages frame
        assert ingest_crawl(spark, str(p)).count() == 1
        pages = ingest_crawl(spark, str(p), with_revisits=True).collect()
        assert len(pages) == 2  # donor + resolved revisit; 'gone' dropped
        texts = {bytes(r["html"]) for r in pages}
        assert texts == {body}  # both captures carry the same payload
        ts = sorted(str(r["warc_ts"]) for r in pages)
        assert ts[0].startswith("2026-01-01") and ts[1].startswith("2026-02-01")


class TestNonAsciiUrl:
    def test_utf8_url_roundtrip(self):
        """WARC 1.0 headers are UTF-8: a non-ASCII target URI must
        round-trip losslessly instead of raising in the write kernel."""
        url = "http://exämple.test/søk?q=号"
        rec = build_warc_record(
            url, "2026-01-01T00:00:00Z", b"<html>x</html>"
        )
        rows = list(iter_warc_records(rec))
        assert len(rows) == 1 and rows[0]["url"] == url

    def test_utf8_location_roundtrip(self):
        """The HTTP block (incl. Location) is written UTF-8 — the
        parser must decode it the same way, or a non-ASCII redirect
        target mojibakes into an edge that matches nothing in the
        redirect resolver."""
        loc = "http://exämple.test/søk?q=号"
        rec = build_warc_record(
            "http://a.test/old", "2026-01-01T00:00:00Z", b"",
            http_status=301, location=loc,
        )
        rows = list(iter_warc_records(rec))
        assert len(rows) == 1
        status, ctype, body, location = split_http_payload(
            rows[0]["block"]
        )
        assert status == 301 and location == loc

    def test_wet_wat_utf8_url(self):
        from table_ocr_spark.sources.wet import wet_record_bytes
        from table_ocr_spark.sources.wat import wat_record_bytes

        url = "http://exämple.test/号"
        for rec in (
            wet_record_bytes(url, "2026-01-01T00:00:00Z", "t"),
            wat_record_bytes(url, "2026-01-01T00:00:00Z", "{}"),
        ):
            rows = list(iter_warc_records(rec))
            assert len(rows) == 1 and rows[0]["url"] == url


class TestHeaderInjection:
    """A raw CR/LF inside an interpolated header value (a messy crawl
    url) must not inject header lines or break member framing — the
    builder percent-encodes CR/LF/NUL (RFC 3986 requires them encoded
    in any valid URI, so valid urls pass through byte-identical)."""

    EVIL = "http://h.test/a\r\nWARC-Type: fake\r\n\r\nsmuggled"

    def test_crlf_url_cannot_inject_headers(self):
        rec = build_warc_record(
            self.EVIL, "2026-01-01T00:00:00Z", b"<html>x</html>"
        )
        follower = build_warc_record(
            "http://h.test/b", "2026-01-01T00:00:00Z", b"<html>y</html>"
        )
        rows = list(iter_warc_records(rec + follower))
        assert len(rows) == 2  # framing intact, no phantom third record
        assert rows[0]["warc_type"] == "response"  # not "fake"
        assert rows[0]["url"] == (
            "http://h.test/a%0D%0AWARC-Type: fake%0D%0A%0D%0Asmuggled"
        )
        assert rows[1]["url"] == "http://h.test/b"

    def test_crlf_location_cannot_truncate_http_block(self):
        rec = build_warc_record(
            "http://h.test/old",
            "2026-01-01T00:00:00Z",
            b"BODY",
            http_status=301,
            location="http://h.test/new\r\n\r\nnot-the-body",
        )
        rows = list(iter_warc_records(rec))
        status, ctype, body, loc = split_http_payload(rows[0]["block"])
        assert status == 301
        assert body == b"BODY"
        assert loc == "http://h.test/new%0D%0A%0D%0Anot-the-body"

    def test_valid_values_pass_byte_identical(self):
        a = build_warc_record(
            "http://exämple.test/søk?q=号",
            "2026-01-01T00:00:00Z",
            b"x",
            payload_digest="sha256:00ff",
        )
        from table_ocr_spark.sources.warc import header_value

        assert header_value("http://exämple.test/søk?q=号") == (
            "http://exämple.test/søk?q=号"
        )
        b = build_warc_record(
            "http://exämple.test/søk?q=号",
            "2026-01-01T00:00:00Z",
            b"x",
            payload_digest="sha256:00ff",
        )
        assert a == b
