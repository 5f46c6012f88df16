"""Per-host crawl health rollup: outcome mix, distinct-url and
url+digest counts, NULL-host junk grouping, exact vs approx dial."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from table_ocr_spark.operators.crawlstats import crawl_health


def _caps(spark):
    rows = []
    # h1: 3 captures of 2 urls; 200/200/301; digests: p0 changes once
    rows += [
        Row(url="http://h1.test/p0", http_status=200, html="aaaa", digest="x"),
        Row(url="http://h1.test/p0", http_status=200, html="bbbb", digest="y"),
        Row(url="http://h1.test/p1", http_status=301, html="", digest="z"),
    ]
    # h2: one 404, one 503, one NULL status (truncated envelope)
    rows += [
        Row(url="http://h2.test/a", http_status=404, html="cc", digest="x"),
        Row(url="http://h2.test/b", http_status=503, html=None, digest="x"),
        Row(url="http://h2.test/c", http_status=None, html="d", digest="x"),
    ]
    # schemeless junk: canonical host '' -> groups under NULL
    rows += [Row(url="garbage", http_status=200, html="ee", digest="x")]
    return spark.createDataFrame(rows)


class TestCrawlHealth:
    def test_per_host_rollup_exact(self, spark):
        out = {
            r["host"]: r.asDict()
            for r in crawl_health(
                _caps(spark), digest_col="digest"
            ).collect()
        }
        h1 = out["h1.test"]
        assert (h1["n_captures"], h1["n_urls"]) == (3, 2)
        assert (h1["n_2xx"], h1["n_3xx"], h1["n_4xx"], h1["n_5xx"]) == (
            2, 1, 0, 0,
        )
        assert h1["total_bytes"] == 8
        assert h1["n_url_digests"] == 3  # p0 changed once, p1 once
        h2 = out["h2.test"]
        assert (h2["n_4xx"], h2["n_5xx"], h2["n_other"]) == (1, 1, 1)
        assert h2["total_bytes"] == 3  # NULL payload counts 0
        assert h2["n_url_digests"] == 3
        junk = out[None]
        assert junk["n_captures"] == 1 and junk["n_2xx"] == 1

    def test_no_digest_no_payload(self, spark):
        out = crawl_health(
            _caps(spark), payload_col=None
        )
        assert "n_url_digests" not in out.columns
        assert all(r["total_bytes"] == 0 for r in out.collect())

    def test_approx_counts_close(self, spark):
        caps = spark.range(5000).select(
            F.concat(
                F.lit("http://h"), (F.col("id") % 3).cast("string"),
                F.lit(".test/p"), (F.col("id") % 1000).cast("string"),
            ).alias("url"),
            F.lit(200).alias("http_status"),
            F.lit("x").alias("html"),
        )
        got = {
            r["host"]: r["n_urls"]
            for r in crawl_health(caps, exact=False).collect()
        }
        for host, n in got.items():
            # gcd(3,1000)=1 so each host sees all 1000 paths over
            # 5000 ids; HLL++ at rsd 0.02 lands within a few %
            assert abs(n - 1000) < 60, (host, n)


class TestByteSemantics:
    def test_total_bytes_counts_utf8_octets(self, spark):
        caps = spark.createDataFrame(
            [Row(url="http://h1.test/a", http_status=200, html="café")]
        )
        row = crawl_health(caps).collect()[0]
        assert row["total_bytes"] == 5  # 4 chars, é is 2 bytes
