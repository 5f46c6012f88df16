"""Sitemap XML parsing + crawl-frontier fetch planning.

Reference parity: the reference's only scheduling is a global ≤0.25
req/s sleep in its API loop (table_ocr/core.py:66-67); the crawl-fed
analogue needs sitemap seeds (sitemaps.org) and PER-HOST politeness.
"""

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.operators.frontier import plan_fetches
from table_ocr_spark.operators.sitemaps import parse_sitemaps, xml_unescape

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://h.test/a?x=1&amp;y=2 </loc>
    <lastmod>2026-01-05</lastmod>
  </url>
  <url><loc>http://h.test/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap><loc>http://h.test/sitemap-a.xml</loc>
    <lastmod>2026-02-01T00:00:00Z</lastmod></sitemap>
  <sitemap><loc>http://h.test/sitemap-b.xml</loc></sitemap>
</sitemapindex>
"""


class TestParseSitemaps:
    def test_urlset_entries_and_entities(self, spark):
        df = spark.createDataFrame(
            [("h.test", URLSET)], "host string, sitemap_xml string"
        )
        rows = parse_sitemaps(df).orderBy("loc").collect()
        # the loc-less <url> block drops
        assert [(r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
            ("url", "http://h.test/a?x=1&y=2", "2026-01-05"),
            ("url", "http://h.test/b", None),
        ]
        assert all(r["host"] == "h.test" for r in rows)

    def test_sitemapindex_nested(self, spark):
        df = spark.createDataFrame(
            [("h.test", INDEX)], "host string, sitemap_xml string"
        )
        rows = parse_sitemaps(df).orderBy("loc").collect()
        assert [(r["kind"], r["loc"], r["lastmod"]) for r in rows] == [
            ("sitemap", "http://h.test/sitemap-a.xml",
             "2026-02-01T00:00:00Z"),
            ("sitemap", "http://h.test/sitemap-b.xml", None),
        ]

    def test_mixed_and_multirow(self, spark):
        df = spark.createDataFrame(
            [("a.test", URLSET), ("b.test", INDEX), ("c.test", None)],
            "host string, sitemap_xml string",
        )
        got = parse_sitemaps(df).groupBy("host", "kind").count().collect()
        assert {(r["host"], r["kind"]): r["count"] for r in got} == {
            ("a.test", "url"): 2,
            ("b.test", "sitemap"): 2,
        }

    def test_entity_decode_single_level(self, spark):
        df = spark.createDataFrame(
            [("h", "<url><loc>http://h/a&amp;lt;b&apos;c</loc></url>")],
            "host string, sitemap_xml string",
        )
        [r] = parse_sitemaps(df).collect()
        # &amp;lt; is ONE level of escaping of '&lt;' -> decodes to
        # '&lt;', not '<' (xml burns one level only)
        assert r["loc"] == "http://h/a&lt;b'c"

    def test_xml_unescape_order(self, spark):
        df = spark.createDataFrame([("x &amp;amp; &gt;",)], "s string")
        [r] = df.select(xml_unescape(F.col("s")).alias("u")).collect()
        assert r["u"] == "x &amp; >"


class TestPlanFetches:
    def _urls(self, spark):
        rows = [
            (f"http://h{i % 3}.test/p{j}",)
            for i in range(3)
            for j in range(5)
        ]
        return spark.createDataFrame(rows, "url string")

    def test_seq_per_host_deterministic(self, spark):
        plan = plan_fetches(self._urls(spark), delay_s=2.0, workers=4)
        rows = plan.collect()
        by_host = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r)
        for host, rs in by_host.items():
            rs.sort(key=lambda r: r["seq"])
            assert [r["seq"] for r in rs] == list(range(5))
            # seq order == url order (no priority col)
            assert [r["url"] for r in rs] == sorted(r["url"] for r in rs)
            # eta = seq * delay; one worker per host
            assert all(r["eta_s"] == r["seq"] * 2.0 for r in rs)
            assert len({r["worker"] for r in rs}) == 1
            assert all(0 <= r["worker"] < 4 for r in rs)

    def test_priority_orders_within_host(self, spark):
        df = spark.createDataFrame(
            [
                ("http://h.test/low", 1.0),
                ("http://h.test/high", 9.0),
                ("http://h.test/none", None),
            ],
            "url string, prio double",
        )
        plan = plan_fetches(df, priority_col="prio")
        got = {r["url"]: r["seq"] for r in plan.collect()}
        assert got == {
            "http://h.test/high": 0,
            "http://h.test/low": 1,
            "http://h.test/none": 2,  # NULL priority last
        }

    def test_max_per_host_budget(self, spark):
        plan = plan_fetches(self._urls(spark), max_per_host=2)
        assert plan.count() == 6  # 3 hosts x 2
        assert plan.agg(F.max("seq")).collect()[0][0] == 1

    def test_duplicate_urls_collapse(self, spark):
        df = self._urls(spark).union(self._urls(spark))
        assert plan_fetches(df).count() == 15

    def test_guards(self, spark):
        with pytest.raises(ValueError):
            plan_fetches(self._urls(spark), workers=0)
        with pytest.raises(ValueError):
            plan_fetches(self._urls(spark), delay_s=-1.0)

    def test_host_delays_floor_and_override(self, spark):
        delays = spark.createDataFrame(
            [
                ("h0.test", 5.0),   # above the floor: wins
                ("h1.test", 0.5),   # below the floor: floor wins
                # h2.test absent: floor wins
                ("h0.test", 3.0),   # duplicate host: max (5.0) wins
            ],
            "host string, crawl_delay double",
        )
        plan = plan_fetches(
            self._urls(spark),
            delay_s=2.0,
            host_delays=delays,
            broadcast_delays=True,
        )
        want = {"h0.test": 5.0, "h1.test": 2.0, "h2.test": 2.0}
        for r in plan.collect():
            assert r["delay_s"] == want[r["host"]], r
            assert r["eta_s"] == r["seq"] * want[r["host"]], r
