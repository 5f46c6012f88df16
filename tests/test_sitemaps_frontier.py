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


class TestRevisitSchedule:
    """Freshness-aware recrawl scheduling: pinned closed forms, a
    DuckDB differential twin of the full rule, and the plan_fetches
    composition."""

    def test_closed_forms(self, spark):
        from table_ocr_spark.operators.frontier import revisit_schedule

        D = 86400
        rows = [
            # one change over a 20-day span -> interval 10 d
            ("http://a.test/x", 0, "A"),
            ("http://a.test/x", 10 * D, "A"),
            ("http://a.test/x", 20 * D, "B"),
            # never changed over 20 d -> span/1 = 20 d
            ("http://b.test/y", 0, "A"),
            ("http://b.test/y", 20 * D, "A"),
            # changes every capture, 1 h apart -> 3600/3 floors to min
            ("http://c.test/z", 0, "A"),
            ("http://c.test/z", 1800, "B"),
            ("http://c.test/z", 3600, "C"),
            # single capture -> default
            ("http://d.test/w", 0, "A"),
            # long never-changing history -> ceiling clamp
            ("http://e.test/v", 0, "A"),
            ("http://e.test/v", 90 * D, "A"),
        ]
        caps = spark.createDataFrame(
            [(u, t, d) for u, t, d in rows], "url string, t long, digest string"
        ).select("url", F.timestamp_seconds("t").alias("warc_ts"), "digest")
        got = {
            r["url"]: r
            for r in revisit_schedule(caps, min_interval_s=3600.0).collect()
        }
        assert got["http://a.test/x"]["n_changes"] == 1
        assert got["http://a.test/x"]["interval_s"] == 10 * D
        assert got["http://b.test/y"]["interval_s"] == 20 * D
        assert got["http://c.test/z"]["n_changes"] == 2
        assert got["http://c.test/z"]["interval_s"] == 3600.0  # floor
        assert got["http://d.test/w"]["interval_s"] == 7 * D  # default
        assert got["http://e.test/v"]["interval_s"] == 30 * D  # ceiling
        # next_fetch_ts = last_ts + interval
        a = got["http://a.test/x"]
        assert (
            a["next_fetch_ts"] - a["last_ts"]
        ).total_seconds() == a["interval_s"]

    def test_equal_ts_redelivery_deterministic(self, spark):
        from table_ocr_spark.operators.frontier import revisit_schedule

        # two captures at the SAME ts with different digests: the
        # (ts, digest) order pins the lag sequence -> exactly one
        # change regardless of input row order
        for order in ([0, 1, 2], [2, 1, 0], [1, 2, 0]):
            rows = [
                ("http://a.test/x", 100, "B"),
                ("http://a.test/x", 100, "A"),
                ("http://a.test/x", 200, "B"),
            ]
            rows = [rows[i] for i in order]
            caps = spark.createDataFrame(
                rows, "url string, t long, digest string"
            ).select(
                "url", F.timestamp_seconds("t").alias("warc_ts"), "digest"
            )
            r = revisit_schedule(caps).collect()[0]
            # A,B,B ordered: one change (A->B), span 100 s
            assert r["n_changes"] == 1 and r["n_captures"] == 3

    def test_differential_vs_duckdb(self, spark):
        import random

        import duckdb

        from table_ocr_spark.operators.frontier import revisit_schedule

        rng = random.Random(11)
        rows = []
        for i in range(200):
            url = f"http://h{i % 37}.test/p{i}"
            n_caps = rng.randrange(1, 8)
            t = rng.randrange(0, 10**6)
            for _ in range(n_caps):
                rows.append((url, t, f"d{rng.randrange(3)}"))
                t += rng.randrange(1, 10**6)
        caps = spark.createDataFrame(
            rows, "url string, t long, digest string"
        ).select("url", F.timestamp_seconds("t").alias("warc_ts"), "digest")
        got = {
            r["url"]: (r["n_captures"], r["n_changes"], r["interval_s"])
            for r in revisit_schedule(caps).collect()
        }

        con = duckdb.connect()
        con.execute(
            "create table caps(url varchar, t bigint, digest varchar)"
        )
        con.executemany("insert into caps values (?, ?, ?)", rows)
        want = con.sql(
            """
            with ordered as (
              select url, t, digest,
                     lag(digest) over (partition by url order by t, digest)
                       as prev
              from caps
            ), agg as (
              select url, count(*) as n_captures,
                     sum(case when prev is not null and digest <> prev
                          then 1 else 0 end) as n_changes,
                     max(t) - min(t) as span_s
              from ordered group by url
            )
            select url, n_captures, n_changes,
                   case when n_captures < 2 then 604800.0
                        else least(greatest(span_s / (n_changes + 1),
                                            3600.0), 2592000.0) end
                     as interval_s
            from agg
            """
        ).fetchall()
        assert len(want) == len(got)
        for url, n_caps, n_chg, interval in want:
            g = got[url]
            assert g[0] == n_caps and g[1] == n_chg, url
            assert g[2] == interval, (url, g[2], interval)

    def test_composes_with_plan_fetches(self, spark):
        from table_ocr_spark.operators.frontier import (
            plan_fetches,
            revisit_schedule,
        )

        D = 86400
        rows = [
            ("http://h.test/often", 0, "A"),
            ("http://h.test/often", D, "B"),
            ("http://h.test/often", 2 * D, "C"),   # interval 1 d
            ("http://h.test/rare", 0, "A"),
            ("http://h.test/rare", 20 * D, "A"),   # interval 20 d
        ]
        caps = spark.createDataFrame(
            rows, "url string, t long, digest string"
        ).select("url", F.timestamp_seconds("t").alias("warc_ts"), "digest")
        sched = revisit_schedule(caps)
        now = 40 * D  # both due; 'often' is more overdue
        due = sched.where(
            F.unix_timestamp("next_fetch_ts") <= F.lit(now)
        ).withColumn(
            "overdue_s",
            F.lit(float(now)) - F.unix_timestamp("next_fetch_ts"),
        )
        plan = plan_fetches(due, priority_col="overdue_s")
        seqs = {r["url"]: r["seq"] for r in plan.collect()}
        assert seqs == {"http://h.test/often": 0, "http://h.test/rare": 1}


    def test_interval_guards(self, spark):
        """All three interval knobs are validated up front -- an
        out-of-band default_interval_s would make every once-seen url
        permanently due (round-5 review regression)."""
        from table_ocr_spark.operators.frontier import revisit_schedule

        caps = spark.createDataFrame(
            [("http://a.test/x", 0, "d")], "url string, t long, digest string"
        ).select("url", F.timestamp_seconds("t").alias("warc_ts"), "digest")
        with pytest.raises(ValueError, match="min_interval_s"):
            revisit_schedule(caps, min_interval_s=0.0)
        with pytest.raises(ValueError, match="default_interval_s"):
            revisit_schedule(caps, default_interval_s=0.0)
        with pytest.raises(ValueError, match="default_interval_s"):
            revisit_schedule(
                caps,
                max_interval_s=86400.0,
                default_interval_s=7 * 86400.0,
            )

    def test_null_ts_captures_carry_no_evidence(self, spark):
        """Review regression: undated captures (NULL warc_ts, the
        ingest_crawl malformed-date row) must not collapse the span
        to 0 and trigger hourly refetch."""
        from table_ocr_spark.operators.frontier import revisit_schedule

        caps = spark.createDataFrame(
            [
                ("http://a.test/x", None, "A"),
                ("http://a.test/x", 1000, "B"),
                ("http://only-null.test/y", None, "A"),
            ],
            "url string, t long, digest string",
        ).select(
            "url",
            F.timestamp_seconds("t").alias("warc_ts"),
            "digest",
        )
        rows = {r["url"]: r for r in revisit_schedule(caps).collect()}
        # one dated capture -> default interval, NULL row uncounted
        a = rows["http://a.test/x"]
        assert a["n_captures"] == 1 and a["n_changes"] == 0
        assert a["interval_s"] == 7 * 86400
        # only undated captures -> no schedule row at all
        assert "http://only-null.test/y" not in rows
