"""robots.txt stack: RFC 9309 parse semantics, pattern-regex
portability, and the join+argmax decision operator.

Reference parity: the reference ingests only user uploads
(table_ocr/core.py) — politeness is the capability its crawl-fed
production analogue (BASELINE.json north rule) needs before any fetch.
"""

import re

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.operators.robots import (
    filter_robots_allowed,
    parse_robots_body,
    robots_crawl_delays,
    robots_tables,
    robots_decisions,
    robots_pattern_regex,
    robots_rules,
    robots_sitemaps,
    url_path_query,
)

BODY = """\
# crawl policy
User-agent: megabot
Disallow: /private/
Allow: /private/ok$
Crawl-delay: 2.5

User-agent: *
Disallow: /tmp/*
Disallow:
Crawl-delay: 10
Sitemap: http://h.test/sitemap.xml

User-agent: MegaBot
Disallow: /extra
"""


class TestParse:
    def test_exact_agent_merges_groups_case_insensitive(self):
        rules, maps, delay = parse_robots_body(BODY, "MEGABOT")
        assert rules == [
            ("/private/", False),
            ("/private/ok$", True),
            ("/extra", False),
        ]
        assert maps == ["http://h.test/sitemap.xml"]
        # the STAR group's Crawl-delay: 10 must not leak into megabot
        assert delay == 2.5

    def test_star_fallback_and_empty_disallow(self):
        rules, _, delay = parse_robots_body(BODY, "otherbot")
        assert rules == [("/tmp/*", False)]  # empty Disallow: not a rule
        assert delay == 10.0

    def test_rules_before_any_group_dropped(self):
        rules, _, _ = parse_robots_body(
            "Disallow: /x\nUser-agent: *\nAllow: /y", "b"
        )
        assert rules == [("/y", True)]

    def test_max_rules_cap_in_file_order(self):
        body = "User-agent: *\n" + "\n".join(
            f"Disallow: /p{i}" for i in range(10)
        )
        rules, _, _ = parse_robots_body(body, "b", max_rules=3)
        assert [p for p, _ in rules] == ["/p0", "/p1", "/p2"]

    @pytest.mark.parametrize(
        "body,agent,want",
        [
            # merged groups: conservative max wins
            (
                "User-agent: a\nCrawl-delay: 3\n"
                "User-agent: a\nCrawl-delay: 1",
                "a",
                3.0,
            ),
            # malformed / negative / non-finite values ignored
            ("User-agent: *\nCrawl-delay: fast", "a", None),
            ("User-agent: *\nCrawl-delay: -1", "a", None),
            ("User-agent: *\nCrawl-delay: inf", "a", None),
            ("User-agent: *\nCrawl-delay: nan", "a", None),
            # group-scoped: a delay before any User-agent is dropped
            ("Crawl-delay: 5\nUser-agent: *\nDisallow: /x", "a", None),
            # delay line OPENS the rule block: the next User-agent
            # starts a new group, so the second group's rules don't
            # merge into the first
            ("User-agent: a\nCrawl-delay: 4\nUser-agent: b\nCrawl-delay: 9", "a", 4.0),
            ("User-agent: *\nCrawl-delay: 0", "a", 0.0),
        ],
    )
    def test_crawl_delay_pins(self, body, agent, want):
        _, _, delay = parse_robots_body(body, agent)
        assert delay == want


class TestPatternRegex:
    @pytest.mark.parametrize(
        "pattern,path,matches",
        [
            ("/private/", "/private/x", True),
            ("/private/", "/public/private/", False),  # anchored at start
            ("/tmp/*", "/tmp/a/b", True),
            ("/a$", "/a", True),
            ("/a$", "/ab", False),
            ("/fish*.php", "/fishheads/catfish.php?q=1", True),
            ("/a.b(+)?", "/a.b(+)?", True),  # metachars literal
            ("/a.b(+)?", "/aXbYYY", False),
        ],
    )
    def test_python_semantics(self, pattern, path, matches):
        rx = robots_pattern_regex(pattern)
        assert bool(re.search(rx, path)) == matches

    def test_spark_rlike_parity(self, spark):
        pats = ["/tmp/*", "/a$", "/a.b(+)?", "/fish*.php", "/w[1]{2}"]
        paths = ["/tmp/x", "/a", "/ab", "/a.b(+)?", "/fish1.php", "/w[1]{2}", "/"]
        rows = [(p, q) for p in pats for q in paths]
        df = spark.createDataFrame(rows, "pattern string, path string").select(
            "pattern", "path",
            F.regexp_like(
                F.col("path"), F.udf(robots_pattern_regex)("pattern")
            ).alias("m"),
        )
        for r in df.collect():
            want = bool(re.search(robots_pattern_regex(r["pattern"]), r["path"]))
            assert r["m"] == want, (r["pattern"], r["path"])


class TestDecisions:
    def _frames(self, spark):
        robots = spark.createDataFrame(
            [("h1.test", BODY), ("h2.test", "User-agent: *\nDisallow: /")],
            "host string, robots_txt string",
        )
        rules = robots_rules(robots, agent="megabot")
        pages = spark.createDataFrame(
            [
                ("http://h1.test/private/x",),   # disallowed
                ("http://h1.test/private/ok",),  # allow rule longer -> allowed
                ("http://h1.test/else",),        # no rule matches -> allowed
                ("http://h2.test/any",),         # blanket disallow
                ("http://h3.test/any",),         # no robots at all -> allowed
            ],
            "url string",
        )
        return pages, rules

    def test_longest_match_and_defaults(self, spark):
        pages, rules = self._frames(spark)
        dec = {r["url"]: r["allowed"] for r in robots_decisions(pages, rules).collect()}
        assert dec == {
            "http://h1.test/private/x": False,
            "http://h1.test/private/ok": True,
            "http://h1.test/else": True,
            "http://h2.test/any": False,
            "http://h3.test/any": True,
        }


    def test_noncanonical_rule_hosts_still_apply(self, spark):
        """Round-5 review regression: BOTH sides of the host join go
        through the canonicalizer. A rules frame keyed 'Example.COM' /
        'h2.test.' (trailing dot) / 'h1.test:443' must still block the
        canonical-host urls -- taking rules.host verbatim silently
        disabled every rule on that host (politeness violation)."""
        robots = spark.createDataFrame(
            [
                ("H1.TEST:443", "User-agent: *\nDisallow: /private"),
                ("h2.test.", "User-agent: *\nDisallow: /"),
            ],
            "host string, robots_txt string",
        )
        rules = robots_rules(robots)
        pages = spark.createDataFrame(
            [("http://h1.test/private/x",), ("http://h2.test/any",),
             ("http://h1.test/pub",)],
            "url string",
        )
        dec = {
            r["url"]: r["allowed"]
            for r in robots_decisions(pages, rules).collect()
        }
        assert dec == {
            "http://h1.test/private/x": False,
            "http://h2.test/any": False,
            "http://h1.test/pub": True,
        }

    def test_allow_wins_length_tie(self, spark):
        robots = spark.createDataFrame(
            [("h.test", "User-agent: *\nDisallow: /dir/\nAllow: /dirX/")],
            "host string, robots_txt string",
        )
        # craft equal-length patterns matching the same path via *
        robots = spark.createDataFrame(
            [("h.test", "User-agent: *\nDisallow: /p*\nAllow: /p*")],
            "host string, robots_txt string",
        )
        rules = robots_rules(robots)
        pages = spark.createDataFrame([("http://h.test/p1",)], "url string")
        [r] = robots_decisions(pages, rules).collect()
        assert r["allowed"] is True

    def test_filter_and_broadcast_path(self, spark):
        pages, rules = self._frames(spark)
        kept = {
            r["url"]
            for r in filter_robots_allowed(
                pages, rules, broadcast_rules=True
            ).collect()
        }
        assert kept == {
            "http://h1.test/private/ok",
            "http://h1.test/else",
            "http://h3.test/any",
        }

    def test_sitemaps(self, spark):
        robots = spark.createDataFrame(
            [("h1.test", BODY)], "host string, robots_txt string"
        )
        assert [
            (r["host"], r["sitemap_url"])
            for r in robots_sitemaps(robots).collect()
        ] == [("h1.test", "http://h.test/sitemap.xml")]

    def test_url_path_query(self, spark):
        df = spark.createDataFrame(
            [
                ("http://h.test",),
                ("http://h.test/a/b?q=1#frag",),
                ("https://u@h.test:8080/x",),
            ],
            "url string",
        ).select(url_path_query(F.col("url")).alias("p"))
        assert [r["p"] for r in df.collect()] == ["/", "/a/b?q=1", "/x"]

    def test_crawl_delays_frame(self, spark):
        robots = spark.createDataFrame(
            [
                ("h1.test", BODY),
                ("h2.test", "User-agent: *\nDisallow: /"),  # no delay
                ("h3.test", "User-agent: *\nCrawl-delay: 7"),
            ],
            "host string, robots_txt string",
        )
        got = {
            (r["host"], r["crawl_delay"])
            for r in robots_crawl_delays(robots, agent="megabot").collect()
        }
        assert got == {("h1.test", 2.5), ("h3.test", 7.0)}

    def test_robots_tables_single_pass_equivalence(self, spark):
        robots = spark.createDataFrame(
            [
                ("h1.test", BODY),
                ("h2.test", "User-agent: *\nCrawl-delay: 7"),  # no rules
                ("h3.test", "User-agent: *\nDisallow: /x"),  # no delay
            ],
            "host string, robots_txt string",
        )
        rules, delays = robots_tables(robots, agent="megabot")
        want_rules = {
            tuple(r) for r in robots_rules(robots, agent="megabot").collect()
        }
        assert {tuple(r) for r in rules.collect()} == want_rules
        want_delays = {
            tuple(r)
            for r in robots_crawl_delays(robots, agent="megabot").collect()
        }
        assert {tuple(r) for r in delays.collect()} == want_delays
        assert ("h2.test", 7.0) in want_delays  # delay-only host kept

def test_robots_tables_cache_lifecycle(spark):
    """Round-5 review regression: a persist=True call must hand the
    cache's lifetime to the caller via return_combined=True -- and
    next_frontier (the per-micro-batch loop caller) must not leave a
    cached robots parse behind per call."""
    from table_ocr_spark.pipelines import next_frontier

    robots = spark.createDataFrame(
        [("h.test", "User-agent: *\nDisallow: /private")],
        "host string, robots_txt string",
    )
    rules, delays, combined = robots_tables(robots, return_combined=True)
    assert combined.is_cached
    assert rules.count() == 1
    combined.unpersist()
    assert not combined.is_cached

    pages = spark.createDataFrame(
        [("http://h.test/p", '<a href="http://h.test/next">n</a>')],
        "url string, html string",
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    for audit in (False, True):
        plan, rep = next_frontier(pages, robots=robots, audit=audit)
        plan.count()
    assert jsc.getPersistentRDDs().size() <= before
