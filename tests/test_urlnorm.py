"""URL canonicalization: pinned semantics on crafted cases + the
canonical-keyed latest-capture dedup."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.operators.urlnorm import (
    canonical_url,
    latest_capture_canonical,
)

CASES = [
    # (input, expected canonical)
    ("HTTPS://WWW.Example.COM:443/Path/", "https://www.example.com/Path"),
    ("http://a.example:80/x?b=2&a=1", "http://a.example/x?a=1&b=2"),
    ("http://a.example:8080/x", "http://a.example:8080/x"),  # non-default port kept
    ("https://a.example/p?utm_source=tw&q=1&fbclid=zz", "https://a.example/p?q=1"),
    ("https://a.example/p?utm_source=tw", "https://a.example/p"),  # query emptied
    ("https://a.example/p#frag", "https://a.example/p"),
    ("https://a.example/", "https://a.example"),  # root slash == empty path
    ("https://a.example", "https://a.example"),
    ("not a url at all", "not a url at all"),  # unchanged: no scheme
    ("https://a.example/a/b/?x=1#f", "https://a.example/a/b?x=1"),
    # path case preserved, host case folded
    ("HtTp://HoSt.Ex/CaSe", "http://host.ex/CaSe"),
]


def test_canonical_url_pinned_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    for (u, want), g in zip(CASES, got):
        assert g == want, f"{u!r}: got {g!r}, want {want!r}"


def test_latest_capture_canonical(spark):
    t = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        ("https://A.example/doc?utm_source=x", t, "old"),
        ("https://a.example/doc", t + dt.timedelta(hours=1), "new"),
        ("https://a.example/other", t, "other"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = latest_capture_canonical(pages).collect()
    by_canon = {r["canonical_url"]: r for r in out}
    assert len(out) == 2
    assert by_canon["https://a.example/doc"]["text"] == "new"
    assert by_canon["https://a.example/other"]["text"] == "other"


def test_canonical_url_idempotent_and_deterministic(spark):
    # canonical(canonical(u)) == canonical(u): a non-idempotent
    # canonicalizer assigns a re-crawled (already-clean) url a different
    # key than its first crawl, silently splitting dedup groups.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    host = st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,12}", fullmatch=True)
    path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}/?", fullmatch=True)
    params = st.lists(
        st.from_regex(r"[a-z_]{1,8}(=[A-Za-z0-9]{0,6})?", fullmatch=True),
        max_size=4,
    )
    urls = st.builds(
        lambda s, h, p, q, frag: (
            s + "://" + h + p
            + ("?" + "&".join(q) if q else "")
            + ("#" + frag if frag else "")
        ),
        st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
        host,
        path,
        params,
        st.sampled_from(["", "top", "s 1"]),
    )

    collected = []

    @settings(max_examples=60, deadline=None)
    @given(st.lists(urls, min_size=1, max_size=8, unique=True))
    def chk(batch):
        collected.append(batch)

    chk()
    flat = sorted({u for b in collected for u in b})
    df = spark.createDataFrame([(u,) for u in flat], "url string")
    once = [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    df2 = spark.createDataFrame([(c,) for c in once], "url string")
    twice = [
        r["c"] for r in df2.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    for u, a, b in zip(flat, once, twice):
        assert a == b, f"not idempotent for {u!r}: {a!r} -> {b!r}"


def test_filter_blocked_hosts_list_and_frame(spark):
    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    rows = [
        (1, "https://good.example.com/a"),
        (2, "https://bad.com/x"),                 # exact block
        (3, "https://cdn.bad.com/y"),             # subdomain block
        (4, "https://notbad.com/z"),              # suffix NOT at label boundary
        (5, "HTTPS://BAD.COM/upper"),             # case-insensitive host
        (6, "not a url at all"),                  # hostless -> never blocked
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")

    kept = sorted(
        r["doc_id"]
        for r in filter_blocked_hosts(df, ["bad.com"]).collect()
    )
    assert kept == [1, 4, 6]
    # output schema = input schema (audit columns dropped on filter)
    assert filter_blocked_hosts(df, ["bad.com"]).columns == ["doc_id", "url"]

    audit = {
        r["doc_id"]: r
        for r in filter_blocked_hosts(
            df, ["bad.com"], keep_blocked=True
        ).collect()
    }
    assert audit[3]["blocked"] and audit[3]["blocked_domain"] == "bad.com"
    assert audit[1]["blocked"] is False and audit[1]["blocked_domain"] is None

    # DataFrame blocklist form: same verdicts, host-equi-join plan
    bl = spark.createDataFrame([("bad.com",)], "host string")
    kept2 = sorted(
        r["doc_id"] for r in filter_blocked_hosts(df, bl).collect()
    )
    assert kept2 == [1, 4, 6]
    audit2 = {
        r["doc_id"]: r
        for r in filter_blocked_hosts(df, bl, keep_blocked=True).collect()
    }
    assert audit2[5]["blocked"] and audit2[2]["blocked_domain"] == "bad.com"

    # include_subdomains=False: only the exact host matches
    kept3 = sorted(
        r["doc_id"]
        for r in filter_blocked_hosts(
            df, ["bad.com"], include_subdomains=False
        ).collect()
    )
    assert kept3 == [1, 3, 4, 6]


def test_filter_blocked_hosts_empty_list_noop(spark):
    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [(1, "https://a.com/x")], "doc_id long, url string"
    )
    assert filter_blocked_hosts(df, []).count() == 1


def test_filter_blocked_hosts_port_and_userinfo_cannot_bypass(spark):
    # review r3: host_of returns the raw authority; without stripping
    # userinfo/port any blocked domain passed the filter via
    # 'bad.com:443' or 'x@bad.com' — a filter a url author can route
    # around is not a filter
    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [
            (1, "https://bad.com:8080/x"),
            (2, "https://evil@bad.com/y"),
            (3, "https://u:p@sub.bad.com:443/z"),
            (4, "https://good.com:8080/ok"),
        ],
        "doc_id long, url string",
    )
    audit = {
        r["doc_id"]: r
        for r in filter_blocked_hosts(df, ["bad.com"], keep_blocked=True).collect()
    }
    assert audit[1]["blocked"] and audit[1]["host"] == "bad.com"
    assert audit[2]["blocked"] and audit[2]["host"] == "bad.com"
    assert audit[3]["blocked"] and audit[3]["host"] == "sub.bad.com"
    assert audit[4]["blocked"] is False and audit[4]["host"] == "good.com"


def test_filter_blocked_hosts_preserves_input_columns(spark):
    # review r3: an input already carrying a 'host' column was silently
    # clobbered (filter path) — now untouched on filter, raises on audit
    import pytest

    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [(1, "https://good.com/a", "caller-host")],
        "doc_id long, url string, host string",
    )
    out = filter_blocked_hosts(df, ["bad.com"]).collect()
    assert out[0]["host"] == "caller-host"
    assert filter_blocked_hosts(df, ["bad.com"]).columns == df.columns
    with pytest.raises(ValueError, match="collide"):
        filter_blocked_hosts(df, ["bad.com"], keep_blocked=True)


def test_filter_blocked_hosts_canonicalization_bypasses(spark):
    # review r3 pass 2: double-@ (browsers split on LAST @), trailing
    # dot (DNS-identical), percent-encoded dot — all must still block
    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [
            (1, "https://x@y@bad.com/p"),
            (2, "https://bad.com./p"),
            (3, "https://bad%2Ecom/p"),
            (4, "https://ok.com/p"),
        ],
        "doc_id long, url string",
    )
    for blocklist in (["bad.com"], spark.createDataFrame([("bad.com",)], "h string")):
        audit = {
            r["doc_id"]: r
            for r in filter_blocked_hosts(df, blocklist, keep_blocked=True).collect()
        }
        assert audit[1]["blocked"] and audit[1]["host"] == "bad.com"
        assert audit[2]["blocked"] and audit[2]["host"] == "bad.com"
        assert audit[3]["blocked"] and audit[3]["host"] == "bad.com"
        assert audit[4]["blocked"] is False


def test_blocklist_entries_are_canonicalized_too(spark):
    # review r3 pass 3: canonicalizing only the host side is just a
    # different bypass — UT1-style dumps carry trailing-dot entries
    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [(1, "https://bad.com/p"), (2, "https://ok.com/p")],
        "doc_id long, url string",
    )
    for entry in ("bad.com.", "BAD.COM", "bad%2Ecom"):
        for blocklist in ([entry], spark.createDataFrame([(entry,)], "h string")):
            audit = {
                r["doc_id"]: r
                for r in filter_blocked_hosts(
                    df, blocklist, keep_blocked=True
                ).collect()
            }
            assert audit[1]["blocked"], entry
            assert audit[1]["blocked_domain"] == "bad.com", entry
            assert audit[2]["blocked"] is False


def test_blocklist_empty_canonical_entries_are_ignored(spark):
    # ADVICE r4: entries that canonicalize to '' ('.', ':80', 'user@')
    # must not match the '' host that host_canonical yields for
    # schemeless/unparseable urls — that would silently drop every
    # such row
    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [(1, "not a url at all"), (2, "relative/path.html"),
         (3, "http://bad.com/x"), (4, "http://fine.org/")],
        "doc_id long, url string",
    )
    junk = [".", "...", ":80", "user@", "bad.com"]
    for blocklist in (junk, spark.createDataFrame([(b,) for b in junk], "host string")):
        kept = {r["doc_id"] for r in filter_blocked_hosts(df, blocklist).collect()}
        assert kept == {1, 2, 4}, type(blocklist)
        audit = {
            r["doc_id"]: r
            for r in filter_blocked_hosts(df, blocklist, keep_blocked=True).collect()
        }
        assert audit[1]["blocked"] is False and audit[2]["blocked"] is False
        assert audit[3]["blocked_domain"] == "bad.com"


def test_registrable_domain_matches_python_psl_twin(spark):
    # full PSL rule-class sweep: exact multi-label, wildcard,
    # exception, private-section, default rule, IP, public-suffix
    # hosts — Spark expression vs the pure-Python algorithm twin
    from pyspark.sql import functions as F

    from table_ocr_spark.operators.urlnorm import registrable_domain
    from table_ocr_spark.psl_snapshot import registrable_domain_py

    hosts = [
        "blog.foo.com", "shop.foo.com", "foo.com", "com",
        "a.github.io", "x.a.github.io", "github.io",
        "b.co.uk", "a.b.co.uk", "co.uk", "x.sch.uk", "a.x.sch.uk",
        "www.ck", "foo.www.ck", "x.ck", "a.x.ck",
        "city.kawasaki.jp", "x.city.kawasaki.jp",
        "foo.kawasaki.jp", "a.foo.kawasaki.jp", "co.jp", "t.co.jp",
        "1.2.3.4", "", "a.b.c.d.e.example.org",
        # IP-like edge cases (review r4: the twins diverged here —
        # pinned to four nonempty all-ASCII-digit labels on BOTH sides)
        "1234.5.6.7", "999.999.999.999", "1.2.3.4.5", "1.2.3",
        "1.2.3.com", "١٢٣.٤.٥.٦",
        # leading-dot malformed hosts (review r4: py strip('.') vs the
        # Spark canonicalizer's trailing-only strip diverged here)
        ".co.uk", ".1.2.3.4", ".foo.com", "..foo.com",
        "x.blogspot.com", "deep.x.blogspot.com",
        "example", "a.example", "trailing.dot.com.",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["rd"] for r in df.select(
        "host",
        registrable_domain(F.col("host"), host_input=True).alias("rd"),
    ).collect()}
    for h in hosts:
        assert got[h] == registrable_domain_py(h), h


def test_registrable_domain_from_url(spark):
    from pyspark.sql import functions as F

    from table_ocr_spark.operators.urlnorm import registrable_domain

    df = spark.createDataFrame(
        [("HTTPS://Blog.Example.CO.UK:443/x?y=1",),
         ("https://user@sub.deep.foo.com/p",),
         ("not a url",)],
        "url string",
    )
    got = [r["rd"] for r in df.select(
        registrable_domain(F.col("url")).alias("rd")).collect()]
    assert got == ["example.co.uk", "foo.com", None]


def test_block_registrable_widens_entries(spark):
    from table_ocr_spark.operators.urlnorm import filter_blocked_hosts

    df = spark.createDataFrame(
        [(1, "https://www.bad.co.uk/x"), (2, "https://other.co.uk/y"),
         (3, "https://clean.org/z")],
        "doc_id long, url string",
    )
    deep_entry = ["tracker.ads.bad.co.uk"]
    for bl in (deep_entry,
               spark.createDataFrame([(deep_entry[0],)], "host string")):
        # without widening, www.bad.co.uk is not under the deep entry
        kept = {r["doc_id"]
                for r in filter_blocked_hosts(df, bl).collect()}
        assert kept == {1, 2, 3}, type(bl)
        # widened to bad.co.uk, the whole site is blocked
        kept_w = {r["doc_id"] for r in filter_blocked_hosts(
            df, bl, block_registrable=True).collect()}
        assert kept_w == {2, 3}, type(bl)


# ---------------------------------------------------------------------------
# link graph (operators/linkgraph.py)
# ---------------------------------------------------------------------------


class TestLinkGraph:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        rows = [
            (
                "http://a.foo.com/p1",
                '<a href="http://b.bar.org/x">t</a> <a href="/rel">r</a> '
                '<a href="HTTPS://c.baz.net:8080/y">u</a> '
                '<a href="http://a.foo.com/self">s</a>',
            ),
            (
                "http://blog.foo.com/p2",
                '<a href="http://b.bar.org/z">t</a>',
            ),
            ("http://b.bar.org/p", '<a href="mailto:x@y.z">m</a>'),
            ("http://empty.foo.com/p", None),
        ]
        return spark.createDataFrame(rows, "url string, html string")

    def test_extract_links_absolute_only_with_total(self, pages):
        from table_ocr_spark.operators.linkgraph import extract_links

        rows = extract_links(pages).collect()
        by_url = {}
        for r in rows:
            by_url.setdefault(r.url, []).append(r)
        p1 = by_url["http://a.foo.com/p1"]
        # 4 anchors total, 3 absolute (the relative one is counted
        # but not emitted); scheme match is case-insensitive
        assert p1[0].n_links_total == 4 and len(p1) == 3
        assert {r.href for r in p1} == {
            "http://b.bar.org/x",
            "HTTPS://c.baz.net:8080/y",
            "http://a.foo.com/self",
        }
        # NULL html and mailto-only pages emit no link rows
        assert "http://empty.foo.com/p" not in by_url
        assert "http://b.bar.org/p" not in by_url

    def test_host_graph_and_authority(self, pages):
        from table_ocr_spark.operators.linkgraph import (
            host_authority,
            host_link_graph,
        )

        g = host_link_graph(pages)
        edges = {(r.src_host, r.dst_host): r.n_links for r in g.collect()}
        # port stripped, host lowercased; self-link kept in edge list
        assert edges[("a.foo.com", "c.baz.net")] == 1
        assert edges[("a.foo.com", "a.foo.com")] == 1
        auth = {r.host: r for r in host_authority(g).collect()}
        # distinct-referrer in-degree: two different src hosts
        assert auth["b.bar.org"].in_hosts == 2
        assert auth["b.bar.org"].in_links == 2
        # self-link excluded from authority in BOTH directions
        assert auth["a.foo.com"].out_hosts == 2
        assert auth["a.foo.com"].in_hosts == 0

    def test_site_level_collapses_subdomains(self, pages):
        from table_ocr_spark.operators.linkgraph import host_link_graph

        g = host_link_graph(pages, level="site")
        edges = {(r.src_host, r.dst_host): r.n_links for r in g.collect()}
        # a.foo.com and blog.foo.com collapse onto foo.com; their
        # two bar.org links merge into one edge
        assert edges[("foo.com", "bar.org")] == 2
        assert ("blog.foo.com", "bar.org") not in edges
        # the self-link collapses to a foo.com self-edge (kept)
        assert edges[("foo.com", "foo.com")] == 1

    def test_bad_level_rejected(self, pages):
        from table_ocr_spark.operators.linkgraph import host_link_graph

        with pytest.raises(ValueError):
            host_link_graph(pages, level="domain")


class TestHostPageRank:
    """host_pagerank vs closed forms and a dense numpy twin (ranks
    are float iterates — tolerance compares, never hashes)."""

    def _graph(self, spark, rows):
        return spark.createDataFrame(
            rows, "src_host string, dst_host string, n_links long"
        )

    def test_cycle_is_uniform(self, spark):
        from table_ocr_spark.operators.linkgraph import host_pagerank

        hosts = [f"h{i}.test" for i in range(4)]
        g = self._graph(
            spark,
            [(hosts[i], hosts[(i + 1) % 4], 1) for i in range(4)],
        )
        ranks = {r.host: r.rank for r in host_pagerank(g).collect()}
        assert set(ranks) == set(hosts)
        for v in ranks.values():
            assert abs(v - 0.25) < 1e-9
        assert abs(sum(ranks.values()) - 1.0) < 1e-9

    def test_dangling_and_self_edges(self, spark):
        from table_ocr_spark.operators.linkgraph import host_pagerank

        # sink.test has no out-edge (dangling); loner.test appears
        # only in a self-edge (excluded, but the host keeps a row)
        g = self._graph(
            spark,
            [
                ("a.test", "sink.test", 3),
                ("b.test", "sink.test", 1),
                ("loner.test", "loner.test", 5),
            ],
        )
        ranks = {r.host: r.rank for r in host_pagerank(g).collect()}
        assert set(ranks) == {"a.test", "b.test", "sink.test", "loner.test"}
        assert abs(sum(ranks.values()) - 1.0) < 1e-9
        # the endorsed sink outranks its (teleport-only) endorsers,
        # and the self-vouching loner gains nothing over them
        assert ranks["sink.test"] > ranks["a.test"]
        assert abs(ranks["loner.test"] - ranks["a.test"]) < 1e-9

    @pytest.mark.parametrize("weighted", [False, True])
    def test_differential_vs_dense_numpy(self, spark, weighted):
        import random

        import numpy as np

        from table_ocr_spark.operators.linkgraph import host_pagerank

        rng = random.Random(20260819)
        n = 30
        hosts = [f"n{i}.test" for i in range(n)]
        pairs = set()
        while len(pairs) < 150:
            s, t = rng.randrange(n), rng.randrange(n)
            pairs.add((s, t))  # self-pairs included on purpose
        edges = [(s, t, rng.randrange(1, 6)) for s, t in sorted(pairs)]
        g = self._graph(
            spark, [(hosts[s], hosts[t], w) for s, t, w in edges]
        )

        # dense twin with identical semantics: self-edges excluded,
        # uniform-over-distinct-neighbors or n_links-proportional
        # weights, dangling mass spread uniformly
        W = np.zeros((n, n))
        for s, t, w in edges:
            if s != t:
                W[s, t] = 1.0 if not weighted else w
        out = W.sum(axis=1) if weighted else (W > 0).sum(axis=1)
        P = np.divide(
            W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0
        )
        # compare the exact 25th iterate on both sides (tol pinned
        # unreachably low) — same map, same start, so every iterate
        # must agree; full convergence would cost ~170 Spark rounds
        # for no extra differential power
        d, r = 0.85, np.full(n, 1.0 / n)
        for _ in range(25):
            dmass = r[out == 0].sum()
            r = (1 - d) / n + d * (r @ P + dmass / n)

        got = {
            row.host: row.rank
            for row in host_pagerank(
                g, max_iters=25, tol=1e-300, weighted=weighted
            ).collect()
        }
        assert len(got) == n
        for i, h in enumerate(hosts):
            assert abs(got[h] - r[i]) < 1e-8, (h, got[h], r[i])

    def test_personalized_teleport_vs_numpy(self, spark):
        """Personalized PageRank: teleport mass on a seed set — the
        focused-crawl variant. Differential vs the dense twin with
        the same teleport vector at the exact 20th iterate, plus the
        seed-proximity property."""
        import random

        import numpy as np

        from table_ocr_spark.operators.linkgraph import host_pagerank

        rng = random.Random(4)
        n = 24
        hosts = [f"n{i}.test" for i in range(n)]
        pairs = set()
        while len(pairs) < 90:
            pairs.add((rng.randrange(n), rng.randrange(n)))
        edges = [(s, t, rng.randrange(1, 4)) for s, t in sorted(pairs)]
        g = self._graph(
            spark, [(hosts[s], hosts[t], w) for s, t, w in edges]
        )
        # teleport weights on a third of the hosts (unnormalized on
        # purpose — the operator normalizes), absent hosts weigh 0
        seeds = {i: float(rng.randrange(1, 9)) for i in range(0, n, 3)}
        tp = spark.createDataFrame(
            [(hosts[i], w) for i, w in seeds.items()],
            "host string, weight double",
        )

        W = np.zeros((n, n))
        for s, t, w in edges:
            if s != t:
                W[s, t] = 1.0
        out = (W > 0).sum(axis=1)
        P = np.divide(
            W, out[:, None], out=np.zeros_like(W), where=out[:, None] > 0
        )
        tvec = np.array([seeds.get(i, 0.0) for i in range(n)])
        tvec = tvec / tvec.sum()
        d, r = 0.85, tvec.copy()
        for _ in range(20):
            dmass = r[out == 0].sum()
            r = (1 - d) * tvec + d * (r @ P + dmass * tvec)

        got = {
            row.host: row.rank
            for row in host_pagerank(
                g, max_iters=20, tol=1e-300, teleport=tp
            ).collect()
        }
        assert len(got) == n
        for i, h in enumerate(hosts):
            assert abs(got[h] - r[i]) < 1e-8, (h, got[h], r[i])
        # seed proximity: a zero-teleport host with no in-edges from
        # the walk holds rank 0 under personalization (vs >0 global)
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_teleport_validation(self, spark):
        from table_ocr_spark.operators.linkgraph import host_pagerank

        g = self._graph(spark, [("a.test", "b.test", 1)])
        bad_neg = g.sparkSession.createDataFrame(
            [("a.test", -1.0)], "host string, weight double"
        )
        with pytest.raises(ValueError, match="non-negative"):
            host_pagerank(g, teleport=bad_neg)
        # sign errors must not slip past the join (off-graph host) or
        # the duplicate-row max (review regression)
        off_neg = g.sparkSession.createDataFrame(
            [("a.test", 2.0), ("elsewhere.test", -5.0)],
            "host string, weight double",
        )
        with pytest.raises(ValueError, match="non-negative"):
            host_pagerank(g, teleport=off_neg)
        dup_neg = g.sparkSession.createDataFrame(
            [("a.test", 3.0), ("a.test", -1.0)],
            "host string, weight double",
        )
        with pytest.raises(ValueError, match="non-negative"):
            host_pagerank(g, teleport=dup_neg)
        # weights only on hosts absent from the graph vanish
        off_graph = g.sparkSession.createDataFrame(
            [("elsewhere.test", 5.0)], "host string, weight double"
        )
        with pytest.raises(ValueError, match="vanish"):
            host_pagerank(g, teleport=off_graph)

    def test_param_validation_and_empty(self, spark):
        from table_ocr_spark.operators.linkgraph import host_pagerank

        g = self._graph(spark, [])
        assert host_pagerank(g).count() == 0
        g2 = self._graph(spark, [("a.test", "b.test", 1)])
        with pytest.raises(ValueError):
            host_pagerank(g2, damping=1.0)
        with pytest.raises(ValueError):
            host_pagerank(g2, max_iters=0)


class TestAnchorText:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        rows = [
            (
                "http://src1.test/p",
                # closed external anchor with attrs + messy case/space;
                # unclosed anchor skipped; nested markup skipped;
                # relative skipped; empty-after-trim skipped
                '<a href="http://t.test/a" rel="nofollow"> Good DOCS \t</a>'
                '<a href="http://t.test/b">no close'
                '<a href="http://t.test/c"><b>nested</b></a>'
                '<a href="/rel">rel text</a>'
                '<a href="http://t.test/d">  </a>'
                '<a href="http://t.test/e">good docs</a>',
            ),
            (
                "http://src2.test/p",
                '<a href="http://t.test/f">good docs</a>'
                '<a href="http://t.test/g">api guide</a>'
                # self-link text must not count
                '<a href="http://src2.test/self">me</a>',
            ),
            # tie-break: host u.test gets 'alpha' and 'beta' once each
            (
                "http://src3.test/p",
                '<a href="http://u.test/x">beta</a>'
                '<a href="http://u.test/y">alpha</a>',
            ),
        ]
        return spark.createDataFrame(rows, "url string, html string")

    def test_extract_anchor_texts_pinned_semantics(self, pages):
        from table_ocr_spark.operators.linkgraph import extract_anchor_texts

        rows = extract_anchor_texts(pages).collect()
        got = {(r.href, r.anchor_text) for r in rows}
        assert ("http://t.test/a", "good docs") in got
        assert ("http://t.test/e", "good docs") in got
        # unclosed / nested / relative / empty all absent
        assert not any(h.endswith(("/b", "/c", "/d")) for h, _ in got)
        assert not any(h == "/rel" for h, _ in got)

    def test_anchor_text_signals_modal_and_ties(self, pages):
        from table_ocr_spark.operators.linkgraph import anchor_text_signals

        sig = {r.host: r for r in anchor_text_signals(pages).collect()}
        t = sig["t.test"]
        # 'good docs' ×3 (two sources), 'api guide' ×1; self 'me' excluded
        assert t.n_anchors == 4
        assert t.n_anchor_texts == 2
        assert t.top_anchor_text == "good docs"
        u = sig["u.test"]
        assert u.n_anchors == 2 and u.n_anchor_texts == 2
        assert u.top_anchor_text == "alpha"  # tie → lexicographic
        assert "src2.test" not in sig  # self-only target never appears


class TestNofollowAndScoping:
    @pytest.fixture(scope="class")
    def pages(self, spark):
        rows = [
            (
                "http://s.test/p",
                # head <link href> must NOT count as an anchor
                '<link rel="canonical" href="http://canon.test/c">'
                '<a href="http://f.test/a">follow</a>'
                '<a href="http://n.test/b" rel="nofollow">paid</a>'
                '<a rel="ugc nofollow" href="http://n.test/c">ugc</a>'
                '<a href="/rel" rel="nofollow">r</a>',
            ),
        ]
        return spark.createDataFrame(rows, "url string, html string")

    def test_scoped_and_flagged(self, pages):
        from table_ocr_spark.operators.linkgraph import extract_links

        rows = extract_links(pages).collect()
        got = {r.href: r.nofollow for r in rows}
        assert got == {
            "http://f.test/a": False,
            "http://n.test/b": True,
            "http://n.test/c": True,  # rel before href, multi-token
        }
        # n_links_total counts the 4 <a href> tags, not the <link>
        assert rows[0].n_links_total == 4

    def test_respect_nofollow_graph(self, pages):
        from table_ocr_spark.operators.linkgraph import host_link_graph

        g = {(r.src_host, r.dst_host) for r in
             host_link_graph(pages, respect_nofollow=True).collect()}
        assert g == {("s.test", "f.test")}
        g2 = {r.dst_host for r in host_link_graph(pages).collect()}
        assert g2 == {"f.test", "n.test"}


class TestAnchorRegexRobustness:
    """Round-5 review regressions: the pinned anchor regexes must see
    legacy-case and pretty-printed anchors that real crawl HTML is
    full of, agree with each other on the same page, and not
    false-positive on data-rel/xml:rel attributes."""

    @pytest.fixture(scope="class")
    def pages(self, spark):
        rows = [
            (
                "http://s.test/p",
                # uppercase tag+attr; newline/tab after the tag name;
                # data-rel must NOT read as nofollow; plain lowercase
                '<A HREF="http://legacy.test/a">OLD</A>'
                '<a\n  href="http://pretty.test/b">pretty</a>'
                '<a\thref="http://tab.test/c">tab</a>'
                '<a href="http://x.test/d" data-rel="nofollow-popup">d</a>'
                '<a href="http://y.test/e" rel="NOFOLLOW">e</a>',
            ),
        ]
        return spark.createDataFrame(rows, "url string, html string")

    def test_case_and_whitespace_anchors_extracted(self, pages):
        from table_ocr_spark.operators.linkgraph import extract_links

        rows = extract_links(pages).collect()
        got = {r.href: r.nofollow for r in rows}
        assert got == {
            "http://legacy.test/a": False,
            "http://pretty.test/b": False,
            "http://tab.test/c": False,
            "http://x.test/d": False,  # data-rel is not rel
            "http://y.test/e": True,  # case-insensitive nofollow
        }
        assert rows[0].n_links_total == 5

    def test_anchor_text_agrees_with_extract_links(self, pages):
        from table_ocr_spark.operators.linkgraph import (
            extract_anchor_texts,
        )

        # ANCHOR_TEXT_RE requires href FIRST in the blob (its pinned
        # shape) but must match the case/whitespace variants of that
        # shape that extract_links counts
        texts = {
            r.href: r.anchor_text
            for r in extract_anchor_texts(pages).collect()
        }
        assert texts["http://pretty.test/b"] == "pretty"
        assert texts["http://tab.test/c"] == "tab"
        assert texts["http://legacy.test/a"] == "old"  # lowercased

    def test_pinned_constants_compile_in_python_re(self):
        import re

        from table_ocr_spark.operators import linkgraph as lg

        # the three-dialect pin: every pinned constant must compile in
        # Python re too (a mid-pattern global flag raises on 3.11+)
        for pat in (
            lg.ANCHOR_TAG_RE,
            lg.ANCHOR_HREF_RE,
            lg.NOFOLLOW_RE,
            lg._ABS_RE,
            lg.ANCHOR_TEXT_RE,
            lg.BASE_HREF_RE,
        ):
            re.compile(pat)

class TestResolveHref:
    """RFC 3986 §5.2 reference resolution — differential against
    urllib.parse.urljoin, plus the pinned frontier deviations."""

    BASES = [
        "http://a.test/b/c",
        "http://a.test/b/c/",
        "https://a.test",
        "http://a.test/b/c?q=9",
        # urljoin lowercases the scheme (only) in relative resolutions
        "HTTP://A.test/B/c",
    ]
    HREFS = [
        "d", "d/e", "./d", "../d", "../../d", "../../../../d",
        "/x", "/x/../y", "/a/.", "d/./e", "..", ".", "d?x=1&y=2",
        "?z=3", "http://other.test/p", "https://o.test/a/../b",
        "//h.test/p/q", "x;p=1", "d%20e", "/", "a..b/c", "x..",
    ]

    def test_differential_vs_urljoin(self, spark):
        from urllib.parse import urljoin

        from table_ocr_spark.operators.linkgraph import resolve_href

        rows = [(b, h) for b in self.BASES for h in self.HREFS]
        df = spark.createDataFrame(rows, "base string, href string")
        got = (
            df.select(
                "base", "href",
                resolve_href(F.col("base"), F.col("href")).alias("r"),
            )
        ).collect()
        for r in got:
            want = urljoin(r["base"], r["href"])
            assert r["r"] == want, (r["base"], r["href"], r["r"], want)

    @pytest.mark.parametrize(
        "base,href,want",
        [
            # pinned deviations from urljoin: self-references and
            # non-fetchable schemes yield NULL, fragments strip
            ("http://a.test/b", "", None),
            ("http://a.test/b", "#top", None),
            ("http://a.test/b", "mailto:x@y.z", None),
            ("http://a.test/b", "javascript:void(0)", None),
            ("http://a.test/b", "data:text/plain,hi", None),
            ("http://a.test/b", "d#frag", "http://a.test/d"),
            ("http://a.test/b", "http://o.test/p#f", "http://o.test/p"),
            # unparseable base
            ("not a url", "d", None),
            # whitespace-padded hrefs trim
            ("http://a.test/b/", "  d  ", "http://a.test/b/d"),
            # ftp passes resolution (the frontier filters schemes)
            ("http://a.test/b", "ftp://f.test/x", "ftp://f.test/x"),
        ],
    )
    def test_pinned_deviations(self, spark, base, href, want):
        from table_ocr_spark.operators.linkgraph import resolve_href

        [r] = (
            spark.createDataFrame([(base, href)], "base string, href string")
            .select(resolve_href(F.col("base"), F.col("href")).alias("r"))
            .collect()
        )
        assert r["r"] == want, (base, href, r["r"], want)

    def test_extract_links_all_hrefs_mode(self, spark):
        from table_ocr_spark.operators.linkgraph import extract_links

        pages = spark.createDataFrame(
            [
                (
                    "http://a.test/d/p",
                    '<a href="http://abs.test/x">a</a>'
                    '<a href="rel/y">r</a><a href="/root">s</a>',
                )
            ],
            "url string, html string",
        )
        assert extract_links(pages).count() == 1  # default: absolute
        rows = extract_links(pages, absolute_only=False).collect()
        assert {r["href"] for r in rows} == {
            "http://abs.test/x", "rel/y", "/root",
        }
        assert all(r["n_links_total"] == 3 for r in rows)

    def test_base_tag_resolution(self, spark):
        from table_ocr_spark.operators.linkgraph import (
            effective_base,
            extract_links,
        )

        pages = spark.createDataFrame(
            [
                # absolute base: links resolve against it
                ("http://a.test/d/p",
                 '<base href="http://b.test/x/"><a href="r">r</a>'),
                # relative base: itself resolves against the page url
                ("http://a.test/d/p",
                 '<base href="sub/"><a href="r2">r</a>'),
                # no base tag: page url is the base
                ("http://a.test/d/p", '<a href="r3">r</a>'),
                # second base tag ignored (spec: first wins)
                ("http://a.test/d/p",
                 '<base href="http://one.test/"><base href="http://two.test/">'
                 '<a href="r4">r</a>'),
                # garbage base falls back to the page url
                ("http://a.test/d/p",
                 '<base href="#frag"><a href="r5">r</a>'),
            ],
            "url string, html string",
        )
        links = extract_links(
            pages, absolute_only=False, with_base=True
        ).collect()
        from table_ocr_spark.operators.linkgraph import resolve_href as rh
        resolved = {
            r["href"]: r["base_url"] for r in links
        }
        assert resolved["r"] == "http://b.test/x/"
        assert resolved["r2"] == "http://a.test/d/sub/"
        assert resolved["r3"] == "http://a.test/d/p"
        assert resolved["r4"] == "http://one.test/"
        assert resolved["r5"] == "http://a.test/d/p"

    def test_base_tag_through_next_frontier(self, spark):
        from table_ocr_spark.pipelines import next_frontier

        pages = spark.createDataFrame(
            [("http://a.test/d/p",
              '<base href="http://cdn.test/assets/"><a href="x">l</a>')],
            "url string, html string",
        )
        plan, _ = next_frontier(pages, workers=2)
        assert [r["url"] for r in plan.collect()] == [
            "http://cdn.test/assets/x"
        ]
