"""Redirect-chain resolution: edge derivation from captures, pointer-
doubling walk vs a pure-Python reference walker, loop/bound semantics,
and the pages annotation join."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from table_ocr_spark.operators.redirects import (
    REDIRECT_STATUSES,
    annotate_final_urls,
    redirect_edges,
    resolve_redirects,
)


def _walk_reference(edges: dict, max_hops: int):
    """Hop-by-hop reference implementation of the pinned semantics."""
    out = {}
    for src in edges:
        cur, hops = src, 0
        while cur in edges and hops < max_hops:
            cur = edges[cur]
            hops += 1
        if cur in edges:  # still redirecting after max_hops
            out[src] = (None, None, True)
        else:
            out[src] = (cur, hops, False)
    return out


class TestRedirectEdges:
    def test_filter_resolve_and_argmax(self, spark):
        caps = spark.createDataFrame(
            [
                # chain hop, absolute Location
                Row(url="http://a.test/1", http_status=301,
                    redirect_location="http://a.test/2", ts="2026-01-02"),
                # older capture of the same src: loses the ts argmax
                Row(url="http://a.test/1", http_status=302,
                    redirect_location="http://stale.test/", ts="2026-01-01"),
                # relative Location resolves against the capture url
                Row(url="http://a.test/dir/page", http_status=302,
                    redirect_location="../x", ts="2026-01-01"),
                # root-relative
                Row(url="http://b.test/p", http_status=308,
                    redirect_location="/q", ts="2026-01-01"),
                # non-redirect status: dropped
                Row(url="http://c.test/", http_status=200,
                    redirect_location="http://c.test/x", ts="2026-01-01"),
                # blank location: dropped
                Row(url="http://d.test/", http_status=301,
                    redirect_location="   ", ts="2026-01-01"),
                # non-fetchable location: dropped (resolve_href NULLs it)
                Row(url="http://e.test/", http_status=301,
                    redirect_location="javascript:void(0)", ts="2026-01-01"),
            ]
        )
        got = {
            r["src"]: r["dst"]
            for r in redirect_edges(caps, ts_col="ts").collect()
        }
        assert got == {
            "http://a.test/1": "http://a.test/2",
            "http://a.test/dir/page": "http://a.test/x",
            "http://b.test/p": "http://b.test/q",
        }

    def test_without_ts_max_dst_is_deterministic(self, spark):
        caps = spark.createDataFrame(
            [
                Row(url="http://a.test/", http_status=301,
                    redirect_location="http://z.test/"),
                Row(url="http://a.test/", http_status=301,
                    redirect_location="http://b.test/"),
            ]
        )
        got = redirect_edges(caps).collect()
        assert len(got) == 1 and got[0]["dst"] == "http://z.test/"

    def test_all_redirect_statuses_kept(self, spark):
        caps = spark.createDataFrame(
            [
                Row(url=f"http://s{code}.test/", http_status=code,
                    redirect_location="http://t.test/")
                for code in REDIRECT_STATUSES
            ]
            + [
                Row(url="http://s300.test/", http_status=300,
                    redirect_location="http://t.test/"),
                Row(url="http://s304.test/", http_status=304,
                    redirect_location="http://t.test/"),
            ]
        )
        assert redirect_edges(caps).count() == len(REDIRECT_STATUSES)


class TestResolveRedirects:
    def _run(self, spark, edges: dict, max_hops: int):
        df = spark.createDataFrame(
            [Row(src=s, dst=d) for s, d in edges.items()]
        )
        got = {
            r["url"]: (r["final_url"], r["hops"], r["redirect_loop"])
            for r in resolve_redirects(df, max_hops=max_hops).collect()
        }
        assert got == _walk_reference(edges, max_hops)
        return got

    def test_chains_cycles_self_loops(self, spark):
        edges = {
            # chain of 3 → terminal "t"
            "a": "b", "b": "c", "c": "t",
            # 2-cycle
            "p": "q", "q": "p",
            # self-loop
            "s": "s",
            # chain feeding INTO the cycle
            "f": "p",
            # single hop
            "x": "y",
        }
        got = self._run(spark, edges, max_hops=32)
        assert got["a"] == ("t", 3, False)
        assert got["p"] == (None, None, True)
        assert got["s"] == (None, None, True)
        assert got["f"] == (None, None, True)
        assert got["x"] == ("y", 1, False)

    def test_max_hops_boundary_exact_and_over(self, spark):
        # chain of length 8: n0→n1→...→n8 (terminal)
        edges = {f"n{i}": f"n{i+1}" for i in range(8)}
        got = self._run(spark, edges, max_hops=8)
        assert got["n0"] == ("n8", 8, False)  # exactly max_hops: resolved
        got = self._run(spark, edges, max_hops=7)
        assert got["n0"] == (None, None, True)  # one over: loop-flagged
        assert got["n1"] == ("n8", 7, False)

    def test_max_hops_one(self, spark):
        edges = {"a": "b", "b": "c", "c": "d"}
        got = self._run(spark, edges, max_hops=1)
        assert got == {
            "a": (None, None, True),
            "b": (None, None, True),
            "c": ("d", 1, False),
        }

    def test_max_hops_validation(self, spark):
        df = spark.createDataFrame([Row(src="a", dst="b")])
        with pytest.raises(ValueError, match="max_hops"):
            resolve_redirects(df, max_hops=0)

    def test_randomized_graph_vs_reference(self, spark):
        # deterministic pseudo-random functional graph: successor by
        # affine hash, ~30% of nodes terminal (no outgoing edge)
        n = 400
        edges = {}
        for i in range(n):
            if (i * 2654435761) % 10 < 3:
                continue  # terminal
            edges[f"u{i}"] = f"u{(i * 131 + 7) % n}"
        self._run(spark, edges, max_hops=32)


class TestAnnotate:
    def test_pages_left_join_defaults(self, spark):
        pages = spark.createDataFrame(
            [Row(url="http://a.test/1", text="x"),
             Row(url="http://ok.test/", text="y")]
        )
        resolved = spark.createDataFrame(
            [Row(url="http://a.test/1", final_url="http://a.test/t",
                 hops=2, redirect_loop=False)]
        )
        got = {
            r["url"]: (r["final_url"], r["hops"], r["redirect_loop"])
            for r in annotate_final_urls(pages, resolved).collect()
        }
        assert got["http://a.test/1"] == ("http://a.test/t", 2, False)
        assert got["http://ok.test/"] == ("http://ok.test/", 0, False)

    def test_reannotating_annotated_frame_raises(self, spark):
        pages = spark.createDataFrame(
            [Row(url="http://a.test/1", text="x")]
        )
        resolved = spark.createDataFrame(
            [Row(url="http://a.test/1", final_url="http://a.test/t",
                 hops=2, redirect_loop=False)]
        )
        once = annotate_final_urls(pages, resolved)
        import pytest
        with pytest.raises(ValueError, match="final_url"):
            annotate_final_urls(once, resolved)
