"""CDX url index: SURT key pins, byte-deterministic sorted sink,
cluster.idx pruned lookup, round-trip read.

Reference parity: the reference locates results by filename glob over
a flat directory (``ui/utils.py:63-71``); the crawl-scale analogue is
Common Crawl's sorted CDX index + cluster.idx binary search.
"""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.sources.cdx import (
    candidate_files,
    cdx_lookup,
    read_cdx,
    surt_key,
    write_cdx,
)


class TestSurtKey:
    @pytest.mark.parametrize(
        "url,want",
        [
            # label reversal + ) separator
            ("http://a.b.example.com/x", "com,example,b,a)/x"),
            # lowercase host+path; empty path pins to /
            ("HTTP://WWW.Example.COM", "com,example)/"),
            # one leading www<digits> label stripped
            ("http://www2.foo.org/A/B", "org,foo)/a/b"),
            # www in the middle is NOT stripped
            ("http://x.www.foo.org/", "org,foo,www,x)/"),
            # port/userinfo stripped (host_canonical), fragment dropped
            ("https://u@Foo.com:8080/P#frag", "com,foo)/p"),
            # query params sorted, empties dropped, lowercased
            ("http://e.com/p?B=2&a=1&&c=", "com,e)/p?a=1&b=2&c="),
            # emptied query drops its ?
            ("http://e.com/p?", "com,e)/p"),
            # schemeless -> NULL
            ("example.com/x", None),
            ("not a url", None),
        ],
    )
    def test_pins(self, spark, url, want):
        [r] = (
            spark.createDataFrame([(url,)], "url string")
            .select(surt_key(F.col("url")).alias("k"))
            .collect()
        )
        assert r["k"] == want, (url, r["k"])


def _pages(spark, n=400, hosts=20):
    did = F.col("id")
    url = F.concat(
        F.lit("http://h"), (did % hosts).cast("string"),
        F.lit(".test/p"), did.cast("string"),
    )
    ts = F.to_timestamp(
        F.concat(
            F.lit("2026-01-"),
            F.lpad(((did % 27) + 1).cast("string"), 2, "0"),
            F.lit(" 03:04:05"),
        )
    )
    return spark.range(n).select(
        url.alias("url"), ts.alias("warc_ts"), F.lit("en").alias("lang")
    )


class TestWriteCdx:
    def test_deterministic_sorted_round_trip(self, spark, tmp_path):
        pages = _pages(spark)
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        m1 = write_cdx(pages, d1, n_files=4, extra_cols=("lang",))
        write_cdx(pages, d2, n_files=4, extra_cols=("lang",))

        files = sorted(f for f in os.listdir(d1) if f.endswith(".gz"))
        assert files, "no cdx files written"
        # byte determinism: re-run produces identical bytes
        for f in files + ["cluster.idx"]:
            b1 = open(os.path.join(d1, f), "rb").read()
            b2 = open(os.path.join(d2, f), "rb").read()
            assert b1 == b2, f
        # global sort: concatenating files in name order yields a
        # fully sorted key sequence
        keys = []
        for f in files:
            with gzip.open(os.path.join(d1, f), "rt") as fh:
                keys.extend(line.split(" ", 1)[0] for line in fh)
        assert keys == sorted(keys)
        assert len(keys) == 400
        # manifest totals match
        rows = m1.collect()
        assert sum(r["n_records"] for r in rows) == 400
        # round-trip read: every url recovered, extra col in json
        back = read_cdx(spark, d1)
        assert back.count() == 400
        assert back.where(F.col("url").isNull()).count() == 0
        [r] = back.limit(1).collect()
        assert '"lang":"en"' in r["fields"]
        # ts14 grammar
        assert back.where(
            ~F.col("ts").rlike(r"^\d{14}$")
        ).count() == 0

    def test_null_surt_rows_dropped_and_guards(self, spark, tmp_path):
        pages = _pages(spark, n=10).union(
            spark.createDataFrame(
                [("no scheme", None, "en")],
                "url string, warc_ts timestamp, lang string",
            )
        )
        m = write_cdx(pages, str(tmp_path / "c"), n_files=2)
        assert sum(r["n_records"] for r in m.collect()) == 10
        with pytest.raises(ValueError):
            write_cdx(pages, str(tmp_path / "d"), n_files=0)


class TestLookup:
    def test_pruned_prefix_lookup(self, spark, tmp_path):
        d = str(tmp_path / "idx")
        write_cdx(_pages(spark), d, n_files=4)
        # site prefix: all 20 captures of h7.test, nothing else
        got = cdx_lookup(spark, d, "test,h7)")
        urls = {r["url"] for r in got.collect()}
        assert len(urls) == 20
        assert all("//h7.test/" in u for u in urls)
        # pruning is real: the candidate set is a strict subset
        cands = candidate_files(d, "test,h7)")
        assert 0 < len(cands) < 4
        # a prefix spanning ALL hosts touches every file
        assert len(candidate_files(d, "test,h")) == 4
        # absent site: no candidates, empty result
        assert cdx_lookup(spark, d, "zz,absent)").count() == 0

    def test_partial_ts_range(self, spark, tmp_path):
        """CDX-server API from/to semantics: partial timestamps,
        both bounds inclusive at the given precision."""
        d = str(tmp_path / "idx")
        write_cdx(_pages(spark), d, n_files=4)
        # h7.test captures span 2026-01-01..27; day precision
        got = cdx_lookup(
            spark, d, "test,h7)", ts_from="20260110", ts_to="20260112"
        )
        days = {r["ts"][:8] for r in got.collect()}
        assert days and days <= {"20260110", "20260111", "20260112"}
        # inclusive at full precision: the exact capture second matches
        one = cdx_lookup(
            spark, d, "test,h7)",
            ts_from="20260110030405", ts_to="20260110030405",
        )
        assert one.count() > 0
        # year precision covers everything; a disjoint year nothing
        assert cdx_lookup(spark, d, "test,h7)", ts_from="2026").count() == 20
        assert cdx_lookup(spark, d, "test,h7)", ts_to="2025").count() == 0
        with pytest.raises(ValueError, match="1-14 digits"):
            cdx_lookup(spark, d, "test,h7)", ts_from="2026-01")


class TestLineGrammarSafety:
    def test_space_url_and_bad_ts_rows(self, spark, tmp_path):
        from pyspark.sql import functions as F

        pages = spark.createDataFrame(
            [
                ("http://sp.test/a b", "20260101030405"),   # space in path
                ("http://sp.test/ok", "2026-01-01 03:04:05"),  # parseable
                ("http://sp.test/bad", "not a time"),       # dropped
                ("http://sp.test/null", None),              # dropped
                ("http://tab.test/x\ty", "20260101030405"),  # dropped (tab)
            ],
            "url string, warc_ts string",
        )
        d = str(tmp_path / "sp")
        m = write_cdx(pages, d, n_files=1)
        assert sum(r["n_records"] for r in m.collect()) == 2
        back = {r["surt"]: r for r in read_cdx(spark, d).collect()}
        # the space percent-encodes in the KEY; the json keeps the
        # original url; every ts is 14 digits
        assert "test,sp)/a%20b" in back
        assert back["test,sp)/a%20b"]["url"] == "http://sp.test/a b"
        assert back["test,sp)/ok"]["ts"] == "20260101030405"
        for r in back.values():
            assert len(r["ts"]) == 14 and r["ts"].isdigit()


class TestMergeCdx:
    def _bytes(self, d):
        return {
            f: open(os.path.join(d, f), "rb").read()
            for f in sorted(os.listdir(d))
        }

    def test_targeted_merge_touches_only_candidate_files(
        self, spark, tmp_path
    ):
        from table_ocr_spark.sources.cdx import merge_cdx

        base = str(tmp_path / "base")
        write_cdx(_pages(spark, 400), base, n_files=4)
        base_bytes = self._bytes(base)

        # increment: 10 NEW captures of one existing site (h3)
        inc = spark.range(10).select(
            F.concat(
                F.lit("http://h3.test/new"), F.col("id").cast("string")
            ).alias("url"),
            F.to_timestamp(F.lit("2026-02-01 00:00:00")).alias("warc_ts"),
        )
        out = str(tmp_path / "merged")
        m = merge_cdx(inc, base, out)

        # every base file is present in the output
        assert sorted(f for f in os.listdir(out) if f.endswith(".gz")) \
            == sorted(f for f in os.listdir(base) if f.endswith(".gz"))
        # the site's keys land in ONE file range; all other files are
        # byte-identical copies
        cands = set(candidate_files(base, "test,h3)"))
        out_bytes = self._bytes(out)
        changed = {
            f for f in out_bytes
            if f.endswith(".gz") and out_bytes[f] != base_bytes[f]
        }
        assert changed and changed <= cands, (changed, cands)
        # merged row-set == base rows + increment rows
        back = read_cdx(spark, out)
        assert back.count() == 410
        assert back.filter(F.col("surt").startswith("test,h3)/new")) \
            .count() == 10
        # manifest total matches and cluster.idx re-reads consistently
        assert sum(r["n_records"] for r in m.collect()) == 410
        assert cdx_lookup(spark, out, "test,h3)").count() == 30

    def test_idempotent_and_dedup_off(self, spark, tmp_path):
        from table_ocr_spark.sources.cdx import merge_cdx

        base = str(tmp_path / "base")
        pages = _pages(spark, 200)
        write_cdx(pages, base, n_files=3)

        # merging a subset of the EXISTING captures is a no-op on
        # bytes (dedup=True default)
        sub = pages.limit(50)
        out1 = str(tmp_path / "m1")
        merge_cdx(sub, base, out1)
        assert self._bytes(out1) == self._bytes(base)

        # dedup=False keeps the duplicate lines
        out2 = str(tmp_path / "m2")
        merge_cdx(sub, base, out2, dedup=False)
        assert read_cdx(spark, out2).count() == 250

    def test_out_of_range_keys_and_validation(self, spark, tmp_path):
        from table_ocr_spark.sources.cdx import merge_cdx

        base = str(tmp_path / "base")
        write_cdx(_pages(spark, 100), base, n_files=3)
        # keys sorting below the global min and above the global max
        inc = spark.createDataFrame(
            [("http://aaa.aa/x",), ("http://zzz.zz/x",)], "url string"
        ).withColumn(
            "warc_ts", F.to_timestamp(F.lit("2026-02-01 00:00:00"))
        )
        out = str(tmp_path / "m")
        merge_cdx(inc, base, out)
        back = read_cdx(spark, out)
        assert back.count() == 102
        # global sort still holds across all files
        keys = []
        for f in sorted(os.listdir(out)):
            if f.endswith(".gz"):
                with gzip.open(os.path.join(out, f), "rt") as fh:
                    keys.extend(line.split(" ", 1)[0] for line in fh)
        assert keys == sorted(keys)

        with pytest.raises(ValueError, match="out_path"):
            merge_cdx(inc, base, base)
        with pytest.raises(ValueError, match="cluster.idx"):
            merge_cdx(inc, str(tmp_path / "nope"), out)


class TestRebalance:
    def _skewed_index(self, spark, tmp_path):
        """Base index + a heavily skewed single-site merge, so one
        file holds most of the rows."""
        from table_ocr_spark.sources.cdx import merge_cdx, write_cdx

        base = spark.range(200).select(
            F.concat(F.lit("http://h"), (F.col("id") % 20).cast("string"),
                     F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
            F.lit("2026-01-01T00:00:00Z").alias("warc_ts"),
        )
        inc = spark.range(800).select(
            F.concat(F.lit("http://h0.test/extra"),
                     F.col("id").cast("string")).alias("url"),
            F.lit("2026-02-01T00:00:00Z").alias("warc_ts"),
        )
        b = str(tmp_path / "base")
        m = str(tmp_path / "merged")
        write_cdx(base, b, n_files=4)
        merge_cdx(inc, b, m)
        return m

    def test_rebalance_restores_balance_and_order(self, spark, tmp_path):
        from table_ocr_spark.sources.cdx import (
            _read_cluster_idx,
            read_cdx,
            rebalance_cdx,
        )

        merged = self._skewed_index(spark, tmp_path)
        skew = {
            r["file"]: r["n_records"]
            for r in _read_cluster_idx(merged)
        }
        assert max(skew.values()) > 3 * min(skew.values())  # genuinely hot

        out = str(tmp_path / "rebalanced")
        man = rebalance_cdx(spark, merged, out, n_files=4).collect()
        counts = [r["n_records"] for r in man]
        assert sum(counts) == 1000
        # the hot file's rows spread out: no file holds > 60% anymore
        assert max(counts) < 600
        # content identical as a multiset
        a = sorted(map(tuple, read_cdx(spark, merged).collect()))
        b = sorted(map(tuple, read_cdx(spark, out).collect()))
        assert a == b
        # GLOBAL sort order across the name-ordered files
        man.sort(key=lambda r: r["file"])
        for prev, nxt in zip(man, man[1:]):
            assert prev["last_key"] <= nxt["first_key"]

    def test_rebalance_byte_deterministic(self, spark, tmp_path):
        from table_ocr_spark.sources.cdx import rebalance_cdx

        merged = self._skewed_index(spark, tmp_path)
        o1 = str(tmp_path / "r1")
        o2 = str(tmp_path / "r2")
        rebalance_cdx(spark, merged, o1, n_files=4)
        rebalance_cdx(spark, merged, o2, n_files=4)
        f1 = {p.name: p.read_bytes() for p in (tmp_path / "r1").iterdir()}
        f2 = {p.name: p.read_bytes() for p in (tmp_path / "r2").iterdir()}
        assert f1 and f1 == f2

    def test_rebalance_equals_fresh_write(self, spark, tmp_path):
        """Rebalancing an index whose lines came from write_cdx must
        byte-equal write_cdx over the same captures at the same
        n_files — the strongest statement of the shared contract."""
        from table_ocr_spark.sources.cdx import rebalance_cdx, write_cdx

        caps = spark.range(300).select(
            F.concat(F.lit("http://s"), (F.col("id") % 9).cast("string"),
                     F.lit(".test/x"), F.col("id").cast("string")).alias("url"),
            F.lit("2026-03-01T00:00:00Z").alias("warc_ts"),
        )
        fresh = str(tmp_path / "fresh")
        src = str(tmp_path / "src")
        reb = str(tmp_path / "reb")
        write_cdx(caps, fresh, n_files=3)
        write_cdx(caps, src, n_files=5)  # different layout, same lines
        rebalance_cdx(spark, src, reb, n_files=3)
        f1 = {p.name: p.read_bytes() for p in (tmp_path / "fresh").iterdir()}
        f2 = {p.name: p.read_bytes() for p in (tmp_path / "reb").iterdir()}
        assert f1 and f1 == f2

    def test_guards(self, spark, tmp_path):
        from table_ocr_spark.sources.cdx import rebalance_cdx

        with pytest.raises(ValueError, match="differ"):
            rebalance_cdx(spark, str(tmp_path), str(tmp_path))
        with pytest.raises(ValueError, match="cluster.idx"):
            rebalance_cdx(spark, str(tmp_path / "nope"),
                          str(tmp_path / "out"))

    def test_rebalance_rejects_bad_n_files(self, spark, tmp_path):
        """The n_files guard lives in the shared write tail, so
        rebalance fails fast with a ValueError instead of deep inside
        repartition after the full index read."""
        from table_ocr_spark.sources.cdx import rebalance_cdx

        merged = self._skewed_index(spark, tmp_path)
        with pytest.raises(ValueError, match="n_files must be positive"):
            rebalance_cdx(spark, merged, str(tmp_path / "bad"), n_files=0)
