"""Leakage-safe splits: site-wholesale assignment, deterministic
bands, validation, and the NULL-key fallthrough."""

import hashlib

import pytest

from table_ocr_spark.operators.splits import assign_splits, split_boundaries


def _urls_df(spark):
    rows = []
    for h in range(40):
        for p in range(5):
            rows.append((f"https://site{h}.example.com/page/{p}",))
    return spark.createDataFrame(rows, "url string")


def test_same_host_same_split_always(spark):
    # site_key="host": every _urls_df host shares the registrable
    # domain example.com, so the band math is tested at host
    # granularity (eTLD+1 grouping has its own tests below)
    out = assign_splits(
        _urls_df(spark), {"val": 0.2, "test": 0.2}, site_key="host"
    ).collect()
    by_host = {}
    for r in out:
        host = r["url"].split("/")[2]
        by_host.setdefault(host, set()).add(r["split"])
    # wholesale: every host's pages share one split
    assert all(len(s) == 1 for s in by_host.values())
    seen = {s for ss in by_host.values() for s in ss}
    assert seen <= {"val", "test", "train"} and len(seen) > 1


def test_membership_matches_closed_form(spark):
    # recompute membership in pure python from the recipe alone
    out = assign_splits(
        _urls_df(spark), {"val": 0.25, "test": 0.25}, site_key="host"
    ).collect()
    bounds = split_boundaries({"val": 0.25, "test": 0.25})
    for r in out:
        host = r["url"].split("/")[2]
        prefix = hashlib.md5(host.encode()).hexdigest()[:16]
        want = "train"
        for name, b in bounds:
            if prefix < b:
                want = name
                break
        assert r["split"] == want


def test_partitioning_invariance(spark):
    df = _urls_df(spark)
    a = {r["url"]: r["split"] for r in
         assign_splits(df.repartition(2), {"val": 0.3}).collect()}
    b = {r["url"]: r["split"] for r in
         assign_splits(df.repartition(13), {"val": 0.3}).collect()}
    assert a == b


def test_null_key_falls_through_to_rest(spark):
    df = spark.createDataFrame([(None,), ("https://x.example/a",)], "url string")
    rows = {r["url"]: r["split"] for r in
            assign_splits(df, {"val": 1.0}, rest="train").collect()}
    assert rows[None] == "train"
    assert rows["https://x.example/a"] == "val"


def test_precomputed_domain_column(spark):
    # eTLD+1 grouping via a caller-supplied column, no canonicalization
    df = spark.createDataFrame(
        [("a", "foo.com"), ("b", "foo.com"), ("c", "bar.org")],
        "doc_id string, domain string",
    )
    out = assign_splits(
        df, {"val": 0.5}, key_col="domain", site_key="column"
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_dom.values())


def test_validation_errors(spark):
    df = _urls_df(spark)
    with pytest.raises(ValueError, match="empty"):
        split_boundaries({})
    with pytest.raises(ValueError, match="sum past"):
        split_boundaries({"a": 0.7, "b": 0.7})
    with pytest.raises(ValueError, match="must be in"):
        split_boundaries({"a": -0.1})
    with pytest.raises(ValueError, match="rest split"):
        assign_splits(df, {"train": 0.5}, rest="train")


def test_unparseable_url_falls_through_to_rest(spark):
    # host_canonical yields '' (not NULL) for schemeless urls; ''
    # must not become one giant md5('')-keyed pseudo-site inside a
    # val/test band (review r3 finding)
    df = spark.createDataFrame(
        [("example.com/no-scheme",), ("https://real.example/a",)],
        "url string",
    )
    # md5('')[:16] ~ fraction 0.829 — a 0.9 band would swallow it
    rows = {r["url"]: r["split"] for r in
            assign_splits(df, {"val": 0.9}, rest="train").collect()}
    assert rows["example.com/no-scheme"] == "train"


def test_etld1_default_groups_subdomains_wholesale(spark):
    # r3 verdict #3: blog.foo.com in train + shop.foo.com in test is
    # the leakage hole eTLD+1 grouping must close BY DEFAULT
    df = spark.createDataFrame(
        [(f"https://{sub}.site{i}.co.uk/p/{j}",)
         for i in range(40)
         for sub in ("blog", "shop", "www", "cdn.static")
         for j in range(2)],
        "url string",
    )
    out = assign_splits(df, {"val": 0.3, "test": 0.3}).collect()
    by_site = {}
    for r in out:
        site = r["url"].split(".", 1)[1].split("/")[0]  # siteN.co.uk
        by_site.setdefault(site, set()).add(r["split"])
    # every subdomain of a site shares one split, and with 40 sites
    # at 30/30/40 bands all three splits are populated
    assert all(len(s) == 1 for s in by_site.values())
    assert {s for ss in by_site.values() for s in ss} == {
        "train", "val", "test"
    }
    # host grouping (the pre-r4 behavior) splits the SAME corpus by
    # full host — at least one site must straddle splits, otherwise
    # this test would pass vacuously
    host_out = assign_splits(df, {"val": 0.3, "test": 0.3},
                             site_key="host").collect()
    by_site_h = {}
    for r in host_out:
        site = r["url"].split(".", 1)[1].split("/")[0]
        by_site_h.setdefault(site, set()).add(r["split"])
    assert any(len(s) > 1 for s in by_site_h.values())


def test_etld1_respects_private_suffixes_and_fallback(spark):
    # two github.io customers are DIFFERENT sites (PSL private
    # section); a host that IS a public suffix falls back to itself
    df = spark.createDataFrame(
        [("https://alice.github.io/a",), ("https://bob.github.io/b",),
         ("https://deep.page.alice.github.io/c",),
         ("https://github.io/landing",)],
        "url string",
    )
    out = assign_splits(df, {"val": 0.5}).collect()
    splits = {r["url"]: r["split"] for r in out}
    # alice pages cohere across subdomain depth
    assert (splits["https://alice.github.io/a"]
            == splits["https://deep.page.alice.github.io/c"])
    # determinism: same recipe, same assignment on a re-run
    again = {r["url"]: r["split"]
             for r in assign_splits(df, {"val": 0.5}).collect()}
    assert again == splits


def test_site_key_validation(spark):
    import pytest as _pytest

    df = _urls_df(spark)
    with _pytest.raises(ValueError, match="site_key"):
        assign_splits(df, {"val": 0.5}, site_key="domain")
