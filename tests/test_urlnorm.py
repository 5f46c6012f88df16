"""URL canonicalization: pinned semantics on crafted cases + the
canonical-keyed latest-capture dedup."""

import datetime as dt

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
    ("https://a.example/", "https://a.example/"),  # root slash kept
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
