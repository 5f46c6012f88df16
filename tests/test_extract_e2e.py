"""Layer-3 end-to-end: synthetic corpus → Spark pipeline → extracted
text BYTE-IDENTICAL to the by-construction golden (pages.text), and
cells matching the generator's expected geometry. Also checks
partition-count invariance (results must not depend on physical
parallelism) and the latest-capture dedup."""

import os

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.datagen.pages import generate_pages, write_pages_parquet
from table_ocr_spark.operators.extract import extract_documents, latest_capture


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pages")
    path = os.path.join(d, "pages.parquet")
    n = write_pages_parquet(path, n_docs=150, seed=42)
    pages, goldens = generate_pages(n_docs=150, seed=42)
    return path, pages, goldens, n


def test_datagen_deterministic():
    a, _ = generate_pages(n_docs=30, seed=7)
    b, _ = generate_pages(n_docs=30, seed=7)
    assert [p["html"] for p in a] == [p["html"] for p in b]
    assert [p["url"] for p in a] == [p["url"] for p in b]


def test_datagen_hot_host_skew():
    pages, _ = generate_pages(n_docs=400, seed=42)
    hot = sum(1 for p in pages if "big-portal" in p["url"])
    assert 0.2 < hot / len(pages) < 0.4


def test_extraction_byte_identical(spark, corpus):
    path, pages, goldens, _ = corpus
    df = spark.read.parquet(path)
    out = extract_documents(df).collect()
    got = {r["url"]: r["extracted_text"] for r in out}
    golden = {p["url"]: p["text"] for p in pages}
    assert set(got) == set(golden)
    mismatches = [u for u in golden if got[u] != golden[u]]
    assert mismatches == [], (
        f"{len(mismatches)} urls differ; first: {mismatches[:1]} "
        f"got={got[mismatches[0]][:200]!r} want={golden[mismatches[0]][:200]!r}"
        if mismatches else ""
    )
    # byte-level check on a sample (not just str equality)
    for u in list(golden)[:20]:
        assert got[u].encode("utf-8") == golden[u].encode("utf-8")


def test_extraction_cells_match_expected(spark, corpus):
    path, pages, goldens, _ = corpus
    df = spark.read.parquet(path)
    out = extract_documents(df).collect()
    got = {
        r["url"]: sorted(
            (c["table_id"], c["row"], c["col"], c["rowspan"], c["colspan"], c["text"])
            for c in r["cells"]
        )
        for r in out
    }
    for g in goldens:
        want = sorted(
            (c["table_id"], c["row"], c["col"], c["rowspan"], c["colspan"], c["text"])
            for c in g["cells"]
        )
        assert got[g["url"]] == want, g["url"]


def test_extraction_n_tables(spark, corpus):
    path, pages, goldens, _ = corpus
    out = extract_documents(spark.read.parquet(path)).collect()
    got = {r["url"]: r["n_tables"] for r in out}
    for g in goldens:
        assert got[g["url"]] == g["n_tables"], g["url"]


def test_partition_invariance(spark, corpus):
    path, *_ = corpus
    df = spark.read.parquet(path)
    a = {
        (r["url"], r["extracted_text"])
        for r in extract_documents(df, num_partitions=2).collect()
    }
    b = {
        (r["url"], r["extracted_text"])
        for r in extract_documents(df, num_partitions=13).collect()
    }
    assert a == b


def test_latest_capture_dedup(spark, corpus):
    path, pages, *_ = corpus
    df = spark.read.parquet(path)
    total = df.count()
    deduped = latest_capture(df)
    n_urls = df.select("url").distinct().count()
    assert deduped.count() == n_urls < total
    # kept row per url is the max warc_ts
    chk = (
        deduped.alias("d")
        .join(
            df.groupBy("url").agg(F.max("warc_ts").alias("mx")).alias("m"), "url"
        )
        .filter(F.col("d.warc_ts") != F.col("m.mx"))
        .count()
    )
    assert chk == 0


def test_null_html_yields_empty(spark):
    df = spark.createDataFrame(
        [("u1", None), ("u2", b"<article><p>ok fine</p></article>")],
        "url string, html binary",
    )
    rows = {r["url"]: r["extracted_text"] for r in extract_documents(df).collect()}
    assert rows["u1"] == "" and rows["u2"] == "ok fine"


def test_keep_columns_ride_through_kernel_no_join(spark, corpus):
    # keep_columns must pass through the Arrow kernel stage zero-copy —
    # NOT a post-hoc corpus x corpus join by url (round-1 verdict #5)
    path, _, _, _ = corpus
    pages = spark.read.parquet(path)
    out = extract_documents(pages, keep_columns=["warc_ts", "lang"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan  # still map-only

    # multiset compare: the corpus contains re-crawled urls, so the
    # same url appears with several warc_ts values
    import collections

    rows = collections.Counter(
        (r["url"], r["lang"], r["warc_ts"])
        for r in out.select("url", "lang", "warc_ts").collect()
    )
    want = collections.Counter(
        (r["url"], r["lang"], r["warc_ts"])
        for r in pages.select("url", "lang", "warc_ts").collect()
    )
    assert rows == want

    # extraction output itself unaffected by the passthrough
    base = sorted(
        (r["url"], r["extracted_text"])
        for r in extract_documents(pages).collect()
    )
    got = sorted((r["url"], r["extracted_text"]) for r in out.collect())
    assert got == base


def test_multipage_page_range_slice(spark):
    from table_ocr_spark.operators.docpages import (
        documents_as_multipage,
        page_range_slice,
    )

    docs = spark.createDataFrame(
        [(i, f"body {i}", "en", "crawl", 6) for i in range(8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pages = documents_as_multipage(docs)
    # doc i has 1 + i%4 pages
    counts = {r["url"]: r["n"] for r in
              pages.groupBy("url").count().withColumnRenamed("count", "n").collect()}
    assert counts["doc:0"] == 1 and counts["doc:3"] == 4 and counts["doc:5"] == 2

    sliced = page_range_slice(pages, 1, 2)
    out = extract_documents(sliced, keep_columns=["page"]).collect()
    got = {(r["url"], r["page"]): r["extracted_text"] for r in out}
    # doc:0 has only page 0 -> absent; doc:3 contributes pages 1,2
    assert ("doc:0", 0) not in got and ("doc:0", 1) not in got
    assert got[("doc:3", 1)] == "p1 body 3"
    assert got[("doc:3", 2)] == "p2 body 3"
    assert ("doc:3", 3) not in got  # sliced away
    assert got[("doc:5", 1)] == "p1 body 5"


def test_host_of_pathless_and_mixed_case(spark):
    from table_ocr_spark.operators.extract import host_of

    df = spark.createDataFrame(
        [("https://example.com",), ("HTTP://Mixed.Example/x",),
         ("https://a.example/p?q=1",), ("https://b.example?x=1",),
         ("not a url",)],
        "url string",
    )
    got = [r["h"] for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["example.com", "Mixed.Example", "a.example", "b.example", ""]


def test_latest_capture_equal_ts_deterministic(spark):
    import datetime as dt

    t = dt.datetime(2024, 5, 1)
    rows = [("u", t, bytearray(b"<p>A</p>"), "", "en"),
            ("u", t, bytearray(b"<p>B</p>"), "", "en")]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    picks = set()
    for df in (pages, pages.repartition(5), pages.repartition(1)):
        out = latest_capture(df).collect()
        assert len(out) == 1
        picks.add(bytes(out[0]["html"]))
    assert len(picks) == 1  # same survivor under any partitioning


def test_keep_columns_collision_raises(spark, corpus):
    path, *_ = corpus
    pages = spark.read.parquet(path).withColumn("n_tables", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        extract_documents(pages, keep_columns=["n_tables"])

def test_keep_columns_degraded_collision_raises(spark, corpus):
    path, *_ = corpus
    pages = spark.read.parquet(path).withColumn("degraded", F.lit(False))
    with pytest.raises(ValueError, match="collide"):
        extract_documents(pages, keep_columns=["degraded"])

