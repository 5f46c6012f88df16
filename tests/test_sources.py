"""Source/sink layer: JSONL read with corrupt-record capture,
multi-file combine with file tagging, CSV/JSONL round-trips."""

from table_ocr_spark.sources.pages_source import (
    read_jsonl,
    read_jsonl_many,
    write_csv,
    write_jsonl,
)


def test_read_jsonl_corrupt_capture(spark, tmp_path):
    p = tmp_path / "a.jsonl"
    p.write_text('{"k": 1, "v": "x"}\n{"k": 2, "v": "y"}\nBROKEN LINE\n')
    df = read_jsonl(spark, str(p))
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["k"] for r in good} == {1, 2}
    assert len(bad) == 1 and "BROKEN" in bad[0]["_corrupt_record"]


def test_read_jsonl_many_tags_files(spark, tmp_path):
    a, b = tmp_path / "r1.jsonl", tmp_path / "r2.jsonl"
    a.write_text('{"k": 1}\n')
    b.write_text('{"k": 2}\n{"k": 3}\n')
    df = read_jsonl_many(spark, [str(a), str(b)])
    got = {(r["k"], r["file"].rsplit("/", 1)[-1]) for r in df.collect()}
    assert got == {(1, "r1.jsonl"), (2, "r2.jsonl"), (3, "r2.jsonl")}


def test_csv_and_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_csv(df, str(tmp_path / "csv"))
    back = spark.read.option("header", "true").csv(str(tmp_path / "csv"))
    assert {(int(r["k"]), r["v"]) for r in back.collect()} == {(1, "a"), (2, "b")}
    write_jsonl(df, str(tmp_path / "jl"))
    back2 = spark.read.json(str(tmp_path / "jl"))
    assert back2.count() == 2


def test_iceberg_vs_parquet_branch_selection(spark, tmp_path):
    # SURVEY §7.3.5 / round-1 verdict #10: both branches' SELECTION
    # logic is exercised — the parquet fallback end-to-end, and the
    # iceberg: prefix routing (which in this container must fail inside
    # the Iceberg source, proving the branch was actually taken).
    import pytest

    from table_ocr_spark.sources.pages_source import (
        PAGES_SCHEMA,
        _iceberg_available,
        read_pages,
        write_extracted,
    )

    # this container ships no Iceberg runtime: detection must say so
    assert _iceberg_available(spark) is False

    df = spark.createDataFrame(
        [("u1", None, bytearray(b"<p>x</p>"), "x", "en")], PAGES_SCHEMA
    )
    path = str(tmp_path / "pages_pq")
    write_extracted(df, path, mode="overwrite")
    got = read_pages(spark, path)
    # parquet reads force nullable=True, so compare names + types
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in PAGES_SCHEMA.fields
    ]
    assert got.count() == 1

    with pytest.raises(Exception) as ei:
        read_pages(spark, "iceberg:db.pages").count()
    # the failure must come from the iceberg source lookup, not from
    # a parquet path misroute
    assert "iceberg" in str(ei.value).lower()

    with pytest.raises(Exception):
        write_extracted(df, "iceberg:db.pages")
