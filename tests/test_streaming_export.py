"""Streaming WET/WAT export (streaming/export.py): per-micro-batch
wave directories, checkpointed exactly-once file progress, and the
union-equals-batch-sink contract."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.sources.warc import read_warc
from table_ocr_spark.sources.wat import read_wat
from table_ocr_spark.streaming.export import streaming_export


def _wave(spark, start, n):
    return spark.range(start, start + n).select(
        F.concat(F.lit("http://s"), (F.col("id") % 3).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2026-03-01 00:00:00")).alias("warc_ts"),
        F.concat(
            F.lit("<html><head><title>T"), F.col("id").cast("string"),
            F.lit('</title></head><body><a href="http://x.test/l'),
            F.col("id").cast("string"), F.lit('">l</a></body></html>'),
        ).cast("binary").alias("html"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
    )


def test_wet_waves_union_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _wave(spark, 0, 12).write.mode("append").parquet(src)
    streaming_export(spark, src, state, kind="wet", n_files=2)
    assert glob.glob(os.path.join(state, "wet", "batch=0", "*.warc.wet.gz"))

    _wave(spark, 100, 8).write.mode("append").parquet(src)
    streaming_export(spark, src, state, kind="wet", n_files=2)
    batches = sorted(glob.glob(os.path.join(state, "wet", "batch=*")))
    assert len(batches) == 2  # second run drains ONLY the new wave

    back = read_warc(
        spark, os.path.join(state, "wet", "batch=*", "*.warc.wet.gz"),
        warc_types=("conversion",),
    )
    got = {r["url"]: bytes(r["html"]) for r in back.collect()}
    want = {
        r["url"]: r["text"].encode()
        for r in _wave(spark, 0, 12).unionAll(_wave(spark, 100, 8)).collect()
    }
    assert got == want


def test_wat_wave_roundtrip(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _wave(spark, 0, 9).write.mode("append").parquet(src)
    streaming_export(spark, src, state, kind="wat", n_files=2)
    back = read_wat(
        spark, os.path.join(state, "wat", "batch=*", "*.warc.wat.gz")
    )
    rows = {r["url"]: r for r in back.collect()}
    assert len(rows) == 9
    r = rows["http://s1.test/p4"]
    assert r["title"] == "T4"
    assert [x["url"] for x in r["links"]] == ["http://x.test/l4"]


def test_both_kinds_share_a_state_dir(spark, tmp_path):
    """Per-kind checkpoints: exporting wet THEN wat from one state_dir
    must emit both (a shared checkpoint would starve the second kind)."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    _wave(spark, 0, 6).write.mode("append").parquet(src)
    streaming_export(spark, src, state, kind="wet", n_files=1)
    streaming_export(spark, src, state, kind="wat", n_files=1)
    assert glob.glob(os.path.join(state, "wet", "batch=*", "*.gz"))
    wat = read_wat(spark, os.path.join(state, "wat", "batch=*", "*.gz"))
    assert wat.count() == 6


def test_kind_guard(spark, tmp_path):
    with pytest.raises(ValueError, match="wet|wat"):
        streaming_export(spark, str(tmp_path), str(tmp_path / "s"), kind="cdx")
