"""Pluggable sink opener (sources/sinkio.py) — round-5 judge task #4.

The member-file sinks (WET/WAT/CDX) must produce BYTE-IDENTICAL output
regardless of which filesystem the bytes route through: the bucketing,
within-file sort, record grammar and pinned-mtime gzip framing are the
determinism contract; the opener only changes where handles come from.

Three layers of evidence:
1. executor routing — a full-Spark write through ``ArrowFSOpener``
   (pyarrow LocalFileSystem, i.e. NOT builtin ``open``) equals the
   default POSIX write byte-for-byte, proving the opener pickles into
   the mapInPandas kernels and is actually used there;
2. non-POSIX filesystem — the shared write kernel driven against
   pyarrow's pure in-memory ``_MockFileSystem`` reproduces the same
   bytes, proving nothing in the write path assumes a local disk
   (no os.stat, no seek, no text mode, no re-open);
3. CDX reads — candidate_files/cluster.idx round-trip through the
   opener, and merge_cdx's verbatim-copy path streams through it.
"""

import glob
import gzip
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from table_ocr_spark.sources.cdx import (
    candidate_files,
    write_cdx,
)
from table_ocr_spark.sources.sinkio import (
    ArrowFSOpener,
    PosixOpener,
    resolve_opener,
)
from table_ocr_spark.sources.wet import (
    member_writer_kernel,
    wet_record_bytes,
    write_wet,
)


def _docs(spark, n=60):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.lit("2026-05-01T00:00:00Z").alias("warc_ts"),
        F.concat(F.lit("text body é "), F.col("id").cast("string")).alias("text"),
    )


def _read_tree(root):
    out = {}
    for p in sorted(glob.glob(os.path.join(root, "*"))):
        with open(p, "rb") as fh:
            out[os.path.basename(p)] = fh.read()
    return out


class TestArrowLocalExecutorRouting:
    def test_wet_bytes_identical_posix_vs_arrow(self, spark, tmp_path):
        import pyarrow.fs as pafs

        d = _docs(spark)
        p_posix = str(tmp_path / "posix")
        p_arrow = str(tmp_path / "arrow")
        m1 = write_wet(d, p_posix, n_files=5)
        m2 = write_wet(
            d, p_arrow, n_files=5,
            opener=ArrowFSOpener(pafs.LocalFileSystem),
        )
        assert sorted(map(tuple, m1.collect())) == sorted(
            map(tuple, m2.collect())
        )
        a, b = _read_tree(p_posix), _read_tree(p_arrow)
        assert a and a == b

    def test_cdx_bytes_identical_posix_vs_arrow(self, spark, tmp_path):
        import pyarrow.fs as pafs

        d = _docs(spark)
        p_posix = str(tmp_path / "cposix")
        p_arrow = str(tmp_path / "carrow")
        write_cdx(d, p_posix, n_files=4)
        write_cdx(
            d, p_arrow, n_files=4,
            opener=ArrowFSOpener(pafs.LocalFileSystem),
        )
        a, b = _read_tree(p_posix), _read_tree(p_arrow)
        assert "cluster.idx" in a and a == b
        # reads route through the opener too
        assert candidate_files(
            p_arrow, "test,h1", opener=ArrowFSOpener(pafs.LocalFileSystem)
        ) == candidate_files(p_posix, "test,h1")
        # ...including the public lookup entry point (its cluster.idx
        # read must not fall back to builtin open)
        from table_ocr_spark.sources.cdx import cdx_lookup

        hits = cdx_lookup(
            spark, p_arrow, "test,h1)",
            opener=ArrowFSOpener(pafs.LocalFileSystem),
        )
        assert hits.count() == cdx_lookup(spark, p_posix, "test,h1)").count() > 0


class TestInMemoryFilesystem:
    def test_member_kernel_byte_identical_on_mock_fs(self, spark, tmp_path):
        """Drive the shared WET/WAT write kernel against pyarrow's pure
        in-memory filesystem and byte-compare with the POSIX run of the
        SAME sorted batches — the object-store portability pin."""
        import pandas as pd
        import pyarrow.fs as pafs

        rows = sorted(
            (i % 3, f"http://h{i % 5}.test/p{i}",
             "2026-05-01T00:00:00Z", f"body {i} é")
            for i in range(40)
        )
        batches = [
            pd.DataFrame(
                rows[k : k + 15],
                columns=["_fid", "_url", "_ts", "_payload"],
            )
            for k in range(0, len(rows), 15)
        ]

        pdir = str(tmp_path / "kposix")
        os.makedirs(pdir)
        list(member_writer_kernel(
            pdir, ".warc.wet.gz", wet_record_bytes, PosixOpener()
        )(iter(batches)))

        mem = ArrowFSOpener(pafs._MockFileSystem)
        mem.makedirs("sink")
        manifest = list(member_writer_kernel(
            "sink", ".warc.wet.gz", wet_record_bytes, mem
        )(iter(batches)))[0]

        posix_files = _read_tree(pdir)
        assert len(posix_files) == 3
        for fname, want in posix_files.items():
            with mem.open_read(f"sink/{fname}") as fh:
                assert fh.read() == want, fname
        assert set(manifest["file"]) == set(posix_files)

    def test_mock_fs_records_parse_back(self):
        """End-to-end through the mock FS only: write, read back,
        parse — no POSIX reference involved."""
        import pandas as pd
        import pyarrow.fs as pafs

        from table_ocr_spark.sources.warc import iter_warc_records

        mem = ArrowFSOpener(pafs._MockFileSystem)
        mem.makedirs("m")
        batch = pd.DataFrame(
            [(0, "http://exämple.test/号", "2026-05-01T00:00:00Z", "tëxt")],
            columns=["_fid", "_url", "_ts", "_payload"],
        )
        list(member_writer_kernel(
            "m", ".warc.wet.gz", wet_record_bytes, mem
        )(iter([batch])))
        with mem.open_read("m/part-00000.warc.wet.gz") as fh:
            blob = gzip.decompress(fh.read())
        recs = list(iter_warc_records(blob))
        assert len(recs) == 1
        assert recs[0]["url"] == "http://exämple.test/号"
        assert recs[0]["block"] == "tëxt".encode("utf-8")


class TestOpenerContract:
    def test_resolve_default_is_posix(self):
        assert isinstance(resolve_opener(None), PosixOpener)
        op = PosixOpener()
        assert resolve_opener(op) is op

    def test_arrow_opener_pickles_without_fs_handle(self):
        import pickle

        import pyarrow.fs as pafs

        op = ArrowFSOpener(pafs._MockFileSystem)
        op.makedirs("x")  # materializes the non-picklable fs
        again = pickle.loads(pickle.dumps(op))
        # the clone materializes its OWN fs lazily
        again.makedirs("y")
        assert again.exists("y") and not again.exists("x")

    def test_merge_cdx_verbatim_copy_through_opener(self, spark, tmp_path):
        """merge_cdx's untouched-file copy streams through the opener;
        with ArrowFSOpener the result must equal the POSIX merge."""
        import pyarrow.fs as pafs

        from table_ocr_spark.sources.cdx import merge_cdx

        base = _docs(spark, 40)
        inc = spark.createDataFrame(
            [Row(url="http://h1.test/new", warc_ts="2026-06-01T00:00:00Z",
                 text="x")]
        )
        b1 = str(tmp_path / "base1")
        write_cdx(base, b1, n_files=4)
        out_p = str(tmp_path / "out_posix")
        out_a = str(tmp_path / "out_arrow")
        merge_cdx(inc, b1, out_p)
        merge_cdx(
            inc, b1, out_a, opener=ArrowFSOpener(pafs.LocalFileSystem)
        )
        assert _read_tree(out_p) == _read_tree(out_a)
