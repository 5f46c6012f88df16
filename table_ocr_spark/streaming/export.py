"""Streaming WET/WAT export: the incremental twin of the batch sinks.

A live pipeline lands pages (or extracted text) as parquet waves; each
``streaming_export`` invocation drains the not-yet-seen files
(Structured Streaming file-source checkpoint, availableNow — the
``incremental_extract`` contract) and emits one batch-id-keyed
directory of interchange files per micro-batch:

    <state_dir>/<kind>/batch=N/part-*.warc.<kind>.gz

Batch-id keying is the foreachBatch idempotence rule (a retry
overwrites its OWN directory), and the sinks themselves are
byte-deterministic for fixed ``n_files`` (``write_member_files``), so
a retried batch reproduces its files byte-identically instead of
appending near-duplicates. Readers glob ``<kind>/batch=*/*.gz`` — the
union across batches is exactly the batch-mode sink over the union of
inputs (record sets; file grouping differs by wave), pinned in tests.

Scale shape: per micro-batch this is the batch sink's one
file-bucket exchange over the wave only; accumulated batches are
independent directories (compact old waves offline by re-running the
batch sink over their union — byte-determinism makes that safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from table_ocr_spark.sources.pages_source import PAGES_SCHEMA


def streaming_export(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    kind: str = "wet",
    n_files: int = 8,
    max_files_per_trigger: int | None = None,
    opener=None,
) -> None:
    """Drain new parquet files under ``source_dir`` (PAGES_SCHEMA) and
    write one ``<kind>/batch=N/`` wave of ``.warc.<kind>.gz`` files per
    micro-batch; blocks until drained. ``kind``: ``"wet"`` (extracted
    ``text`` as conversion records) or ``"wat"`` (metadata envelopes
    from ``html``). ``opener``: a :class:`sources.sinkio.SinkOpener`
    routing the member-file bytes (POSIX default) — same contract as
    the batch sinks."""
    from table_ocr_spark.sources.wat import write_wat
    from table_ocr_spark.sources.wet import write_wet

    if kind not in ("wet", "wat"):
        raise ValueError(f"streaming_export: kind must be wet|wat, got {kind!r}")
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)
    root = os.path.join(state_dir, kind)

    def _emit(batch_df, batch_id: int) -> None:
        out = os.path.join(root, f"batch={batch_id}")
        if kind == "wet":
            write_wet(batch_df, out, n_files=n_files, opener=opener)
        else:
            write_wat(batch_df, out, n_files=n_files, opener=opener)

    q = (
        stream.writeStream.foreachBatch(_emit)
        # per-KIND checkpoint: wet and wat progress independently, so
        # exporting both from one state_dir works — a shared checkpoint
        # would mark files seen for whichever kind ran first and the
        # second kind would silently emit nothing
        .option(
            "checkpointLocation",
            os.path.join(state_dir, f"checkpoint_{kind}"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
