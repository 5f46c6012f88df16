"""Incremental extraction via Structured Streaming.

The reference has no streaming operators (SURVEY.md §2.10); its closest
analogue is the 60 s batch-job polling loop (``table_ocr/batch.py:221-247``).
Our incremental vehicle: a file-source stream over the pages directory
with ``trigger(availableNow=True)`` — each invocation processes exactly
the not-yet-seen files recorded in the Spark checkpoint, giving
at-least-once file-level progress tracking on top of the bucket-level
lineage in plans/lineage.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from table_ocr_spark.operators.extract import EXTRACT_SCHEMA, _extract_arrow_batches
from table_ocr_spark.sources.pages_source import PAGES_SCHEMA


def incremental_extract(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
) -> None:
    """Process any new parquet files under ``source_dir`` exactly once
    (per checkpoint), writing extracted rows to ``sink_dir``. Blocks
    until the availableNow batch drains."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    extracted = stream.select("url", "html").mapInArrow(
        _extract_arrow_batches, EXTRACT_SCHEMA
    )
    q = (
        extracted.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
