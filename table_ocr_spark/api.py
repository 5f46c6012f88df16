"""Reference API parity layer.

The reference's public surface is four functions
(``table_ocr/__init__.py:9-17``): ``ocr_pdf`` (direct synchronous),
``create_batch_ocr_job`` (async job submit), ``get_job_state`` (poll),
``download_batch_results_file`` (fetch results). A user of the
reference maps onto this engine 1:1:

| reference                          | here                      |
|------------------------------------|---------------------------|
| ``ocr_pdf`` / ``ocr_pdf_parallel`` | :func:`extract_pages`     |
| ``create_batch_ocr_job`` + ``monitor_batch_job`` | :func:`create_extraction_run` |
| ``get_job_state``                  | :func:`get_run_state`     |
| ``download_batch_results_file`` + ``parse_pdf_batch_results_file`` | :func:`read_run_results` |

The "job queue" is the bucketed lineage table (plans/lineage.py): a
run's unit of progress is a url-hash bucket, terminal states are
lineage rows, and "downloading results" is reading the bucket-
partitioned parquet output. Rate limits/semaphores
(``table_ocr/core.py:66-67``, ``direct.py:312``) have no analogue —
parallelism is the partition count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from table_ocr_spark.operators.extract import extract_documents
from table_ocr_spark.plans.lineage import (
    RunReport,
    completed_buckets,
    next_run_id,
    read_extracted,
    run_pipeline,
)


def extract_pages(
    pages: DataFrame,
    num_partitions: int | None = None,
    keep_columns: list | None = None,
) -> DataFrame:
    """Direct synchronous extraction (≙ ``ocr_pdf``/``ocr_pdf_parallel``,
    ``table_ocr/direct.py:126-178, 381-408``): pages in, extracted rows
    out, no persistence. The async semaphore becomes the partition
    count; results come back as a DataFrame instead of the
    ``results[page][sample]`` string grid."""
    return extract_documents(pages, num_partitions, keep_columns)


def create_extraction_run(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    num_buckets: int = 64,
    wave_size: int = 8,
) -> RunReport:
    """Submit-and-monitor in one call (≙ ``create_batch_ocr_job``,
    ``table_ocr/batch.py:27-201`` + the 60 s polling loop of
    ``monitor_batch_job``, ``batch.py:221-247``). Synchronous because
    Spark IS the job queue; restartable because completed buckets are
    skipped on re-submit (idempotent, like the skip-if-exists download
    at ``batch.py:278-280``)."""
    return run_pipeline(
        spark,
        pages,
        out_dir,
        run_id=next_run_id(spark, out_dir),
        num_buckets=num_buckets,
        wave_size=wave_size,
    )


@dataclass
class RunState:
    state: str  # PENDING | RUNNING | SUCCEEDED  (config.py:18-26 lifecycle)
    buckets_done: int
    buckets_total: int


def get_run_state(
    spark: SparkSession, out_dir: str, num_buckets: int | None = None
) -> RunState:
    """≙ ``get_job_state`` (``table_ocr/batch.py:204-218``): derive the
    lifecycle state from the lineage table instead of a remote API.
    The bucket total comes from the run's persisted metadata — a
    caller-supplied ``num_buckets`` that disagrees with the run's real
    bucketing would report SUCCEEDED early or RUNNING forever; the
    parameter remains only as a fallback for runs predating the
    metadata."""
    from table_ocr_spark.plans.lineage import read_run_meta

    persisted = read_run_meta(spark, out_dir)
    if persisted is not None:
        num_buckets = persisted
    elif num_buckets is None:
        # MUST agree with run_pipeline's default (plans/lineage.py) —
        # a higher guess would report a defaulted meta-less run as
        # RUNNING k/64 forever, wedging any polling loop on this state
        num_buckets = 16
    done = completed_buckets(spark, out_dir)
    if not done:
        return RunState("PENDING", 0, num_buckets)
    if len(done) < num_buckets:
        return RunState("RUNNING", len(done), num_buckets)
    return RunState("SUCCEEDED", len(done), num_buckets)


def read_run_results(spark: SparkSession, out_dir: str) -> DataFrame:
    """≙ ``download_batch_results_file`` + ``parse_pdf_batch_results_file``
    (``table_ocr/batch.py:250-375``): the results "file" is the
    bucket-partitioned parquet output; no JSONL re-parsing needed
    because results were structured all along."""
    return read_extracted(spark, out_dir)
