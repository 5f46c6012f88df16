"""Pages-table source/sink with an Iceberg→parquet fallback.

The production target is an Iceberg snapshot of Common-Crawl-style
pages (BASELINE.json input_hint); in this sandbox the Iceberg runtime
jar is unavailable, so the reader/writer is an interface with a parquet
fallback of identical schema (SURVEY.md §7.3.5). Switching to Iceberg
is a config change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the pages table. ``iceberg:db.table`` → Iceberg catalog;
    anything else → parquet path. Filters/column pruning push down in
    both cases (verify with .explain: PushedFilters / ReadSchema)."""
    if path_or_table.startswith("iceberg:"):
        return spark.read.format("iceberg").load(path_or_table[len("iceberg:"):])
    return spark.read.schema(PAGES_SCHEMA).parquet(path_or_table)


def write_extracted(df: DataFrame, path_or_table: str, mode: str = "append") -> None:
    """Append extracted rows. Iceberg gives snapshot isolation + the
    monotonic run counter for free; the parquet fallback relies on the
    lineage table for idempotence (plans/lineage.py)."""
    if path_or_table.startswith("iceberg:"):
        writer = df.writeTo(path_or_table[len("iceberg:"):])
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            writer.createOrReplace()
        else:
            raise ValueError(f"unsupported mode for iceberg: {mode!r}")
        return
    df.write.mode(mode).parquet(path_or_table)


def read_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL reader (reference S3: ``table_ocr/batch.py:292-305``) —
    Spark's native JSON source, with corrupt-record capture instead of
    the reference's skip-and-log loop (S5, ``ui/dataframe_utils.py:125-201``)."""
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def read_jsonl_many(spark: SparkSession, paths: list, tag_file: bool = True) -> DataFrame:
    """Multi-file combine (S5, ``combine_multiple_results``,
    ``ui/dataframe_utils.py:125-201``): N result files read as one
    DataFrame, each row tagged with its source file — the reference's
    per-file loop + error list becomes ``input_file_name()`` +
    ``_corrupt_record`` rows."""
    from pyspark.sql import functions as F

    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(list(paths))
    )
    if tag_file:
        df = df.withColumn("file", F.input_file_name())
    return df


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export sink (S8, ``ui/utils.py:224-239``)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (S9, ``table_ocr/batch.py:153-161`` request files —
    Spark's JSON writer emits one JSON object per line natively)."""
    df.write.mode(mode).json(path)
