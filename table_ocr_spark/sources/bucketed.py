"""Bucketed-table layout for exchange-free co-located joins.

The north rule names bucketing as one of the explicit partitioning
levers. At 100 TB the recurring join shapes are url-keyed: extracted
text ⋈ page metadata, extraction output ⋈ lineage, votes ⋈ decode.
Writing both sides bucketed (and sorted) by ``xxhash``-distributed url
into the warehouse means every later equi-join on the bucket key is
planned WITHOUT an Exchange on either side — the shuffle is paid once
at write time and amortized over every downstream join/aggregation
(verified by plan assertion in ``tests/test_bucketing.py``).

Spark requires ``saveAsTable`` (catalog-managed) for bucketed writes;
this works with the default in-memory/derby catalog — no Hive
metastore needed. Under Iceberg the same layout is a partition spec +
sorted write; the join-side benefit is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """One-time shuffle into ``buckets`` url-hash buckets, sorted
    within each bucket by the key (enables sort-merge joins with
    neither exchange NOR per-task sort)."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url"
) -> DataFrame:
    """Equi-join of two tables bucketed on the same key with the same
    bucket count: Catalyst plans a sort-merge join with no Exchange on
    either side. (Join the `spark.table` handles, not re-read paths —
    bucketing metadata lives in the catalog entry.)"""
    return spark.table(left_table).join(spark.table(right_table), key)
