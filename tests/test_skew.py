"""Hot-host skew handling: the datagen corpus gives one host ~30% of
documents; host-keyed partitioning without salt creates a straggler
partition, skew-aware salting levels it."""

from pyspark.sql import functions as F

from table_ocr_spark.datagen.pages import write_pages_parquet
from table_ocr_spark.operators.extract import (
    hot_hosts,
    host_of,
    skew_aware_repartition,
)

NPART = 16


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]


def test_hot_host_detection(spark, tmp_path):
    pq = str(tmp_path / "pages.parquet")
    write_pages_parquet(pq, n_docs=400, seed=11, dup_frac=0)
    pages = spark.read.parquet(pq)
    hosts = hot_hosts(pages, hot_share=0.05)
    assert "big-portal.example" in hosts
    # the 12 cold hosts share ~70% -> ~6% each; with the 5% threshold a
    # few may cross it, but the hot host must dominate
    counts = (
        pages.groupBy(host_of(F.col("url")).alias("h")).count().collect()
    )
    top = max(counts, key=lambda r: r["count"])
    assert top["h"] == "big-portal.example"


def test_salting_levels_host_partitions(spark, tmp_path):
    pq = str(tmp_path / "pages.parquet")
    write_pages_parquet(pq, n_docs=800, seed=12, dup_frac=0)
    pages = spark.read.parquet(pq)
    n = pages.count()

    # host-only partitioning: the hot host serializes into one partition
    plain = pages.repartition(NPART, host_of(F.col("url")))
    max_plain = max(_partition_sizes(plain)) / n
    assert max_plain >= 0.25  # the straggler

    salted = skew_aware_repartition(
        pages, num_partitions=NPART, hot_share=0.05, salt_buckets=16
    )
    assert salted.count() == n  # no rows lost
    max_salted = max(_partition_sizes(salted)) / n
    assert max_salted < max_plain / 1.5
    assert max_salted < 0.2
