"""Bucketed-layout evidence: a join of two tables bucketed on the same
key must plan WITHOUT an Exchange on either side (the write-once,
join-many layout the north rule's bucketing lever buys at 100 TB)."""

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.sources.bucketed import (
    colocated_join,
    read_table,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark):
    left = spark.range(0, 500).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") * 2).alias("n_tables"),
    )
    right = spark.range(0, 500, 2).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.col("id").cast("string").alias("lang"),
    )
    write_bucketed(left, "t_extracted", buckets=8)
    write_bucketed(right, "t_meta", buckets=8)
    yield "t_extracted", "t_meta"
    spark.sql("DROP TABLE IF EXISTS t_extracted")
    spark.sql("DROP TABLE IF EXISTS t_meta")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # the whole point
        # within-bucket sort order also removes the per-task Sort
        assert joined.count() == 250
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_roundtrip_values(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = {
        r["url"]: (r["n_tables"], r["lang"])
        for r in colocated_join(spark, lt, rt).collect()
    }
    assert got["u0"] == (0, "0") and got["u498"] == (996, "498")
    assert "u1" not in got
    assert read_table(spark, lt).count() == 500
