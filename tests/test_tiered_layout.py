"""Tier-partitioned layout: partition pruning must happen at planning
time (PartitionFilters + only the tier's files listed), and the layout
must compose with per-tier packing."""

from pyspark.sql import functions as F

from table_ocr_spark.sources.tiered import read_tier, write_tiered


def _tiered_df(spark):
    return spark.createDataFrame(
        [(i, i % 3, f"doc {i} text") for i in range(60)],
        "doc_id long, tier long, text string",
    )


def test_write_read_tier_roundtrip_and_pruning(spark, tmp_path):
    path = str(tmp_path / "tiered")
    write_tiered(_tiered_df(spark), path)

    one = read_tier(spark, path, 1)
    rows = one.collect()
    assert len(rows) == 20
    assert all(r["tier"] == 1 for r in rows)

    # pruning is a PLAN property: the equality filter must reach the
    # scan as a PartitionFilters entry (directory pruning at planning
    # time). inputFiles() reflects the pre-filter relation, so the
    # scan node's own filter list is the thing to assert on.
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "tier" in pf and "= 1" in pf


def test_write_tiered_requires_tier_column(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="tier"):
        write_tiered(df, str(tmp_path / "x"))


def test_per_tier_packing_composes(spark, tmp_path):
    from table_ocr_spark.operators.packing import pack_sequences

    path = str(tmp_path / "tiered")
    write_tiered(
        _tiered_df(spark).withColumn(
            "n_tokens", F.length("text").cast("long")
        ),
        path,
    )
    packed = pack_sequences(
        read_tier(spark, path, 2), capacity=64, weight_col="n_tokens"
    )
    rows = packed.collect()
    assert len(rows) == 20
    # offsets are a contiguous prefix sum within the tier alone
    total = sum(r["n_tokens"] for r in rows)
    assert max(r["start_offset"] + r["n_tokens"] for r in rows) == total
