"""Quality-tier extraction: exact order-statistic cutoffs from the
bounded histogram, pinned integer-ceil rank arithmetic, deterministic
tie handling, and every driver-safety fail-fast."""

import pytest
from pyspark.sql import functions as F

from table_ocr_spark.operators.tiers import score_tiers, tier_cutoffs


def _df(spark, scores):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "doc_id long, s double"
    )


def test_cutoffs_uniform_distribution(spark):
    # n=8, T=4 -> ranks ceil(8t/4) = 2,4,6 -> cutoff scores 2,4,6
    df = _df(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    assert tier_cutoffs(df, "s", 4) == [2.0, 4.0, 6.0]


def test_cutoffs_ceil_not_floor(spark):
    # n=5, T=2 -> rank ceil(5/2)=3 (floor would give 2)
    df = _df(spark, [10.0, 20.0, 30.0, 40.0, 50.0])
    assert tier_cutoffs(df, "s", 2) == [30.0]


def test_tiers_balanced_assignment(spark):
    df = _df(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0])
    rows = {r["doc_id"]: r["tier"] for r in score_tiers(df, "s", 4).collect()}
    # tier(x) = #cutoffs strictly below x; cutoffs 2,4,6
    assert [rows[i] for i in range(8)] == [0, 0, 1, 1, 2, 2, 3, 3]


def test_tiers_equal_scores_share_tier(spark):
    # ntile() would split ties by row order; the pinned definition
    # never does — all-equal scores land in tier 0 together
    df = _df(spark, [5.0] * 12)
    tiers = {r["tier"] for r in score_tiers(df, "s", 4).collect()}
    assert tiers == {0}


def test_tiers_heavy_ties_may_skip(spark):
    # n=8, T=4: seven 1.0s push all three cutoffs to 1.0, so the one
    # high doc jumps straight to tier 3 — deterministic, documented
    df = _df(spark, [1.0] * 7 + [9.0])
    rows = {r["s"]: r["tier"] for r in score_tiers(df, "s", 4).collect()}
    assert rows[1.0] == 0
    assert rows[9.0] == 3


def test_tiers_output_schema_appends_to_input(spark):
    # tier is APPENDED so downstream consumers (budget sampler, tiered
    # sinks) keep their columns without a join back
    df = _df(spark, [1.0, 2.0, 3.0, 4.0]).withColumn("extra", F.lit(7))
    out = score_tiers(df, "s", 2)
    assert out.columns == ["doc_id", "s", "extra", "tier"]
    assert dict(out.dtypes)["tier"] == "bigint"


def test_null_scores_rejected(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None)], "doc_id long, s double"
    )
    with pytest.raises(ValueError, match="NULL"):
        tier_cutoffs(df, "s", 2)


def test_distinct_score_overflow_fail_fast(spark):
    df = _df(spark, [float(i) for i in range(10)])
    with pytest.raises(ValueError, match="distinct"):
        tier_cutoffs(df, "s", 2, max_distinct_scores=5)


def test_bad_args(spark):
    df = _df(spark, [1.0])
    with pytest.raises(ValueError, match="n_tiers"):
        tier_cutoffs(df, "s", 1)
    with pytest.raises(ValueError, match="empty"):
        tier_cutoffs(df.filter("s > 99"), "s", 2)


def test_nan_scores_rejected(spark):
    df = _df(spark, [1.0, float("nan")])
    with pytest.raises(ValueError, match="NaN"):
        tier_cutoffs(df, "s", 2)


def test_colliding_rank_targets_count_once(spark):
    # n=2, T=4: targets (2*t+3)//4 = [1,1,2] -> DISTINCT ranks [1,2]
    # -> cutoffs [1.0, 9.0], so the top doc is tier 1 (not 2) — the
    # same answer a SQL "rk IN (1,1,2)" oracle gives
    df = _df(spark, [1.0, 9.0])
    assert tier_cutoffs(df, "s", 4) == [1.0, 9.0]
    rows = {r["s"]: r["tier"] for r in score_tiers(df, "s", 4).collect()}
    assert rows == {1.0: 0, 9.0: 1}
