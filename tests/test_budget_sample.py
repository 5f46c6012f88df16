"""Token-budget sampling: exact-integer membership rule, closed-form
reproducibility from the recipe, mix routing, and the driver-safety
fail-fasts."""

import hashlib

import pytest

from table_ocr_spark.operators.sampling import (
    token_budget_fractions,
    token_budget_sample,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, tier long, n_tokens long"
    )


def _kept_ids(df):
    return {r["doc_id"] for r in df.collect()}


def _python_member(doc_id, b, t):
    u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:16], 16)
    return u * t < b * (1 << 64)


def test_fractions_proportional(spark):
    # two tiers, totals 100 and 300; budget 200 of 400 -> B = 50, 150
    rows = [(1, 0, 100), (2, 1, 100), (3, 1, 200)]
    fr = token_budget_fractions(_df(spark, rows), 200)
    assert fr == {0: (50, 100), 1: (150, 300)}


def test_fractions_mix_ppm_snap_and_cap(spark):
    rows = [(1, 0, 100), (2, 1, 100)]
    # mix asks 90% of 150 = 135 from tier 0 (caps at T=100), 10% = 15
    fr = token_budget_fractions(
        _df(spark, rows), 150, mix={0: 0.9, 1: 0.1}
    )
    assert fr == {0: (100, 100), 1: (15, 100)}
    # a stratum absent from mix gets B=0
    fr2 = token_budget_fractions(_df(spark, rows), 150, mix={0: 1.0})
    assert fr2[1] == (0, 100)


def test_membership_matches_closed_form(spark):
    # the kept set must be re-derivable from (key, B_s, T_s) alone —
    # recompute membership in pure python and compare exactly
    rows = [(i, i % 3, 10 + i) for i in range(200)]
    df = _df(spark, rows)
    budget = 1500
    fr = token_budget_fractions(df, budget)
    kept = _kept_ids(token_budget_sample(df, budget))
    want = {
        i
        for (i, tier, _) in rows
        if _python_member(i, fr[tier][0], fr[tier][1])
    }
    assert kept == want
    assert 0 < len(kept) < len(rows)


def test_full_budget_keeps_all_zero_keeps_none(spark):
    rows = [(i, 0, 5) for i in range(50)]
    df = _df(spark, rows)
    assert len(_kept_ids(token_budget_sample(df, 10**9))) == 50
    assert _kept_ids(token_budget_sample(df, 0)) == set()


def test_partitioning_invariance(spark):
    rows = [(i, i % 2, 7) for i in range(120)]
    df = _df(spark, rows)
    a = _kept_ids(token_budget_sample(df.repartition(2), 300))
    b = _kept_ids(token_budget_sample(df.repartition(13), 300))
    assert a == b


def test_null_stratum_sampled_not_dropped(spark):
    rows = [(i, None if i < 60 else 0, 10) for i in range(120)]
    df = spark.createDataFrame(
        rows, "doc_id long, tier long, n_tokens long"
    )
    kept = token_budget_sample(df, 600).collect()
    # proportional split: the NULL stratum holds half the tokens and
    # must contribute, not silently vanish through the map literal
    assert any(r["tier"] is None for r in kept)


def test_fail_fasts(spark):
    df = _df(spark, [(1, 0, 10)])
    with pytest.raises(ValueError, match="budget"):
        token_budget_fractions(df, -1)
    with pytest.raises(ValueError, match="NULL or negative"):
        token_budget_fractions(_df(spark, [(1, 0, -5)]), 10)
    with pytest.raises(ValueError, match="NULL or negative"):
        token_budget_fractions(
            spark.createDataFrame(
                [(1, 0, None)], "doc_id long, tier long, n_tokens long"
            ),
            10,
        )
    with pytest.raises(ValueError, match="distinct strata"):
        token_budget_fractions(
            _df(spark, [(i, i, 1) for i in range(5)]), 3, max_strata=2
        )


def test_stratum_weight_exactness_bound(spark):
    from table_ocr_spark.operators.sampling import _MAX_STRATUM_WEIGHT

    df = _df(spark, [(1, 0, _MAX_STRATUM_WEIGHT + 1)])
    with pytest.raises(ValueError, match="exactness bound"):
        token_budget_fractions(df, 10)


def test_null_weight_in_mixed_stratum_rejected(spark):
    # min() skips NULLs, so this must be caught by the count-vs-count
    # guard, not the min guard
    df = spark.createDataFrame(
        [(1, 0, None), (2, 0, 100)], "doc_id long, tier long, n_tokens long"
    )
    with pytest.raises(ValueError, match="NULL or negative"):
        token_budget_fractions(df, 10)


def test_upsample_multi_epoch_exact_rule(spark):
    # budget 2.5x the stratum total: every doc gets epochs {0,1}; the
    # residual epoch 2 lands on exactly the md5-rule members for
    # R = B mod T — bit-pinned against the Python twin
    from table_ocr_spark.operators.sampling import token_budget_upsample

    df = _df(spark, [(i, 0, 10) for i in range(100)])  # T = 1000
    per_doc = {}
    for r in token_budget_upsample(df, 2500).collect():
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(v) == list(range(len(v))) for v in per_doc.values())
    assert all(len(v) in (2, 3) for v in per_doc.values())
    expect3 = {i for i in range(100) if _python_member(i, 500, 1000)}
    assert {d for d, v in per_doc.items() if len(v) == 3} == expect3


def test_upsample_under_budget_degenerates_to_sample(spark):
    from table_ocr_spark.operators.sampling import token_budget_upsample

    df = _df(spark, [(i, i % 2, 10 + i) for i in range(60)])
    up = token_budget_upsample(df, 300).collect()
    assert {r["doc_id"] for r in up} == _kept_ids(
        token_budget_sample(df, 300)
    )
    assert all(r["epoch"] == 0 for r in up)


def test_upsample_guards(spark):
    from table_ocr_spark.operators.sampling import token_budget_upsample

    df = _df(spark, [(1, 0, 10)])
    with pytest.raises(ValueError, match="max_epochs"):
        token_budget_upsample(df, 10**6, max_epochs=100)
    with pytest.raises(ValueError, match="epoch"):
        token_budget_upsample(df.withColumn("epoch", df.doc_id), 10)


def test_upsample_null_and_zero_weight_strata(spark):
    # NULL stratum rides via the fallback plan; zero-weight stratum
    # keeps all rows once iff its budget is positive (sample parity)
    from table_ocr_spark.operators.sampling import token_budget_upsample

    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 10), (3, "z", 0)],
        "doc_id long, tier string, n_tokens long",
    )
    out = token_budget_upsample(
        df, 100, mix={None: 0.8, "z": 0.2}
    ).collect()
    by_doc = {r["doc_id"]: r["epoch"] for r in out}
    # NULL stratum: B=80, T=20 -> 4 full epochs each
    assert sorted(e for r in out for e in [r["epoch"]] if r["doc_id"] == 1) \
        == [0, 1, 2, 3]
    # zero-weight stratum with positive budget: one epoch-0 copy
    assert by_doc.get(3) == 0


# ---------------------------------------------------------------------------
# UniMax waterfilling (round 5)
# ---------------------------------------------------------------------------


def test_unimax_fractions_waterfill_shape(spark):
    from table_ocr_spark.operators.sampling import unimax_fractions

    # strata totals 10 / 20 / 70, max_epochs=2 -> caps 20 / 40 / 140.
    # budget 90: sorted by cap asc -> a(20): 20*3=60 <= 90 -> capped;
    # b(40): 40*2=80 <= 70? no -> uncapped; R=70 over {b,c}: 35 each.
    rows = [(1, 0, 10), (2, 1, 20), (3, 2, 70)]
    fr = unimax_fractions(
        _df(spark, rows), 90, max_epochs=2, strata_col="tier"
    )
    assert fr == {0: (20, 10), 1: (35, 20), 2: (35, 70)}


def test_unimax_remainder_goes_to_first_uncapped_in_order(spark):
    from table_ocr_spark.operators.sampling import unimax_fractions

    # equal caps, budget not divisible: 3 strata caps 100 each,
    # budget 100 -> nobody capped (100*3 > 100); base 33 rem 1 ->
    # the FIRST stratum in (cap, str(s)) order gets the extra token
    rows = [(1, 0, 100), (2, 1, 100), (3, 2, 100)]
    fr = unimax_fractions(
        _df(spark, rows), 100, max_epochs=1, strata_col="tier"
    )
    assert fr == {0: (34, 100), 1: (33, 100), 2: (33, 100)}


def test_unimax_budget_above_total_cap_leaves_excess_unspent(spark):
    from table_ocr_spark.operators.sampling import unimax_fractions

    rows = [(1, 0, 10), (2, 1, 20)]
    fr = unimax_fractions(
        _df(spark, rows), 10_000, max_epochs=3, strata_col="tier"
    )
    # every stratum at max_epochs, nothing more
    assert fr == {0: (30, 10), 1: (60, 20)}


def test_unimax_allocations_sum_exactly(spark):
    from table_ocr_spark.operators.sampling import unimax_fractions

    rows = [(i, i % 5, (i * 37) % 90 + 1) for i in range(40)]
    df = _df(spark, rows)
    caps_total = sum((r[2]) for r in rows) * 2
    for budget in (0, 1, 17, 500, caps_total, caps_total + 5):
        fr = unimax_fractions(df, budget, max_epochs=2, strata_col="tier")
        assert sum(b for b, _ in fr.values()) == min(budget, caps_total)
        # per-stratum epoch cap holds by construction
        assert all(b <= 2 * t for b, t in fr.values())


def test_unimax_sample_emits_capped_stratum_at_max_epochs(spark):
    from table_ocr_spark.operators.sampling import unimax_sample

    # tier 0 tiny (capped -> exactly 2 full epochs, no residual);
    # tier 1 huge (waterfilled -> 0 full epochs + residual)
    rows = [(1, 0, 5), (2, 0, 5), (100, 1, 400), (101, 1, 400)]
    out = unimax_sample(
        _df(spark, rows), 120, max_epochs=2, strata_col="tier"
    ).collect()
    t0 = [r for r in out if r["tier"] == 0]
    # both tier-0 docs appear with epochs {0, 1}, nothing else
    assert sorted((r["doc_id"], r["epoch"]) for r in t0) == [
        (1, 0), (1, 1), (2, 0), (2, 1),
    ]
    # tier 1 got B=100 of T=800 -> residual-only membership rule
    t1 = [r for r in out if r["tier"] == 1]
    assert all(r["epoch"] == 0 for r in t1)
    expect = {d for d in (100, 101) if _python_member(d, 100, 800)}
    assert {r["doc_id"] for r in t1} == expect


def test_unimax_validation(spark):
    from table_ocr_spark.operators.sampling import unimax_fractions

    df = _df(spark, [(1, 0, 10)])
    with pytest.raises(ValueError, match="budget"):
        unimax_fractions(df, -1, strata_col="tier")
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_fractions(df, 10, max_epochs=0, strata_col="tier")


def test_unimax_emission_is_map_only(spark):
    """After the bounded planning aggregate, the emission itself must
    be a map-only explode over literals — no exchange, no join (the
    token_budget_upsample shape, inherited through the fractions=
    hook)."""
    from table_ocr_spark.operators.sampling import unimax_sample

    df = _df(spark, [(i, i % 3, 10 + i) for i in range(30)])
    out = unimax_sample(df, 400, max_epochs=2, strata_col="tier")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_waterfill_matches_bruteforce_reference():
    """The closed-form waterfill vs an independent binary-search-on-
    level reference over randomized cases (no Spark needed) — the
    allocation law itself, not just the Spark plumbing."""
    import random

    from table_ocr_spark.operators.sampling import waterfill

    def brute(caps, budget):
        order = sorted(caps, key=lambda s: (caps[s], str(s)))
        lo, hi = 0, max(caps.values()) if caps else 0
        spent = lambda L: sum(min(c, L) for c in caps.values())  # noqa: E731
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if spent(mid) <= budget:
                lo = mid
            else:
                hi = mid - 1
        alloc = {s: min(c, lo) for s, c in caps.items()}
        left = budget - sum(alloc.values())
        for s in order:
            if left <= 0:
                break
            if alloc[s] < caps[s]:
                alloc[s] += 1
                left -= 1
        return alloc

    rng = random.Random(7)
    for _ in range(2000):
        n = rng.randint(1, 6)
        caps = {f"s{i}": rng.randint(0, 150) for i in range(n)}
        budget = rng.randint(0, sum(caps.values()) + 30)
        a = waterfill(caps, budget)
        assert a == brute(caps, budget), (caps, budget)
        assert sum(a.values()) == min(budget, sum(caps.values()))
