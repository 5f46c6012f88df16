"""Majority-vote operator vs hand-computed expectations, reproducing
the reference's semantics (table_ocr/parser.py:39-126) including the
ambiguous / resolve_group branches and the pinned tie-break."""

import pytest

from table_ocr_spark.operators.vote import sample_majority_vote


@pytest.fixture(scope="module")
def samples(spark):
    # (doc, page, row_index) groups; 3 samples; value cols name/ort
    rows = [
        # group A: clean 3-sample agreement 2/3 on name, 3/3 on ort
        ("d1", 1, 0, 1, "Huber", "München"),
        ("d1", 1, 0, 2, "Huber", "München"),
        ("d1", 1, 0, 3, "Hüber", "München"),
        # group B: tie 1-1-1 → pinned tie-break picks lexicographic min
        ("d1", 1, 1, 1, "Meier", "Berlin"),
        ("d1", 1, 1, 2, "Mayer", "Berlin"),
        ("d1", 1, 1, 3, "Maier", "Berlin"),
        # group C: AMBIGUOUS (4 rows > 3 samples: sample 2 contributed twice)
        ("d1", 2, 0, 1, "Schmidt", "Köln"),
        ("d1", 2, 0, 2, "Schmidt", "Köln"),
        ("d1", 2, 0, 2, "Schmitt", "Bonn"),
        ("d1", 2, 0, 3, "Schmidt", "Köln"),
    ]
    return spark.createDataFrame(
        rows, "doc string, page int, row_index int, sample int, name string, ort string"
    )


KEYS = ["doc", "page", "row_index"]


def by_group(rows):
    return {(r["doc"], r["page"], r["row_index"]): r for r in rows}


def test_vote_basic_mode_and_agreement(spark, samples):
    out = by_group(sample_majority_vote(samples, KEYS).collect())
    a = out[("d1", 1, 0)]
    assert a["name"] == "Huber"
    assert a["name_agreement"] == pytest.approx(2 / 3)
    assert a["ort"] == "München"
    assert a["ort_agreement"] == pytest.approx(1.0)
    assert a["n_samples"] == 3
    assert a["ambiguous"] is False


def test_vote_tie_break_pinned_lexicographic(spark, samples):
    # deliberate deviation documented in SURVEY §2.4 A2: (count desc, value asc)
    out = by_group(sample_majority_vote(samples, KEYS).collect())
    b = out[("d1", 1, 1)]
    assert b["name"] == "Maier"  # min of {Meier, Mayer, Maier}
    assert b["name_agreement"] == pytest.approx(1 / 3)


def test_vote_ambiguous_flagged(spark, samples):
    out = by_group(sample_majority_vote(samples, KEYS).collect())
    c = out[("d1", 2, 0)]
    assert c["ambiguous"] is True
    assert c["name"] == "Schmidt"
    assert c["name_agreement"] == pytest.approx(3 / 4)
    assert c["n_samples"] == 4


def test_vote_resolve_group(spark, samples):
    # ambiguous groups re-keyed by (keys + resolve_group) — parser.py:100-110
    out = sample_majority_vote(
        samples, KEYS, resolve_group="sample"
    ).collect()
    amb = [r for r in out if r["ambiguous"]]
    # group C splits into 3 sample-rows (sample 2 has 2 rows → one voted row)
    assert {(r["sample"]) for r in amb} == {1, 2, 3}
    s2 = [r for r in amb if r["sample"] == 2][0]
    assert s2["name"] == "Schmidt"  # tie 1-1 → lexicographic min
    unamb = [r for r in out if not r["ambiguous"]]
    assert all(r["sample"] is None for r in unamb)  # diagonal union fills null


def test_vote_explicit_n_samples(spark, samples):
    # n_samples=4 → nothing exceeds it → no ambiguous rows
    out = sample_majority_vote(samples, KEYS, n_samples=4).collect()
    assert all(not r["ambiguous"] for r in out)


def test_vote_preserves_numeric_dtype(spark):
    df = spark.createDataFrame(
        [("g", 1, 10), ("g", 2, 10), ("g", 3, 99)],
        "k string, sample int, val int",
    )
    out = sample_majority_vote(df, ["k"]).collect()
    assert out[0]["val"] == 10 and isinstance(out[0]["val"], int)


def test_vote_nulls_votable(spark):
    df = spark.createDataFrame(
        [("g", 1, None), ("g", 2, None), ("g", 3, "x")],
        "k string, sample int, val string",
    )
    out = sample_majority_vote(df, ["k"]).collect()
    assert out[0]["val"] is None
    assert out[0]["val_agreement"] == pytest.approx(2 / 3)


def test_vote_column_names_with_quotes_and_backticks(spark):
    # quotes in header names (routine in OCR'd tables) must work; a
    # backtick gets a clear API-boundary error, not a ParseException
    # deep in the plan
    df = spark.createDataFrame(
        [(1, 1, "x", "y"), (1, 2, "x", "y"), (1, 3, "x", "z")],
        ["doc_id", "sample", "qty's", "n items"],
    )
    out = sample_majority_vote(df, group_by_cols=["doc_id"])
    r = out.collect()[0]
    assert r["qty's"] == "x" and r["n items"] == "y"

    bad = spark.createDataFrame(
        [(1, 1, "x")], ["doc_id", "sample", "a`b"]
    )
    with pytest.raises(ValueError, match="backtick"):
        sample_majority_vote(bad, group_by_cols=["doc_id"]).collect()

def test_vote_column_names_with_dots(spark):
    """Round-5 regression: a voted column named 'price.usd' parsed as
    struct-field access in the post-pivot select and failed analysis;
    references are backtick-quoted now."""
    df = spark.createDataFrame(
        [(1, 1, "9.99"), (1, 2, "9.99"), (1, 3, "8.00")],
        ["doc_id", "sample", "price.usd"],
    )
    out = sample_majority_vote(df, ["doc_id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["price.usd"] == "9.99"
    assert abs(r["price.usd_agreement"] - 2 / 3) < 1e-9
    assert r["n_samples"] == 3

