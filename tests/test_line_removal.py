"""Corpus-level repeated-line removal: cross-document df counting on
trimmed keys, order-preserving reassembly, whitespace-line immunity."""

import pytest

from table_ocr_spark.operators.textstats import remove_repeated_lines


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_removed_everywhere_body_kept_in_order(spark):
    rows = [
        (1, "NAV MENU\nunique one\nmore body 1\nCOPYRIGHT FOOT"),
        (2, "NAV MENU\nunique two\nCOPYRIGHT FOOT"),
        (3, "NAV MENU\nunique three\nCOPYRIGHT FOOT"),
    ]
    out = {r["doc_id"]: r for r in
           remove_repeated_lines(_df(spark, rows)).collect()}
    assert out[1]["text_clean"] == "unique one\nmore body 1"
    assert out[2]["text_clean"] == "unique two"
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 2
    assert out[1]["n_dropped"] == 2


def test_trimmed_key_matches_across_indentation(spark):
    # '  NAV ' and '\tNAV\r' share the trimmed key -> both removed
    rows = [(1, "  NAV \nbody a"), (2, "\tNAV\r\nbody b")]
    out = {r["doc_id"]: r["text_clean"] for r in
           remove_repeated_lines(_df(spark, rows)).collect()}
    assert out == {1: "body a", 2: "body b"}


def test_min_doc_df_threshold_and_within_doc_repeats(spark):
    # 'dup' appears twice WITHIN doc 1 only: doc-df = 1 < 3 -> kept
    rows = [
        (1, "dup\ndup\nx"),
        (2, "shared\ny"),
        (3, "shared\nz"),
        (4, "shared\nw"),
    ]
    out = {r["doc_id"]: r["text_clean"] for r in
           remove_repeated_lines(_df(spark, rows), min_doc_df=3).collect()}
    assert out[1] == "dup\ndup\nx"
    assert out[2] == "y"


def test_whitespace_lines_are_structure_never_removed(spark):
    rows = [(1, "a\n\nb"), (2, "c\n\nd"), (3, "e\n\nf")]
    out = {r["doc_id"]: r["text_clean"] for r in
           remove_repeated_lines(_df(spark, rows)).collect()}
    assert out[1] == "a\n\nb"


def test_fully_boilerplate_doc_and_null_text(spark):
    rows = [(1, "SAME"), (2, "SAME"), (3, None)]
    out = {r["doc_id"]: r for r in
           remove_repeated_lines(_df(spark, rows)).collect()}
    assert out[1]["text_clean"] == "" and out[1]["n_dropped"] == 1
    assert out[3]["text_clean"] == "" and out[3]["n_lines"] == 1
    assert out[3]["n_dropped"] == 0  # empty line is structure, kept


def test_min_doc_df_validation(spark):
    with pytest.raises(ValueError, match="min_doc_df"):
        remove_repeated_lines(_df(spark, [(1, "x")]), min_doc_df=1)
