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


# ---------------------------------------------------------------------------
# paragraph granularity (remove_repeated_paragraphs)
# ---------------------------------------------------------------------------


def test_paragraph_boilerplate_removed_block_wise(spark):
    from table_ocr_spark.operators.textstats import (
        remove_repeated_paragraphs,
    )

    # the footer BLOCK spans two lines — line-level df would split it
    # into two keys; paragraph-level removes it as one unit
    footer = "legal disclaimer line one\nall rights reserved"
    rows = [
        (1, f"body one stays\n\n{footer}"),
        (2, f"body two stays\n\n{footer}\n\nextra tail two"),
        (3, f"{footer}\n\nbody three stays"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_repeated_paragraphs(_df(spark, rows)).collect()
    }
    assert out[1]["text_clean"] == "body one stays"
    assert out[2]["text_clean"] == "body two stays\n\nextra tail two"
    assert out[3]["text_clean"] == "body three stays"
    assert out[2]["n_paras"] == 3 and out[2]["n_kept"] == 2
    assert out[2]["n_dropped"] == 1


def test_paragraph_trim_and_blankline_normalization(spark):
    from table_ocr_spark.operators.textstats import (
        remove_repeated_paragraphs,
    )

    # '\n\n\n' splits the same as '\n\n' (the /\n{2,}/ pin) and the
    # trimmed key ignores a stray leading newline-ish whitespace
    rows = [
        (1, "AD BLOCK\n\n\nkeep me alpha\n\n\n\nkeep me beta"),
        (2, " AD BLOCK \n\nother body here"),
    ]
    out = {
        r["doc_id"]: r
        for r in remove_repeated_paragraphs(_df(spark, rows)).collect()
    }
    # kept paragraphs re-join with exactly one blank line
    assert out[1]["text_clean"] == "keep me alpha\n\nkeep me beta"
    assert out[2]["text_clean"] == "other body here"


def test_paragraph_line_variants_disagree_on_multiline_blocks(spark):
    from table_ocr_spark.operators.textstats import (
        remove_repeated_paragraphs,
    )

    # a block repeated across docs but with per-doc FIRST line:
    # paragraph keys differ (block not removed), line keys catch the
    # shared second line — the two granularities are complements
    rows = [
        (1, "intro one\nshared tagline here"),
        (2, "intro two\nshared tagline here"),
    ]
    para = {
        r["doc_id"]: r["text_clean"]
        for r in remove_repeated_paragraphs(_df(spark, rows)).collect()
    }
    line = {
        r["doc_id"]: r["text_clean"]
        for r in remove_repeated_lines(_df(spark, rows)).collect()
    }
    assert para[1] == "intro one\nshared tagline here"
    assert line[1] == "intro one"


def test_paragraph_min_doc_df_validation(spark):
    from table_ocr_spark.operators.textstats import (
        remove_repeated_paragraphs,
    )

    with pytest.raises(ValueError):
        remove_repeated_paragraphs(_df(spark, [(1, "x")]), min_doc_df=1)


def test_remove_repeated_lines_site_scoped(spark):
    """scope_col: the RefinedWeb variant — a line repeated across two
    docs of the SAME site is boilerplate; the identical line shared
    only across DIFFERENT sites survives."""
    from table_ocr_spark.operators.textstats import remove_repeated_lines

    docs = [
        (1, "nav menu\nunique one", "a.com"),
        (2, "nav menu\nunique two", "a.com"),
        (3, "nav menu\nunique three", "b.com"),  # only once on b.com
        (4, "solo line", None),
        (5, "solo line", None),  # NULL scopes share the '' scope
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, site string")
    got = {
        r["doc_id"]: r
        for r in remove_repeated_lines(df, scope_col="site").collect()
    }
    assert got[1]["text_clean"] == "unique one"
    assert got[2]["text_clean"] == "unique two"
    # b.com sees 'nav menu' once -> kept there
    assert got[3]["text_clean"] == "nav menu\nunique three"
    # NULL scopes coalesce to the same '' scope -> df 2 -> removed
    assert got[4]["text_clean"] == "" and got[4]["n_dropped"] == 1
    # global (unscoped) behavior unchanged: nav menu df=3 -> removed
    # everywhere
    g = {
        r["doc_id"]: r for r in remove_repeated_lines(df).collect()
    }
    assert g[3]["text_clean"] == "unique three"


def test_remove_repeated_paragraphs_site_scoped(spark):
    from table_ocr_spark.operators.textstats import (
        remove_repeated_paragraphs,
    )

    docs = [
        (1, "footer block\nlegal text\n\nbody one", "a.com"),
        (2, "footer block\nlegal text\n\nbody two", "a.com"),
        (3, "footer block\nlegal text\n\nbody three", "b.com"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, site string")
    got = {
        r["doc_id"]: r["text_clean"]
        for r in remove_repeated_paragraphs(df, scope_col="site").collect()
    }
    assert got[1] == "body one" and got[2] == "body two"
    assert got[3] == "footer block\nlegal text\n\nbody three"
