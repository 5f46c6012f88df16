"""Layer-1 kernel tests: string ops (F1-F4) + pinned normalization."""

from table_ocr_spark.kernel.textops import (
    extract_first_json,
    normalize_text,
    parse_markdown_table,
    parse_request_key,
    strip_json_codeblock,
)


class TestNormalize:
    def test_collapse_and_strip(self):
        assert normalize_text("  a \t b\n\nc  ") == "a b c"

    def test_nbsp_and_typographic_spaces(self):
        assert normalize_text("a b c　d") == "a b c d"

    def test_zero_width_dropped(self):
        assert normalize_text("a​b﻿c") == "abc"

    def test_nfc(self):
        # a + combining umlaut → precomposed ä
        assert normalize_text("ä") == "ä"

    def test_cjk_rtl_preserved(self):
        assert normalize_text("天地 玄黄") == "天地 玄黄"
        assert normalize_text("مرحبا  بالعالم") == "مرحبا بالعالم"


class TestFenceStrip:
    def test_json_fence(self):
        assert strip_json_codeblock('```json\n{"a": 1}\n```') == '{"a": 1}'

    def test_bare_fence(self):
        assert strip_json_codeblock("```\n{}\n```") == "{}"

    def test_fence_without_newline(self):
        # reference parser.py:28-30 branch
        assert strip_json_codeblock('```json{"a":1}```') == '{"a":1}'

    def test_no_fence_passthrough(self):
        assert strip_json_codeblock(' {"a":1} ') == '{"a":1}'

    def test_trailing_fence_only(self):
        assert strip_json_codeblock('{"a":1}\n```') == '{"a":1}'


class TestJsonRecovery:
    def test_embedded_object(self):
        obj, raw = extract_first_json('noise {"table": [1]} tail')
        assert obj == {"table": [1]}

    def test_greedy_dotall(self):
        obj, _ = extract_first_json('{"a":\n {"b": 2}}')
        assert obj == {"a": {"b": 2}}

    def test_fallback_to_text(self):
        obj, raw = extract_first_json("no json here")
        assert obj is None
        assert raw == "no json here"

    def test_malformed_falls_back(self):
        obj, _ = extract_first_json("{not json}")
        assert obj is None


class TestKeyParse:
    def test_simple(self):
        assert parse_request_key("doc_page_3_sample_2") == ("doc", 3, 2)

    def test_underscores_in_name(self):
        # reference batch.py:345-353: names may contain underscores
        assert parse_request_key("my_long_doc_name_page_12_sample_1") == (
            "my_long_doc_name", 12, 1,
        )

    def test_malformed_returns_none(self):
        assert parse_request_key("garbage") is None
        assert parse_request_key("doc_page_x_sample_1") is None


class TestMarkdownTable:
    def test_basic(self):
        t = "| a | b |\n|---|---|\n| 1 | 2 |\n| 3 | 4 |"
        assert parse_markdown_table(t) == [
            {"a": "1", "b": "2"}, {"a": "3", "b": "4"},
        ]

    def test_no_separator_row(self):
        # reference parser.py:142-146 tolerates missing separator
        t = "| a | b |\n| 1 | 2 |"
        assert parse_markdown_table(t) == [{"a": "1", "b": "2"}]

    def test_non_table_lines_skipped(self):
        t = "prose\n| a |\n|---|\n| 1 |\nmore prose"
        assert parse_markdown_table(t) == [{"a": "1"}]

    def test_short_row_padded(self):
        t = "| a | b |\n| 1 |"
        assert parse_markdown_table(t) == [{"a": "1", "b": ""}]


def test_fence_strip_python_jvm_parity_fuzz(spark):
    # F1's real contract: the python kernel twin and the codegen'd JVM
    # twin (schema_builder.strip_fences_col) agree byte-for-byte —
    # including pathological double-fenced inputs, where "strip ONE
    # fence" legitimately leaves a second fence in place.
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from table_ocr_spark.functions.schema_builder import strip_fences_col

    soup = st.lists(
        st.sampled_from(
            ["```json", "```", "\n", "{", "}", '"a": 1', " ", "text",
             "``", "`", "json", "```python\n"]
        ),
        max_size=8,
    ).map("".join)

    collected = []

    @settings(max_examples=150, deadline=None, derandomize=True,
              suppress_health_check=list(HealthCheck))
    @given(soup)
    def gather(s):
        collected.append(s)

    gather()
    cases = sorted(set(collected))
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    jvm = [r["o"] for r in df.select(strip_fences_col(F.col("s")).alias("o")).collect()]
    for c, j in zip(cases, jvm):
        assert strip_json_codeblock(c) == j, repr(c)


def test_markdown_empty_edge_cells_preserved():
    # `||x|` = empty first cell; strip("|") used to delete it and shift
    # every value under the wrong header
    rows = parse_markdown_table("|k|v|\n|---|---|\n||x|")
    assert rows == [{"k": "", "v": "x"}]
    rows2 = parse_markdown_table("|k|v|\n|---|---|\n|x||")
    assert rows2 == [{"k": "x", "v": ""}]
