"""Pure-Python extraction kernel — ZERO Spark imports.

The same functions run (a) standalone under pytest to produce golden
outputs and (b) inside Arrow-batched UDFs on executors. One
implementation ⇒ byte-identical extraction by construction
(SURVEY.md §7.0).
"""

from table_ocr_spark.kernel.html_extract import ExtractionResult, extract_html
from table_ocr_spark.kernel.textops import (
    extract_first_json,
    normalize_text,
    parse_markdown_table,
    parse_request_key,
    strip_json_codeblock,
)

__all__ = [
    "ExtractionResult",
    "extract_html",
    "normalize_text",
    "strip_json_codeblock",
    "extract_first_json",
    "parse_request_key",
    "parse_markdown_table",
]
