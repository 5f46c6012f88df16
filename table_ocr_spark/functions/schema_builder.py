"""Dynamic output-schema compilation + payload decoding — the
reference's core user-facing data path, re-expressed on Spark types.

Reference parity:
- ``SchemaField``/``OutputSchema`` (``ui/models.py:45-190``): a flat,
  user-declared schema of STRING|INTEGER|BOOLEAN|NUMBER fields with a
  ``required`` flag, always wrapped as ``{"table": ARRAY<OBJECT>}``
  (``ui/models.py:164-178``, ``table_ocr/config.py:55-99``). The
  reference compiles it to a Pydantic model / genai Schema at runtime;
  here it compiles to a ``StructType`` the same way.
- Payload decode (``table_ocr/batch.py:456-501``, K4): fence strip (F1)
  → JSON parse → permissive coercion (``strict=False``) → one row per
  table entry with provenance columns. Here: ``regexp_replace`` +
  ``from_json`` in PERMISSIVE mode (mis-typed values become null, rows
  never reject the batch) → ``posexplode`` for positional row identity
  (W2 — array position, never physical order).

Everything is JVM-side; the dynamic schema only shapes the plan.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ui/models.py:104-109 / table_ocr/pydantic_schemas.py:155-161
_TYPE_MAP = {
    "STRING": T.StringType(),
    "INTEGER": T.LongType(),
    "BOOLEAN": T.BooleanType(),
    "NUMBER": T.DoubleType(),
}


@dataclass(frozen=True)
class SchemaField:
    """≙ ``ui/models.py:45-65``."""

    name: str
    field_type: str = "STRING"
    required: bool = False

    def spark_type(self) -> T.DataType:
        try:
            return _TYPE_MAP[self.field_type]
        except KeyError:
            raise ValueError(
                f"unsupported field type {self.field_type!r}; "
                f"one of {sorted(_TYPE_MAP)}"
            ) from None


def build_row_schema(fields: Sequence[SchemaField]) -> T.StructType:
    """Compile the flat row schema (≙ the Pydantic build at
    ``ui/models.py:90-134``). Optional fields are nullable — the
    reference defaults them to None (``ui/models.py:120-121``)."""
    return T.StructType(
        [
            T.StructField(f.name, f.spark_type(), nullable=True)
            for f in fields
        ]
    )


def build_payload_schema(fields: Sequence[SchemaField]) -> T.StructType:
    """The fixed one-level wrapper ``{"table": ARRAY<OBJECT>}``
    (``ui/models.py:164-178``); no deeper nesting exists by design
    (``ui/models.py:180-189``)."""
    return T.StructType(
        [T.StructField("table", T.ArrayType(build_row_schema(fields)))]
    )


# python str.strip() whitespace (str.isspace set) as a Java regex
# class — Spark's trim() strips ASCII SPACES ONLY and Java's $ matches
# before a trailing newline, both of which silently diverged from the
# python kernel on '\n'-padded payloads (found by differential fuzz)
_PY_WS = (
    "[ \\t\\n\\x0B\\f\\r\\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]"
)


def _py_strip(col: Column) -> Column:
    return F.regexp_replace(col, f"^{_PY_WS}+|{_PY_WS}+$", "")


def strip_fences_col(col: Column) -> Column:
    """F1 as a codegen'd expression — the JVM twin of
    ``kernel.textops.strip_json_codeblock``, byte-for-byte (locked by a
    differential fuzz test): python-equivalent whitespace strip, the
    fence LINE cut through the first newline when one exists (else the
    bare fence prefix), and the trailing fence matched with ``\\z``
    (Java ``$`` would also fire before a final newline, where the
    python twin does not)."""
    s = _py_strip(col)
    has_nl_fence = s.rlike("^```[^\\n]*\\n")
    s = F.when(
        has_nl_fence, F.regexp_replace(s, "^```[^\\n]*\\n", "")
    ).otherwise(F.regexp_replace(s, "^```[A-Za-z0-9_-]*", ""))
    s = F.regexp_replace(s, "```\\z", "")
    return _py_strip(s)


def decode_table_payload(
    df: DataFrame,
    fields: Sequence[SchemaField],
    payload_col: str = "payload",
    provenance: Optional[List[str]] = None,
) -> DataFrame:
    """Payload strings → typed rows (≙ ``parse_table_ocr_into_dataframe``,
    ``table_ocr/batch.py:456-501``): provenance columns ride along,
    ``row_index`` is the table-array position, and malformed payloads
    yield zero rows for that document (the reference's skip-and-log,
    ``batch.py:472-493``) rather than failing the job."""
    provenance = provenance if provenance is not None else []
    schema = build_payload_schema(fields)
    parsed = df.select(
        *provenance,
        F.from_json(
            strip_fences_col(F.col(payload_col)),
            schema,
            {"mode": "PERMISSIVE"},
        ).alias("_doc"),
    )
    rows = parsed.select(
        *provenance, F.posexplode_outer("_doc.table").alias("row_index", "_r")
    ).filter(F.col("_r").isNotNull())
    return rows.select(
        *provenance,
        F.col("row_index").cast("long").alias("row_index"),
        *[F.col(f"_r.{f.name}").alias(f.name) for f in fields],
    )


def encode_results_payload(
    decoded: DataFrame,
    fields: Sequence[SchemaField],
    url_col: str = "url",
    page_col: str = "page",
    sample_col: str = "sample",
    domain: Optional[DataFrame] = None,
    max_span: int = 10_000,
) -> DataFrame:
    """Inverse of :func:`decode_table_payload` — re-serialize typed rows
    into the reference's persisted result structure
    ``results[page][sample] = '{"table": [...]}'``
    (``ui/pages/projects.py:208-217``, S7/F6). Row order inside a table
    comes from ``row_index`` (positional identity, never physical
    order); page/sample arrays are position-sorted the same way.

    Output: one row per url with ``results ARRAY<ARRAY<STRING>>`` and
    ``num_pages`` — the exact shape the reference writes, minus the
    run-metadata scalars (project/prompt/timestamp), which join in from
    the catalog/lineage tables.

    The arrays are DENSE: a (page, sample) slot whose payload decoded to
    zero rows (malformed JSON, empty table) still occupies its position,
    as an empty-table payload ``{"table": []}`` — otherwise later pages/
    samples silently shift to wrong array indices and ``num_pages``
    undercounts. By default the slot domain is the per-url
    ``[min..max]`` span of observed pages × samples; pass ``domain``
    (a ``(url, page, sample)`` DataFrame, e.g. built from the request
    manifest) when LEADING or trailing slots may be missing entirely —
    a first or last page whose every sample failed is unknowable from
    the decoded rows alone (the producer's index base — 0 or 1 — is
    not derivable either, which is why the default deliberately spans
    only the observed range instead of assuming a zero origin).

    ``max_span`` bounds the default densify domain: page and sample
    indices come from UNTRUSTED decoded payloads, and one corrupt huge
    index would make ``sequence(min..max)`` materialize millions of
    filler slots (or exceed Spark's array-element limit and fail the
    stage with no culprit named). A span wider than ``max_span`` fails
    fast naming the offending url (distributed check — no extra driver
    action). Real documents are thousands of pages at most; raise the
    bound deliberately if yours are wider.
    """
    row_struct = F.struct(
        F.col("row_index"), *[F.col(f.name) for f in fields]
    )
    per_sample = (
        decoded.groupBy(url_col, page_col, sample_col)
        .agg(F.sort_array(F.collect_list(row_struct)).alias("_rows"))
        .select(
            url_col,
            page_col,
            sample_col,
            F.to_json(
                F.struct(
                    F.transform(
                        "_rows", lambda r: r.dropFields("row_index")
                    ).alias("table")
                ),
                # keep null optional fields in the payload: the
                # reference's Pydantic rows persist '"field": null'
                # (ui/models.py:120-121); Spark's default drops the key
                {"ignoreNullFields": "false"},
            ).alias("_payload"),
        )
    )
    if domain is None:
        bounds = decoded.groupBy(url_col).agg(
            F.min(page_col).alias("_p0"),
            F.max(page_col).alias("_p1"),
            F.min(sample_col).alias("_s0"),
            F.max(sample_col).alias("_s1"),
        )
        # span guard BEFORE the explode: the guard is woven into a
        # column the sequence() actually consumes (_p0), so Catalyst
        # cannot prune it away; raise_error names the offending url
        span_bad = (
            (F.col("_p1") - F.col("_p0") >= max_span)
            | (F.col("_s1") - F.col("_s0") >= max_span)
        )
        guarded_p0 = F.when(
            ~span_bad, F.col("_p0")
        ).otherwise(
            F.raise_error(
                F.concat_ws(
                    "",
                    F.lit(
                        "encode_results_payload: page/sample index span "
                        f"exceeds max_span={max_span} for url="
                    ),
                    F.col(url_col),
                    F.lit(" (corrupt index in decoded payload? raise "
                          "max_span only if the document is really "
                          "this wide)"),
                )
            )
        )
        bounds = bounds.select(
            url_col, guarded_p0.alias("_p0"), "_p1", "_s0", "_s1"
        )
        domain = bounds.select(
            url_col,
            F.explode(F.sequence("_p0", "_p1")).alias(page_col),
            "_s0",
            "_s1",
        ).select(
            url_col,
            page_col,
            F.explode(F.sequence("_s0", "_s1")).alias(sample_col),
        )
    per_sample = domain.join(
        per_sample, [url_col, page_col, sample_col], "left"
    ).withColumn("_payload", F.coalesce("_payload", F.lit('{"table": []}')))
    per_page = (
        per_sample.groupBy(url_col, page_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(sample_col), F.col("_payload")))
            ).alias("_samples")
        )
        .select(
            url_col,
            page_col,
            F.transform("_samples", lambda s: s.getField("_payload")).alias("_page_arr"),
        )
    )
    return (
        per_page.groupBy(url_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(page_col), F.col("_page_arr")))
            ).alias("_pages")
        )
        .select(
            url_col,
            F.transform("_pages", lambda p: p.getField("_page_arr")).alias("results"),
            F.size("_pages").cast("long").alias("num_pages"),
        )
    )


def required_violations(
    decoded: DataFrame, fields: Sequence[SchemaField]
) -> DataFrame:
    """Rows where a ``required`` field is null (the reference coerces
    rather than rejects — ``strict=False`` — so validation is a
    separate, queryable concern)."""
    req = [f.name for f in fields if f.required]
    if not req:
        return decoded.limit(0)
    cond = None
    for name in req:
        c = F.col(name).isNull()
        cond = c if cond is None else (cond | c)
    return decoded.filter(cond)
