"""WAT sink + source: Common-Crawl-style metadata sidecar records.

Completes the crawl artifact trio (WARC capture → WET extracted text →
WAT metadata): one ``WARC-Type: metadata`` record per capture whose
body is a JSON envelope carrying the capture headers, HTTP response
facts, page head metadata (title) and the FULL outlink list — the file
every link-graph / anchor-text consumer reads instead of re-scanning
the raw HTML. The reference keeps per-document metadata inside its
result JSONs (``table_ocr/core.py`` result sink); at crawl scale the
sidecar IS the contract, so downstream graph jobs never touch the
100-TB HTML column.

Pinned JSON envelope (a deterministic subset of the CC WAT shape —
field names match CC so existing WAT tooling reads it; absent
signals are '' / empty list, the page_metadata convention):

    {"Envelope": {
       "WARC-Header-Metadata": {"WARC-Target-URI": ..., "WARC-Date": ...,
                                "WARC-Type": "response"},
       "Payload-Metadata": {"HTTP-Response-Metadata": {
          "Headers": {"Content-Type": ...},
          "Response-Message": {"Status": ...},
          "HTML-Metadata": {
             "Head": {"Title": ...},
             "Links": [{"url": <href VERBATIM — relative links
                        included, resolution is the downstream
                        resolve_href step>, "path": "A@/href",
                        "nofollow": bool}, ...]}}}}}

Everything JVM-side: the envelope is ``to_json(struct(...))`` over the
same pinned anchor/title regexes the link-graph and page-metadata
operators use (single source of each pattern), so building WAT for
10^12 pages is one map-only pass with zero Python in the hot path.
The sink shares :func:`~table_ocr_spark.sources.wet.write_member_files`
(one exchange, deterministic bytes, gzip members, resume-idempotent);
the source round-trips through ``read_warc(warc_types=("metadata",))``
+ ``from_json`` — pinned in tests: write_wat → read_wat recovers url,
ts, title, status, content-type and the exact ordered link list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from table_ocr_spark.operators.linkgraph import (
    ANCHOR_HREF_RE,
    ANCHOR_TAG_RE,
    NOFOLLOW_RE,
)
from table_ocr_spark.operators.pagemeta import TITLE_RE, _TRIM_RE
from table_ocr_spark.sources.warc import header_value
from table_ocr_spark.sources.wet import (
    _WET_HDR_END,
    warc_ts_str,
    write_member_files,
)

_LINK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("nofollow", T.BooleanType()),
        ]
    )
)

# read-back schema for from_json (hyphenated names are plain struct
# field names — quoted on access)
WAT_ENVELOPE_SCHEMA = T.StructType([
    T.StructField("Envelope", T.StructType([
        T.StructField("WARC-Header-Metadata", T.StructType([
            T.StructField("WARC-Target-URI", T.StringType()),
            T.StructField("WARC-Date", T.StringType()),
            T.StructField("WARC-Type", T.StringType()),
        ])),
        T.StructField("Payload-Metadata", T.StructType([
            T.StructField("HTTP-Response-Metadata", T.StructType([
                T.StructField("Headers", T.StructType([
                    T.StructField("Content-Type", T.StringType()),
                ])),
                T.StructField("Response-Message", T.StructType([
                    T.StructField("Status", T.IntegerType()),
                ])),
                T.StructField("HTML-Metadata", T.StructType([
                    T.StructField("Head", T.StructType([
                        T.StructField("Title", T.StringType()),
                    ])),
                    T.StructField("Links", _LINK_SCHEMA),
                ])),
            ])),
        ])),
    ])),
])


def wat_record_bytes(url: str, ts_iso: str, payload_json: str) -> bytes:
    """One ``metadata`` record (uncompressed). Python twin — single
    source of the grammar, same contract style as wet_record_bytes."""
    body = payload_json.encode("utf-8")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        + f"WARC-Target-URI: {header_value(url)}\r\n".encode("utf-8")
        + f"WARC-Date: {header_value(ts_iso)}\r\n".encode("ascii")
        + b"Content-Type: application/json\r\n"
        + f"Content-Length: {len(body)}\r\n".encode("ascii")
        + b"\r\n"
    )
    return head + body + _WET_HDR_END


def build_wat_payload(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    status_col: str | None = None,
    ctype_col: str | None = None,
) -> DataFrame:
    """Pages → (url, _ts, wat_json): the JSON envelope, built entirely
    JVM-side (regex scan + to_json; zero Python, zero exchange).
    ``status_col`` / ``ctype_col`` are optional — absent facts pin to
    200 / '' so the envelope schema is stable either way."""
    s = F.col(html_col).cast("string")
    tags = F.expr(
        f"regexp_extract_all(CAST({html_col} AS STRING), "
        f"'{ANCHOR_TAG_RE}', 1)"
    )
    links = F.transform(
        F.filter(
            tags, lambda a: F.regexp_extract(a, ANCHOR_HREF_RE, 1) != ""
        ),
        lambda a: F.struct(
            F.regexp_extract(a, ANCHOR_HREF_RE, 1).alias("url"),
            F.lit("A@/href").alias("path"),
            a.rlike(NOFOLLOW_RE).alias("nofollow"),
        ),
    )
    title = F.regexp_replace(F.regexp_extract(s, TITLE_RE, 1), _TRIM_RE, "")
    status = (
        F.col(status_col).cast("int") if status_col else F.lit(200)
    )
    ctype = F.col(ctype_col) if ctype_col else F.lit("")
    ts_str = warc_ts_str(df, ts_col)
    envelope = F.struct(
        F.struct(
            F.struct(
                F.col(url_col).alias("WARC-Target-URI"),
                ts_str.alias("WARC-Date"),
                F.lit("response").alias("WARC-Type"),
            ).alias("WARC-Header-Metadata"),
            F.struct(
                F.struct(
                    F.struct(ctype.alias("Content-Type")).alias("Headers"),
                    F.struct(status.alias("Status")).alias(
                        "Response-Message"
                    ),
                    F.struct(
                        F.struct(title.alias("Title")).alias("Head"),
                        links.alias("Links"),
                    ).alias("HTML-Metadata"),
                ).alias("HTTP-Response-Metadata"),
            ).alias("Payload-Metadata"),
        ).alias("Envelope"),
    )
    return df.select(
        F.col(url_col).alias("url"),
        ts_str.alias("_ts"),
        F.to_json(envelope).alias("wat_json"),
    )


def write_wat(
    df: DataFrame,
    path: str,
    n_files: int = 8,
    html_col: str = "html",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    status_col: str | None = None,
    ctype_col: str | None = None,
    opener=None,
) -> DataFrame:
    """Write the WAT sidecar for ``df`` as ``n_files`` deterministic
    ``.warc.wat.gz`` files under ``path``; returns the per-file
    manifest (file, n_records, n_bytes), eagerly materialized.
    ``opener``: see :mod:`table_ocr_spark.sources.sinkio`."""
    payload = build_wat_payload(
        df, html_col, url_col, ts_col, status_col, ctype_col
    )
    rows = payload.select(
        F.pmod(F.xxhash64(F.col("url")), F.lit(n_files)).alias("_fid"),
        F.col("url").alias("_url"),
        F.col("_ts"),
        F.col("wat_json").alias("_payload"),
    )
    return write_member_files(
        rows, path, n_files, ".warc.wat.gz", wat_record_bytes,
        opener=opener,
    )


def read_wat(spark: SparkSession, path: str) -> DataFrame:
    """WAT files at ``path`` (glob ok) → one flat row per capture:
    (url, warc_ts, title, http_status, http_content_type, links) with
    ``links`` the ordered array<struct<url,path,nofollow>> exactly as
    written. Map-only: the WARC member parse reuses read_warc, the
    JSON parse is ``from_json`` with the pinned envelope schema."""
    from table_ocr_spark.sources.warc import read_warc

    recs = read_warc(spark, path, warc_types=("metadata",))
    env = F.from_json(
        F.col("html").cast("string"), WAT_ENVELOPE_SCHEMA
    )["Envelope"]
    http = env["Payload-Metadata"]["HTTP-Response-Metadata"]
    return recs.select(
        F.col("url"),
        F.col("warc_ts"),
        http["HTML-Metadata"]["Head"]["Title"].alias("title"),
        http["Response-Message"]["Status"].alias("http_status"),
        http["Headers"]["Content-Type"].alias("http_content_type"),
        http["HTML-Metadata"]["Links"].alias("links"),
    )
