"""WARC (ISO 28500 / Common-Crawl) source: parse crawl archives into
the pages table, Spark-first.

The reference ingests user-uploaded PDFs one file at a time
(``table_ocr/core.py``); the production shape this engine targets is
Common-Crawl-style snapshots (BASELINE.json ``input_hint``), whose raw
container is WARC — ~1 GB files of concatenated records, each record
individually gzipped (a "member") so readers can split on member
boundaries. This module gives the pipeline a direct WARC ingest path so
a crawl can be loaded WITHOUT a separate conversion job.

Pinned record grammar (WARC/1.0 subset, exactly what CC emits):

    WARC/1.0\r\n
    <Name>: <value>\r\n ... (header block, no continuation lines)
    \r\n
    <Content-Length octets of block>
    \r\n\r\n

``response`` records carry an HTTP envelope inside the block
(status line, headers, CRLFCRLF, body); :func:`split_http_payload`
strips it and surfaces the status code. Malformed tails (truncated
record, bad Content-Length, short block) are DROPPED, never emitted as
phantom rows — the same pinned eof semantics as the HTML kernel's
truncated-tag rule (``kernel/html_extract.py``).

Scale shape (100-TB argument):
- The parallel grain is the FILE: ``spark.read.format("binaryFile")``
  yields one row per WARC file, and CC's ~1 GB file sizing makes that
  the standard partition grain for crawl processing. No shuffle
  anywhere — parse is map-only.
- Parsing is one streaming Python pass per file blob inside
  ``mapInPandas``: records are sliced by Content-Length (no regex over
  the body, no re-scanning), gzip members inflate one at a time via
  ``zlib.decompressobj`` with ``unused_data`` hand-off, and rows are
  YIELDED in bounded Arrow batches (``batch_rows``) so a 1 GB file
  never materializes all its records at once.
- ``binaryFile`` does materialize one whole file per task (that is the
  format's contract); at CC's 1 GB sizing that is within executor
  memory. For pathological multi-GB files, re-chunking at upload time
  is the crawl-side fix — the parser itself is O(1) state per record.

Why not a row-at-a-time UDF: record boundaries only exist relative to
the file byte stream, so the file blob is the natural Arrow batch unit;
everything after the slice (envelope strip, charset-safe decode) is
bulk bytes work per record.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterable, Iterator, Optional, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_VERSIONS = (b"WARC/1.0", b"WARC/1.1")

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("redirect_location", T.StringType()),
        T.StructField("payload_digest", T.StringType()),
    ]
)


# ---------------------------------------------------------------- build
_HDR_SAN = {ord("\r"): "%0D", ord("\n"): "%0A", 0: "%00"}


def header_value(v: str) -> str:
    """Percent-encode the three bytes that would break WARC header
    framing (CR, LF, NUL) in an interpolated header VALUE — header-
    injection hardening for messy crawl urls (a raw ``\\r\\n`` inside
    a url would otherwise inject header lines or truncate the block,
    corrupting the member and every reader downstream). RFC 3986
    requires these bytes percent-encoded in any valid URI, and no
    ISO-8601 timestamp or labelled digest contains them, so every
    VALID value passes through byte-identical — the sinks'
    byte-determinism contract is unchanged except on input that was
    never writable correctly. Shared by this module's record builder
    and the WET/WAT sink grammars."""
    return v.translate(_HDR_SAN)


def build_warc_record(
    url: str,
    ts_iso: str,
    body: bytes,
    warc_type: str = "response",
    http_status: int = 200,
    http: bool = True,
    location: Optional[str] = None,
    payload_digest: Optional[str] = None,
) -> bytes:
    """Python twin of the Spark-expression record builder below —
    the single source of the record grammar, used by tests and the
    datagen path. ``parse_warc(build_warc_record(x)) == x`` is the
    module's contract. ``location`` adds a Location header (redirect
    captures — pair with a 3xx ``http_status``); ``payload_digest``
    adds a ``WARC-Payload-Digest`` header (labelled ``algo:value``
    form — what ``revisit`` records point back through)."""
    if http:
        loc_hdr = (
            f"Location: {header_value(location)}\r\n"
            if location is not None
            else ""
        )
        block = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"{loc_hdr}"
            "Content-Type: text/html; charset=utf-8\r\n\r\n"
        ).encode("utf-8") + body
    else:
        block = body
    dg_hdr = (
        f"WARC-Payload-Digest: {header_value(payload_digest)}\r\n".encode(
            "ascii"
        )
        if payload_digest is not None
        else b""
    )
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode("ascii")
        + f"WARC-Target-URI: {header_value(url)}\r\n".encode("utf-8")
        + f"WARC-Date: {header_value(ts_iso)}\r\n".encode("ascii")
        + dg_hdr
        + f"Content-Length: {len(block)}\r\n".encode("ascii")
        + _CRLF
    )
    return head + block + _HDR_END


def warc_record_expr(
    url_col, ts_col, body_col, http_status: int = 200
):
    """Spark-expression twin of :func:`build_warc_record` (http=True,
    ASCII-safe bodies): lets a contract query synthesize WARC bytes
    with concat-only column ops that DuckDB reproduces byte-for-byte,
    so the parse kernel can be oracle-gated end to end without temp
    files. Returns a STRING column (binary-safe for ASCII payloads —
    the contract corpus is ASCII by construction)."""
    envelope = F.concat(
        F.lit(f"HTTP/1.1 {http_status} OK\r\n"),
        F.lit("Content-Type: text/html; charset=utf-8\r\n\r\n"),
        body_col,
    )
    return F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "),
        url_col,
        F.lit("\r\n"),
        F.lit("WARC-Date: "),
        ts_col,
        F.lit("\r\n"),
        F.lit("Content-Length: "),
        (F.length(envelope)).cast("string"),
        F.lit("\r\n\r\n"),
        envelope,
        F.lit("\r\n\r\n"),
    )


def gzip_members(records: Iterable[bytes]) -> bytes:
    """Concatenate records as independent gzip members — the CC file
    layout (mtime pinned to 0 so output is deterministic)."""
    out = io.BytesIO()
    for rec in records:
        out.write(gzip.compress(rec, mtime=0))
    return out.getvalue()


# ---------------------------------------------------------------- parse
def split_http_payload(
    block: bytes,
) -> Tuple[Optional[int], Optional[str], bytes, Optional[str]]:
    """Strip the HTTP envelope from a response block → (status,
    content_type, body, location). ``content_type`` is the
    Content-Type header value lowercased and trimmed (with charset
    params — the pagemeta sniffer consumes them) or NULL when absent;
    ``location`` is the Location header value trimmed but case- and
    percent-encoding-PRESERVED (it is a url — the redirect resolver
    consumes it verbatim), NULL when absent. A block that does not
    start ``HTTP/`` is returned whole with NULL status/type/location
    (metadata/resource records carry raw blocks)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block, None
    end = block.find(_HDR_END)
    if end < 0:  # envelope never closes: treat everything as headers
        return None, None, b"", None
    head = block[:end]
    status_line = head[: _line_end(head)]
    parts = status_line.split(b" ")
    status: Optional[int] = None
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype: Optional[str] = None
    location: Optional[str] = None
    for line in head.split(_CRLF)[1:]:
        k, sep, v = line.partition(b":")
        if not sep:
            continue
        key = k.strip().lower()
        if key == b"content-type" and ctype is None:
            ctype = v.strip().lower().decode("ascii", "replace")
        elif key == b"location" and location is None:
            # the writer encodes the HTTP block (incl. Location) as
            # UTF-8 — decode the same way so non-ASCII redirect
            # targets round-trip instead of silently mojibake-ing
            # into edges that match nothing in the redirect resolver
            location = v.strip().decode("utf-8", "replace")
        if ctype is not None and location is not None:
            break
    return status, ctype, block[end + len(_HDR_END):], location


def _line_end(b: bytes) -> int:
    i = b.find(_CRLF)
    return i if i >= 0 else len(b)


def _iter_plain_records(blob: bytes) -> Iterator[dict]:
    """Slice concatenated uncompressed WARC records out of ``blob``.
    O(1) state; truncated/malformed tails are dropped."""
    pos, n = 0, len(blob)
    while pos < n:
        if not blob.startswith(_VERSIONS, pos):
            # resync: skip to the next version marker (tolerates junk
            # between records, e.g. extra CRLFs some writers emit)
            nxt = blob.find(b"WARC/1.", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        hdr_end = blob.find(_HDR_END, pos)
        if hdr_end < 0:
            return  # truncated header block: drop
        headers: dict = {}
        for line in blob[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b""))
        except ValueError:
            return  # unparseable length: cannot resync reliably, drop tail
        if clen < 0:
            return  # a negative length would regress pos: loop guard
        body_at = hdr_end + len(_HDR_END)
        if body_at + clen > n:
            return  # truncated block: drop
        yield {
            "warc_type": headers.get(b"warc-type", b"").decode(
                "ascii", "replace"
            ),
            "url": headers.get(b"warc-target-uri", b"").decode(
                # WARC 1.0 headers are UTF-8; the writer twins encode
                # the URI as UTF-8, so the round trip is lossless for
                # non-ASCII urls (replace keeps malformed input tolerant)
                "utf-8", "replace"
            ),
            "warc_ts": headers.get(b"warc-date", b"").decode(
                "ascii", "replace"
            ),
            # digests are ASCII by grammar (`algo:value` labelled form)
            "payload_digest": headers.get(
                b"warc-payload-digest", b""
            ).decode("ascii", "replace"),
            "block": blob[body_at : body_at + clen],
        }
        pos = body_at + clen
        # consume the record separator if present (tolerate absence)
        while blob.startswith(_CRLF, pos):
            pos += 2


def _iter_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Inflate concatenated gzip members one at a time; a corrupt or
    truncated tail member is dropped."""
    pos, n = 0, len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out = d.decompress(blob[pos:])
            out += d.flush()
        except zlib.error:
            return
        if not d.eof:
            return  # truncated member
        yield out
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def iter_warc_records(blob: bytes) -> Iterator[dict]:
    """Records from a WARC file blob, compressed-or-not autodetected
    by the gzip magic. Each dict: warc_type, url, warc_ts, block."""
    if blob[:2] == b"\x1f\x8b":
        for member in _iter_gzip_members(blob):
            # one member MAY hold several records (whole-file gzip);
            # the plain iterator handles both layouts
            yield from _iter_plain_records(member)
    else:
        yield from _iter_plain_records(blob)


# ---------------------------------------------------------------- spark
def _parse_kernel(path_col: str, blob_col: str, warc_types, batch_rows):
    import pandas as pd

    keep = set(warc_types) if warc_types is not None else None

    def kernel(batches):
        rows: list = []
        for pdf in batches:
            for path, blob in zip(pdf[path_col], pdf[blob_col]):
                if blob is None:
                    continue
                for rec in iter_warc_records(bytes(blob)):
                    if keep is not None and rec["warc_type"] not in keep:
                        continue
                    status, ctype, body, location = split_http_payload(
                        rec["block"]
                    )
                    rows.append(
                        (
                            path,
                            rec["warc_type"],
                            rec["url"],
                            rec["warc_ts"],
                            status,
                            ctype,
                            body,
                            location,
                            rec["payload_digest"],
                        )
                    )
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(
                            rows, columns=[f.name for f in WARC_SCHEMA]
                        )
                        rows = []
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA])

    return kernel


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: Optional[Tuple[str, ...]] = ("response",),
    batch_rows: int = 2048,
) -> DataFrame:
    """WARC files at ``path`` (glob ok) → one row per kept record:
    (warc_file, warc_type, url, warc_ts, http_status, html). Map-only;
    the file is the partition grain (see module doc)."""
    files = spark.read.format("binaryFile").load(path)
    return files.select(
        F.col("path").alias("_p"), F.col("content").alias("_c")
    ).mapInPandas(
        _parse_kernel("_p", "_c", warc_types, batch_rows), WARC_SCHEMA
    )


def parse_warc_blobs(
    df: DataFrame,
    blob_col: str = "blob",
    file_col: str = "warc_file",
    warc_types: Optional[Tuple[str, ...]] = ("response",),
    batch_rows: int = 2048,
) -> DataFrame:
    """Same parse kernel over an in-Spark binary column (file blobs
    already in a DataFrame — the contract query's no-temp-file path,
    and the shape an Iceberg raw-bytes staging table would feed)."""
    return df.select(
        F.col(file_col).alias("_p"),
        F.col(blob_col).cast("binary").alias("_c"),
    ).mapInPandas(
        _parse_kernel("_p", "_c", warc_types, batch_rows), WARC_SCHEMA
    )


BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    warc_types: Optional[Tuple[str, ...]] = ("response",),
    batch_rows: int = 2048,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_warc`: watch ``path``
    for NEW .warc/.warc.gz files (a live crawl bucket) and emit parsed
    records incrementally. Exactly the same kernel as the batch
    reader, so an ``availableNow`` run over a static directory equals
    the batch parse row-for-row (pinned in tests). The file-source
    checkpoint makes ingest restartable at file granularity — a
    crashed job never re-emits a completed file; pair with the
    batch-side lineage table when downstream stages need row-level
    idempotence. ``max_files_per_trigger`` bounds micro-batch size
    (CC files are ~1 GB: a handful per trigger keeps executor memory
    flat)."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    files = reader.load(path)
    return files.select(
        F.col("path").alias("_p"), F.col("content").alias("_c")
    ).mapInPandas(
        _parse_kernel("_p", "_c", warc_types, batch_rows), WARC_SCHEMA
    )


# ------------------------------------------------------------ revisit
def payload_digest_expr(payload_col) -> Column:
    """``WARC-Payload-Digest`` value for a payload column, pinned to
    the labelled ``sha256:<hex>`` form (JVM-side ``sha2``; DuckDB twin
    ``'sha256:' || sha256(payload)``). Deliberate deviation from the
    ``sha1:<base32>`` convention most crawlers emit: the grammar
    labels the algorithm precisely so readers interoperate, and
    sha256-hex is computable identically in both engines (base32 is
    not a built-in in either). Map-only."""
    return F.concat(F.lit("sha256:"), F.sha2(F.col(payload_col)
                    if isinstance(payload_col, str) else payload_col, 256))


def resolve_revisits(
    records: DataFrame,
    payload_col: str = "html",
    digest_col: str = "payload_digest",
    type_col: str = "warc_type",
    ts_col: str = "warc_ts",
    url_col: str = "url",
) -> DataFrame:
    """Materialize ``revisit`` records (ISO 28500 §6.7.2 — a crawler's
    "content unchanged since an earlier capture" dedupe marker, what
    Common Crawl emits instead of re-storing identical payloads): fill
    each revisit's empty payload from a ``response`` record carrying
    the same ``WARC-Payload-Digest``.

    Canonical original per digest = the (ts, url)-smallest response
    capture (deterministic; earliest wins, url tie-break). Output: the
    input columns with ``payload_col`` backfilled on resolved revisits,
    plus ``revisit_resolved`` (true/false for revisit rows — false
    means the digest matched no stored response, the payload stays as
    read — NULL for every other row) and ``revisit_of_url`` /
    ``revisit_of_ts`` (the donor capture, resolved rows only). Row
    count is conserved; non-revisit rows pass through byte-unchanged.

    Scale shape at 10^12 captures: the originals frame is ONE
    groupBy(digest) whose ``min(struct(ts, url, payload))`` combines
    map-side — per-partition duplicate payloads collapse before the
    exchange, so the shuffle carries ~distinct-digest payload bytes,
    not corpus bytes. The resolve itself is one equi-join on the
    digest key against the (payload-less, tiny) revisit side. No
    other exchange; no driver materialization."""
    for c in ("revisit_resolved", "revisit_of_url", "revisit_of_ts"):
        if c in records.columns:
            raise ValueError(
                f"resolve_revisits: input already carries {c!r} — "
                "resolving an annotated frame would shadow it"
            )
    is_rev = F.coalesce(F.col(type_col) == "revisit", F.lit(False))
    originals = (
        records.where(
            (F.col(type_col) == "response")
            & F.col(digest_col).isNotNull()
            & (F.col(digest_col) != "")
        )
        .groupBy(F.col(digest_col).alias("_dg"))
        .agg(
            F.min(
                F.struct(
                    F.col(ts_col).alias("_ts"),
                    F.col(url_col).alias("_u"),
                    F.col(payload_col).alias("_b"),
                )
            ).alias("_o")
        )
        .select(
            "_dg",
            F.col("_o._ts").alias("_ots"),
            F.col("_o._u").alias("_ourl"),
            F.col("_o._b").alias("_oblock"),
        )
    )
    rev = records.where(is_rev)
    others = records.where(~is_rev)
    passthrough = [c for c in records.columns if c != payload_col]
    resolved = (
        rev.join(originals, rev[digest_col] == originals["_dg"], "left")
        .select(
            *passthrough,
            F.coalesce("_oblock", payload_col).alias(payload_col),
            F.col("_dg").isNotNull().alias("revisit_resolved"),
            F.col("_ourl").alias("revisit_of_url"),
            F.col("_ots").alias("revisit_of_ts"),
        )
    )
    return others.select(
        *passthrough,
        F.col(payload_col),
        F.lit(None).cast("boolean").alias("revisit_resolved"),
        F.lit(None).cast("string").alias("revisit_of_url"),
        F.lit(None).cast("string").alias("revisit_of_ts"),
    ).unionByName(resolved)
