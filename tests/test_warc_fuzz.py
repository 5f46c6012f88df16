"""Property-based WARC parser robustness (hypothesis): at 10^12
documents one poison file must never kill a 4-hour stage, emit phantom
rows, or mis-frame its neighbours. Pure-Python surface
(``iter_warc_records`` / ``split_http_payload``), so hundreds of
adversarial blobs run in seconds — the Spark kernel is the same code
behind ``mapInPandas`` (``sources/warc.py:_parse_kernel``)."""

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

from table_ocr_spark.sources.warc import (
    build_warc_record,
    iter_warc_records,
    split_http_payload,
)

# raw junk biased toward the tokens the framing scanner keys on
_junk = st.binary(max_size=200) | st.sampled_from(
    [
        b"WARC/1.0\r\n\r\n",
        b"WARC/1.0\r\nContent-Length: 999999\r\n\r\n",
        b"WARC/1.1\r\nContent-Length: -5\r\n\r\nx",
        b"Content-Length: 10\r\n\r\n",
        b"\r\n\r\n\r\n",
        b"\x1f\x8b",  # gzip magic with no stream behind it
        b"WARC/1.0\r\nWARC-Type: response\r\n",  # truncated header
    ]
)

_url = st.text(max_size=40)
_body = st.binary(max_size=120)


def _record(url, body):
    return build_warc_record(url, "2026-01-01T00:00:00Z", body)


@settings(max_examples=250, deadline=None)
@given(st.lists(st.tuples(_url, _body), max_size=5), _junk, _junk)
def test_parser_never_crashes_and_never_phantoms(recs, pre, post):
    """Valid records surrounded by arbitrary junk: the parser must not
    raise, must recover every INTACT record that starts after the
    junk, and must never fabricate a record that was not written.
    Junk may legitimately swallow records that follow it only by
    extending a fake Content-Length over them — so the invariant is
    subset-and-count, not exact equality."""
    blob = pre + b"".join(_record(u, b) for u, b in recs) + post
    rows = list(iter_warc_records(blob))  # must not raise
    # determinism
    rows2 = list(iter_warc_records(blob))
    assert [r["block"] for r in rows] == [r["block"] for r in rows2]
    written_bodies = [b for _, b in recs]
    parsed_response_bodies = [
        split_http_payload(r["block"])[2]
        for r in rows
        if r["warc_type"] == "response"
    ]
    # every parsed response body was actually written (no phantoms
    # from junk — junk blocks parse as non-response or carry bytes we
    # wrote; a response row's body must come from a real record)
    for b in parsed_response_bodies:
        assert b in written_bodies
    assert len(parsed_response_bodies) <= len(written_bodies)


@settings(max_examples=250, deadline=None)
@given(st.lists(st.tuples(_url, _body), min_size=1, max_size=5))
def test_clean_stream_roundtrips_exactly(recs):
    blob = b"".join(_record(u, b) for u, b in recs)
    rows = list(iter_warc_records(blob))
    assert len(rows) == len(recs)
    for (u, b), r in zip(recs, rows):
        status, ctype, body, _ = split_http_payload(r["block"])
        assert status == 200 and body == b


@settings(max_examples=250, deadline=None)
@given(st.lists(st.tuples(_url, _body), min_size=1, max_size=4), st.binary(max_size=60))
def test_gzip_members_with_trailing_garbage(recs, tail):
    """Member-gzip layout with a corrupt tail: intact members parse,
    the garbage tail is dropped, nothing raises."""
    blob = b"".join(gzip.compress(_record(u, b), mtime=0) for u, b in recs)
    rows = list(iter_warc_records(blob + b"\x1f\x8b" + tail))
    assert len(rows) == len(recs)
    for (u, b), r in zip(recs, rows):
        assert split_http_payload(r["block"])[2] == b


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_split_http_payload_total(block):
    """split_http_payload is total: any byte string returns a 4-tuple,
    and a non-HTTP block comes back whole."""
    status, ctype, body, loc = split_http_payload(block)
    if not block.startswith(b"HTTP/"):
        assert status is None and body == block
