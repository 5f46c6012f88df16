"""Streaming deduplication for the crawl-ingest path.

A continuously-arriving pages stream re-delivers urls (re-crawls,
at-least-once upstream delivery). Batch-side identity is
``latest_capture`` / ``exact_dedup``; the streaming twin must bound its
state or it grows with the full url history. Two pinned operators:

* :func:`dedup_stream_exact` — ``dropDuplicatesWithinWatermark`` on the
  key: an event arriving within the watermark horizon of a previously
  seen key is dropped; state for keys older than the watermark is
  evicted, so state size is O(keys per horizon), not O(all urls ever).
  (Plain ``dropDuplicates`` on a stream never evicts — unusable at
  crawl scale; this is the survivable shape.)
* :func:`dedup_stream_content` — the same, keyed by the content
  hash COMPOSITE ``(xxhash64, md5)`` of the pinned dedup normalization
  (``operators.dedup.normalized_text``) — the streaming analogue of
  exact_dedup's hash path: byte-duplicate documents from DIFFERENT urls
  within the horizon are dropped. The 192-bit composite matters for the
  same reason exact_dedup documents: a single 64-bit key WOULD collide
  at crawl scale and silently drop non-duplicate documents.

Both are append-mode-safe transformations: apply them between
``readStream`` and any sink; they compose with the incremental
extraction stream (the dedup runs BEFORE the Arrow kernel, so duplicate
html never reaches extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    pages: DataFrame,
    key: str = "url",
    ts: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-deliveries of the same ``key`` within the watermark
    horizon. State: one entry per distinct key per horizon, evicted as
    the watermark advances.

    Pinned semantics: FIRST arrival wins (that is what
    ``dropDuplicatesWithinWatermark`` can do). This is exact for
    re-DELIVERIES (identical rows) but deliberately diverges from the
    batch ``latest_capture`` (latest wins) for a genuine RE-CRAWL with
    changed content inside the horizon — the stale first capture flows
    through and the fresh one is dropped. Consumers that care about
    capture recency must run ``latest_capture`` batch-side over the
    accumulated output (the composed pipeline does exactly that); this
    operator's job is bounding upstream volume, not capture identity."""
    return pages.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def dedup_stream_content(
    pages: DataFrame,
    text_col: str = "text",
    ts: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop byte-duplicate documents (same pinned-normalized text, any
    url) within the watermark horizon. The state key is the 192-bit
    ``(xxhash64, md5)`` composite of the normalized text, never the
    text itself — state rows stay narrow AND a cross-document collision
    needs a simultaneous 64- and 128-bit collision (a single 64-bit key
    would collide at crawl scale and silently drop real documents)."""
    from table_ocr_spark.operators.dedup import content_key_cols

    _guard_internal_cols(pages)
    h64, h128 = content_key_cols(text_col)
    hashed = pages.withColumn("_ck64", h64).withColumn("_ck128", h128)
    return (
        hashed.withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["_ck64", "_ck128"])
        .drop("_ck64", "_ck128")
    )


def dedup_stream(
    pages: DataFrame,
    key: str = "url",
    text_col: str = "text",
    ts: str = "warc_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Url-re-delivery AND byte-duplicate-content dedup composed in ONE
    stream. Spark disallows redefining a watermark mid-stream, so
    chaining :func:`dedup_stream_exact` into :func:`dedup_stream_content`
    fails with ``Redefining watermark is disallowed``; this operator
    sets the watermark ONCE and chains the two
    ``dropDuplicatesWithinWatermark`` stateful operators under it
    (multiple stateful operators per stream are supported since Spark
    3.4). State: one entry per distinct key per horizon + one per
    distinct content hash per horizon, both watermark-evicted."""
    from table_ocr_spark.operators.dedup import content_key_cols

    _guard_internal_cols(pages)
    by_key = pages.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        [key]
    )
    h64, h128 = content_key_cols(text_col)
    hashed = by_key.withColumn("_ck64", h64).withColumn("_ck128", h128)
    return (
        hashed.dropDuplicatesWithinWatermark(["_ck64", "_ck128"])
        .drop("_ck64", "_ck128")
    )


def _guard_internal_cols(pages: DataFrame) -> None:
    clash = {"_ck64", "_ck128"} & set(pages.columns)
    if clash:
        raise ValueError(
            f"streaming dedup: input columns {sorted(clash)} collide with "
            "the internal content-key columns; rename them first"
        )
