"""Per-host crawl health rollup — the operational dashboard table a
crawl operator reads after every snapshot.

The reference surfaces per-project progress counts in its UI
(``ui/pages/projects.py``); the crawl-scale analogue is a per-host
roll-up over the capture stream: volume (captures, distinct urls,
payload bytes), outcome mix (2xx/3xx/4xx/5xx), redirect share, and —
when the ingest digest rides along — how much of the host's traffic
is re-fetching unchanged content (the signal that feeds
``frontier.revisit_schedule`` tuning and politeness budget review).

Scale shape: ONE groupBy on the canonical host. Every status/byte
aggregate is a map-side-combinable sum; the distinct-url count is the
one genuinely expensive aggregate, so it is switchable —
``exact=True`` (default, oracle-able: `count_distinct`) for
bench/contract scale, ``exact=False`` for the 10^12-capture path
(`approx_count_distinct`, HLL++, fixed-size sketch per host, no
second expand) — the same exact/approx dial the tier engine exposes
for quantiles.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table_ocr_spark.operators.urlnorm import host_canonical


def crawl_health(
    captures: DataFrame,
    url_col: str = "url",
    status_col: str = "http_status",
    payload_col: Optional[str] = "html",
    digest_col: Optional[str] = None,
    exact: bool = True,
    rsd: float = 0.02,
) -> DataFrame:
    """Per-host health table: ``(host, n_captures, n_urls, n_2xx,
    n_3xx, n_4xx, n_5xx, n_other, total_bytes[, n_url_digests])``.

    ``n_other`` counts NULL/out-of-range statuses (truncated
    envelopes, non-HTTP records). ``total_bytes`` sums the payload
    column's byte length (0 when ``payload_col`` is None).
    ``digest_col`` (e.g. the ingest digest) adds ``n_url_digests`` —
    distinct (url, digest) pairs; ``n_captures - n_url_digests`` is
    the host's unchanged-refetch volume. Hosts that canonicalize to
    ''/NULL (schemeless junk) group under NULL rather than silently
    vanishing — the junk volume is itself a health signal."""
    status = F.col(status_col)
    bucket = (status / 100).cast("int")

    def _n(b: int):
        return F.sum(
            F.when(bucket == b, F.lit(1)).otherwise(F.lit(0))
        ).alias(f"n_{b}xx")

    host = host_canonical(F.col(url_col))
    aggs = [
        F.count(F.lit(1)).alias("n_captures"),
        (
            F.count_distinct(F.col(url_col))
            if exact
            else F.approx_count_distinct(F.col(url_col), rsd)
        ).alias("n_urls"),
        _n(2),
        _n(3),
        _n(4),
        _n(5),
        F.sum(
            F.when(
                status.isNull() | (bucket < 2) | (bucket > 5), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_other"),
        (
            F.sum(
                F.coalesce(
                    # octet_length = UTF-8 bytes for strings, raw bytes
                    # for binary; F.length would count CHARACTERS on a
                    # string payload and under-report non-ASCII text
                    F.octet_length(F.col(payload_col)).cast("long"),
                    F.lit(0),
                )
            )
            if payload_col
            else F.sum(F.lit(0))
        ).alias("total_bytes"),
    ]
    if digest_col:
        # NULL url/digest must yield a NULL pair so the distinct count
        # skips the row (the oracle's `url || chr(31) || digest` NULL
        # propagation); bare concat_ws would silently SKIP the null
        # part and count a url-only string as a (url, digest) pair
        pair = F.when(
            F.col(url_col).isNotNull() & F.col(digest_col).isNotNull(),
            F.concat_ws("\x1f", F.col(url_col), F.col(digest_col)),
        )
        aggs.append(
            (
                F.count_distinct(pair)
                if exact
                else F.approx_count_distinct(pair, rsd)
            ).alias("n_url_digests")
        )
    return captures.groupBy(
        F.when(host == "", F.lit(None)).otherwise(host).alias("host")
    ).agg(*aggs)
