"""Crawl-frontier politeness scheduling — turn a url set into a
fetch plan that honors per-host rate limits.

The reference rate-limits its single API loop to ≤0.25 pages/s
(``table_ocr/core.py:66-67``); a crawl-fed pipeline (BASELINE.json
north rule) must rate-limit PER HOST instead — the constraint is the
remote server, not the executor. This module assigns every url a
per-host fetch sequence number and a host-sticky worker, which is the
whole politeness contract expressed as data:

- ``seq`` — the url's position in its host's fetch order (0-based;
  deterministic: priority desc, then url). Fetching host h's url k at
  time ``k * delay_s`` can never exceed one request per ``delay_s``
  to h, regardless of how many workers the cluster runs.
- ``worker`` — ``pmod(xxhash64(host), workers)``: all of a host's
  urls land on ONE worker, so the per-host spacing is enforceable
  locally with a monotone clock; no cross-worker coordination.
- ``eta_s`` — ``seq * delay_s``: the politeness LOWER BOUND on fetch
  time. A worker serving many hosts interleaves them and may fetch
  later than eta (worker capacity), never earlier (politeness).

Scale shape (100-TB argument): one exchange (the per-host window's
hash partitioning on host) and a within-partition sort; window state
is a single running counter per host — no full materialization. Host
skew is the point, not a hazard: a 10M-url host is exactly the host
politeness serializes anyway, and ``max_per_host`` caps the tail
(frontier budgeting — CC caps per-host harvest the same way). The
fetch loop itself is I/O outside this engine; the plan is its input.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .urlnorm import host_canonical


def revisit_schedule(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
    min_interval_s: float = 3600.0,
    max_interval_s: float = 30.0 * 86400.0,
    default_interval_s: float = 7.0 * 86400.0,
) -> DataFrame:
    """Freshness-aware recrawl scheduling (the Cho/Garcia-Molina
    revisit-policy axis the frontier planner lacks): a CDX-shaped
    capture history ``(url, ts, digest)`` → per-url change evidence
    and the next fetch time. The reference refetches nothing (every
    PDF is processed once, ``table_ocr/core.py:158-215``); a crawler
    that never revisits serves stale pages forever, one that
    revisits uniformly wastes its fetch budget on pages that never
    change.

    Pinned rule (mirrored by the differential SQL twin in tests):

    - captures of a url are ordered by ``(ts, digest)`` — the digest
      tie-break makes equal-ts at-least-once redeliveries
      deterministic (the ``latest_capture`` discipline);
    - ``n_changes`` counts consecutive pairs whose digest differs;
    - ``interval_s = clamp(span_s / (n_changes + 1), min, max)``
      where ``span_s`` is the observed first→last capture span: the
      add-one-smoothed mean time between observed changes. A page
      that never changed across a long history drifts toward the
      ceiling; a page that changed every capture is revisited at the
      observed capture cadence, floored at ``min_interval_s``;
    - single-capture urls (no evidence either way) get
      ``default_interval_s``;
    - NULL-timestamp captures are dropped up front (``ingest_crawl``
      keeps malformed WARC-Dates as NULL rows): an undated capture
      is no scheduling evidence, and counting it while min/max skip
      it would collapse the span to 0. Urls with ONLY undated
      captures get no schedule row;
    - ``next_fetch_ts = last_ts + interval_s``.

    Feed the due subset straight into :func:`plan_fetches` with the
    overdue seconds as ``priority_col``::

        due = sched.where(F.col("next_fetch_ts") <= F.lit(now))
        plan = plan_fetches(
            due.withColumn(
                "overdue_s",
                F.lit(now).cast("double")
                - F.unix_timestamp("next_fetch_ts"),
            ),
            priority_col="overdue_s",
        )

    Scale shape: one url-keyed window (running lag — state is one
    row) feeding one url-keyed aggregate on the SAME partitioning
    (no second exchange), all codegen expressions; output is
    url-cardinality, orders below the capture stream.
    """
    if not 0 < min_interval_s <= max_interval_s:
        raise ValueError(
            "need 0 < min_interval_s <= max_interval_s, got "
            f"{min_interval_s}, {max_interval_s}"
        )
    if not min_interval_s <= default_interval_s <= max_interval_s:
        # the single-capture default must obey the same clamp policy;
        # an out-of-band default (0, negative, > max) would make every
        # once-seen url permanently due — exactly the uniform-refetch
        # flood this operator exists to prevent
        raise ValueError(
            "need min_interval_s <= default_interval_s <= "
            f"max_interval_s, got {default_interval_s} outside "
            f"[{min_interval_s}, {max_interval_s}]"
        )
    per = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("_ts"),
        F.col(digest_col).alias("_dg"),
    # undated captures (ingest_crawl keeps malformed WARC-Dates as
    # NULL warc_ts) carry no scheduling evidence: counting them
    # would skip the default branch while min/max ignore them —
    # span 0, hourly refetch for a once-observed page — and their
    # NULLS-FIRST seat in the lag order could manufacture a change.
    # Dropped here; urls with ONLY undated captures get no row.
    ).where(F.col("_ts").isNotNull())
    w = Window.partitionBy("url").orderBy("_ts", "_dg")
    per = per.withColumn(
        "_chg",
        F.coalesce(
            (F.col("_dg") != F.lag("_dg").over(w)).cast("long"),
            F.lit(0),
        ),
    )
    agg = per.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.sum("_chg").cast("long").alias("n_changes"),
        F.min("_ts").alias("_first"),
        F.max("_ts").alias("last_ts"),
    )
    span_s = (
        F.unix_timestamp("last_ts") - F.unix_timestamp("_first")
    ).cast("double")
    interval = F.when(
        F.col("n_captures") < 2, F.lit(float(default_interval_s))
    ).otherwise(
        F.least(
            F.greatest(
                span_s / (F.col("n_changes") + F.lit(1)).cast("double"),
                F.lit(float(min_interval_s)),
            ),
            F.lit(float(max_interval_s)),
        )
    )
    return agg.select(
        "url",
        "n_captures",
        "n_changes",
        "last_ts",
        interval.alias("interval_s"),
    ).withColumn(
        "next_fetch_ts",
        F.timestamp_seconds(
            F.unix_timestamp("last_ts") + F.col("interval_s")
        ),
    )


def plan_fetches(
    df: DataFrame,
    url_col: str = "url",
    delay_s: float = 1.0,
    workers: int = 64,
    priority_col: Optional[str] = None,
    max_per_host: Optional[int] = None,
    host_delays: Optional[DataFrame] = None,
    broadcast_delays: bool = False,
) -> DataFrame:
    """Distinct urls of ``df`` → ``(url, host, seq, worker, delay_s,
    eta_s)`` fetch plan (see module doc for the politeness semantics).

    ``priority_col`` (higher first; NULLs last) orders urls within a
    host — e.g. a sitemap ``lastmod`` recency score or a link-graph
    authority; ties and the default fall back to url order so the
    plan is deterministic. ``max_per_host`` drops urls whose ``seq``
    reaches the cap (per-host frontier budget).

    ``host_delays`` — an optional ``(host, crawl_delay)`` frame
    (``robots.robots_crawl_delays`` output shape): each host's
    effective delay becomes ``max(delay_s, crawl_delay)`` — the
    caller's ``delay_s`` is a FLOOR, so a site's robots Crawl-delay
    can slow the crawler below its default rate but never authorize
    exceeding it; hosts absent from the frame keep ``delay_s``. One
    extra equi-join on host (the delays side is ≤1 row per host that
    DECLARES a delay — broadcast-eligible for curated sets via
    ``broadcast_delays``, hash join at crawl scale).
    """
    if workers <= 0:
        raise ValueError(f"workers must be positive, got {workers}")
    if delay_s < 0:
        raise ValueError(f"delay_s must be >= 0, got {delay_s}")
    if priority_col is None:
        urls = df.select(F.col(url_col).alias("url")).dropDuplicates(
            ["url"]
        )
    else:
        # a url submitted twice with different priorities resolves
        # DETERMINISTICALLY to the highest one (dropDuplicates would
        # keep an arbitrary row) — one exchange either way
        urls = (
            df.select(F.col(url_col).alias("url"), F.col(priority_col))
            .groupBy("url")
            .agg(F.max(priority_col).alias(priority_col))
        )
    urls = urls.withColumn("host", host_canonical(F.col("url")))
    delay = F.lit(float(delay_s))
    if host_delays is not None:
        d = (
            host_delays.select(
                F.col(host_delays.columns[0]).alias("host"),
                F.col(host_delays.columns[1])
                .cast("double")
                .alias("_host_delay"),
            )
            # duplicate host rows resolve deterministically (and to the
            # conservative side): the max declared delay wins
            .groupBy("host")
            .agg(F.max("_host_delay").alias("_host_delay"))
        )
        if broadcast_delays:
            d = F.broadcast(d)
        urls = urls.join(d, "host", "left")
        delay = F.greatest(delay, F.coalesce("_host_delay", delay))
    order = (
        [F.col(priority_col).desc_nulls_last(), F.col("url")]
        if priority_col is not None
        else [F.col("url")]
    )
    w = Window.partitionBy("host").orderBy(*order)
    out = urls.withColumn("seq", F.row_number().over(w) - F.lit(1))
    if max_per_host is not None:
        out = out.filter(F.col("seq") < F.lit(max_per_host))
    return out.select(
        "url",
        "host",
        F.col("seq").cast("long").alias("seq"),
        F.pmod(F.xxhash64("host"), F.lit(workers)).alias("worker"),
        delay.alias("delay_s"),
        (F.col("seq") * delay).alias("eta_s"),
    )
