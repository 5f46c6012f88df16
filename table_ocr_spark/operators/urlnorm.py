"""URL canonicalization — the crawl-pipeline identity operator.

A Common-Crawl-style corpus keys everything by url (the reference keys
results by pdf stem the same way, ``ui/utils.py:63-71``); re-crawls of
the same resource arrive with cosmetically different urls (case, default
ports, tracking params, fragments), so url-keyed dedup (S11
``latest_capture``) and the lineage anti-join undercount duplicates
without a pinned canonical form.

Everything is codegen'd column expressions; the only higher-order
function is the per-url query-param filter/sort (a handful of elements
per row — the interpreted-HOF cost model that rules out per-token HOFs
does not bite at this arity).

Pinned canonicalization semantics (each step deliberate, in order):

1. strip the fragment (``#...``),
2. lowercase scheme and host; strip default ports (``:80`` for http,
   ``:443`` for https),
3. drop tracking params (``utm_*``, ``fbclid``, ``gclid``), sort the
   surviving query params lexicographically, rejoin with ``&``; an
   emptied query drops its ``?``,
4. strip one trailing slash from a non-root path; a bare root path
   ``/`` unifies with the EMPTY path (``http://a.com/`` ==
   ``http://a.com`` per RFC 3986 §6.2.3 — the single most common
   cosmetic re-crawl variant),
5. a string with no ``scheme://`` prefix is returned unchanged (not a
   url — never guess).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def canonical_url(url: Column) -> Column:
    """Pinned canonical form of a url column (see module docstring)."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _SCHEME_RE + r"([^/?]*)", 2))
    rest = F.regexp_extract(u, _SCHEME_RE + r"[^/?]*(.*)$", 2)

    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)

    path = F.regexp_replace(
        F.regexp_extract(rest, r"^([^?]*)", 1), r"([^/])/$", r"$1"
    )
    path = F.when(path == "/", F.lit("")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qstr = F.array_join(params, "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canon)


def latest_capture_canonical(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """S11 (`latest_capture`) keyed by CANONICAL url: one row per
    canonical resource, the most recent capture wins; ties broken by
    the raw url (pinned, deterministic). One shuffle on the canonical
    key — the same profile as plain latest_capture."""
    from pyspark.sql import Window as W

    w = W.partitionBy("canonical_url").orderBy(
        F.desc("warc_ts"), F.asc(url_col)
    )
    return (
        pages.withColumn("canonical_url", canonical_url(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
