"""Leakage-safe train/validation/test split assignment.

Splitting a crawl corpus by DOCUMENT leaks: near-identical pages from
one site land on both sides of the train/eval boundary and the eval
set stops measuring generalization. The standard guard is to split by
SITE — every document whose (canonical) host hashes into the val
band goes to val, wholesale. Same md5-prefix recipe as
``operators/sampling.py``: membership is a pure function of
(key, fractions), reproducible on any engine, stable under
repartitioning and corpus growth (a host keeps its split as new pages
arrive — the property that makes incremental crawls safe).

Grouping key (``site_key``): the DEFAULT is the eTLD+1 registrable
domain (:func:`~table_ocr_spark.operators.urlnorm.
registrable_domain`, pinned public-suffix-list snapshot documented in
:mod:`table_ocr_spark.psl_snapshot`) — ``blog.foo.com`` and
``shop.foo.com`` are ONE site and land in one split, while two
github.io customers stay independent sites (the PSL private section).
This closes the subdomain-leakage hole by default (r3 verdict #3).
``site_key="host"`` groups by the canonical full host (the pre-r4
behavior); ``site_key="column"`` uses ``key_col`` as-is (caller
precomputed the grouping key). A host the PSL maps to no registrable
domain (it IS a public suffix, or an IPv4 literal) falls back to the
full canonical host — still deterministic, still site-wholesale.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table_ocr_spark.operators.sampling import _hash_prefix, _threshold_hex
from table_ocr_spark.operators.urlnorm import host_canonical


def split_boundaries(fractions: Dict[str, float]) -> list:
    """[(split_name, upper_hex_boundary)] — cumulative md5-prefix
    bands in dict order (insertion order is the pinned order; the
    recipe is the (name, fraction) list, not a set). Boundary hex
    strings are computed HERE, in one place, and embedded as literals
    by both the Spark expression and any SQL mirror — so no float
    arithmetic ever crosses an engine boundary."""
    if not fractions:
        raise ValueError("split_boundaries: empty fractions")
    cum = 0.0
    out = []
    for name, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(
                f"split_boundaries: fraction for {name!r} must be in "
                f"[0,1], got {f}"
            )
        cum += f
        if cum > 1.0 + 1e-9:
            raise ValueError(
                f"split_boundaries: fractions sum past 1.0 at {name!r}"
            )
        out.append((name, _threshold_hex(min(cum, 1.0))))
    return out


def assign_splits(
    df: DataFrame,
    fractions: Dict[str, float],
    rest: str = "train",
    key_col: str = "url",
    site_key: str = "etld1",
    psl_rules=None,
) -> DataFrame:
    """``df`` plus a ``split`` column: the named splits take their
    md5-prefix bands in dict order, everything past the last boundary
    is ``rest``. All rows sharing a grouping key share a split —
    site-level leakage safety at the granularity ``site_key`` picks
    (module docstring; default eTLD+1). Map-only (md5 + chained
    comparisons against literal hex boundaries; the eTLD+1 derivation
    is a per-url label-arity fold); nothing shuffles, nothing
    collects. A NULL or unparseable key (no host in the url) falls
    through to ``rest`` — deterministic, and conservative when rest
    is train. ``psl_rules`` overrides the pinned snapshot (pass
    ``load_psl_file(...)`` output for a full production list)."""
    if rest in fractions:
        raise ValueError(
            f"assign_splits: rest split {rest!r} also has an explicit "
            "fraction — give it either a band or the remainder, not both"
        )
    if site_key not in ("etld1", "host", "column"):
        raise ValueError(
            f"assign_splits: site_key must be 'etld1', 'host' or "
            f"'column', got {site_key!r}"
        )
    key = F.col(key_col)
    if site_key != "column":
        # host_canonical yields '' (not NULL) for a schemeless or
        # otherwise unparseable url; '' must not hash as one giant
        # pseudo-site that lands wholesale in whatever band covers
        # md5('') — null it so those rows take the documented
        # fallthrough to rest
        host = host_canonical(key)
        key = F.when(F.length(host) > 0, host)
        if site_key == "etld1":
            from table_ocr_spark.operators.urlnorm import (
                registrable_domain,
            )

            key = F.coalesce(
                registrable_domain(key, rules=psl_rules, host_input=True),
                key,
            )
    prefix = _hash_prefix(key)
    expr = None
    for name, hexbound in split_boundaries(fractions):
        cond = prefix < F.lit(hexbound)
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    return df.withColumn("split", expr.otherwise(rest))
