"""Deterministic corpus sampling — the reproducibility primitive of a
training-data pipeline.

``df.sample()`` is seed-dependent per partitioning and non-reproducible
across runs/engines; a training mix must be re-derivable years later
from the recipe alone. Pinned rule: a row is in the ``fraction`` sample
iff the first 16 hex chars of ``md5(key)`` compare lexicographically
below the fraction's hex threshold. md5 hex is lowercase in both Spark
and DuckDB, so the oracle reproduces membership EXACTLY (xxhash64 would
be JVM-only), and membership is stable under repartitioning, engine,
and scale — a row's fate depends only on its key.

Map-only (no shuffle, no RNG state); stratified variant keys the
threshold off a strata column via a tiny broadcast map.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_BITS = 64  # compare on 16 hex chars = 64 bits of md5


def _threshold_hex(fraction: float) -> str:
    """fraction in [0,1] -> 16-char lowercase hex threshold such that
    P[md5_prefix < threshold] == fraction (up to 2^-64)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    t = int(fraction * (1 << _HEX_BITS))
    t = min(t, (1 << _HEX_BITS) - 1) if fraction < 1.0 else (1 << _HEX_BITS)
    # fraction == 1.0 -> threshold above every prefix ('g' > any hex char)
    return "g" * 16 if fraction >= 1.0 else format(t, "016x")


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 16)


def deterministic_sample(
    df: DataFrame, fraction: float, key: str = "doc_id"
) -> DataFrame:
    """The ``fraction`` sample of ``df``, reproducible from (key,
    fraction) alone. Same rows on every run, partitioning, and engine."""
    return df.filter(_hash_prefix(F.col(key)) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: Dict[str, float],
    strata_col: str = "lang",
    key: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the language-mix knob of a
    training recipe): stratum ``s`` keeps ``fractions[s]`` of its rows;
    strata absent from the map keep ``default_fraction``. The
    stratum→threshold map rides as a literal MapType expression —
    no join, still map-only."""
    pairs = []
    for s, frac in fractions.items():
        pairs.append(F.lit(s))
        pairs.append(F.lit(_threshold_hex(frac)))
    thresholds = F.create_map(*pairs) if pairs else F.lit(None)
    thr = F.coalesce(
        thresholds[F.col(strata_col)] if pairs else F.lit(None),
        F.lit(_threshold_hex(default_fraction)),
    )
    return df.filter(_hash_prefix(F.col(key)) < thr)


def temperature_fractions(
    df: DataFrame,
    strata_col: str = "lang",
    temperature: float = 0.7,
    total_fraction: float = 1.0,
) -> Dict[str, float]:
    """Temperature-rebalanced per-stratum sampling fractions (the
    multilingual-mix recipe of mBERT/XLM-R/mT5: sample stratum ``s``
    proportional to ``p_s^T`` instead of its natural share ``p_s``,
    T<1 up-weighting tail languages). Returns a fractions dict to feed
    :func:`stratified_sample`, scaled so the expected kept-row count is
    ``total_fraction * n`` and no stratum exceeds fraction 1.0 (excess
    mass from capped strata is NOT redistributed — deliberate: the
    recipe stays a closed-form function of the counts, reproducible
    from this docstring alone).

    Driver-side collect is one row per stratum (languages: O(100)) —
    the same bounded-collect argument as lineage/pack_sequences.

    A NULL stratum (lang-id failure — routine in crawl corpora) is a
    stratum like any other: it appears in the returned dict under the
    key ``None`` with its temperature-computed fraction.
    :func:`temperature_sample` applies it via ``default_fraction``
    (a map literal cannot match a NULL key), so NULL-stratum rows are
    sampled at their computed rate instead of silently vanishing.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    if total == 0:
        return {}
    weights = {s: (n / total) ** temperature for s, n in counts.items()}
    wsum = sum(weights.values())
    # expected rows for stratum s: total_fraction * total * w_s / wsum;
    # fraction of the stratum's own rows, capped at 1.0
    return {
        s: min(1.0, total_fraction * total * (weights[s] / wsum) / counts[s])
        for s in counts
    }


def temperature_sample(
    df: DataFrame,
    strata_col: str = "lang",
    temperature: float = 0.7,
    total_fraction: float = 1.0,
    key: str = "doc_id",
) -> DataFrame:
    """:func:`temperature_fractions` composed with
    :func:`stratified_sample`: one tiny driver aggregate for the rates,
    then the map-only deterministic membership filter."""
    fr = temperature_fractions(df, strata_col, temperature, total_fraction)
    # NULL stratum: create_map lookup can't match a NULL key, so its
    # computed fraction rides in as the default (no other stratum can
    # fall through to the default — every non-NULL stratum observed in
    # df has an entry in fr by construction)
    null_frac = fr.pop(None, 0.0)
    return stratified_sample(
        df, fr, strata_col, key, default_fraction=null_frac
    )
