"""Quality-tier extraction: partition a corpus into global
quality tiers (the FineWeb-Edu / DCLM shape — "keep the top-X% of the
crawl by score, route the middle tiers to annealing mixes") from any
per-document numeric score.

The reference's only quality axis is LLM self-agreement per document
(``ui/majority_vote.py``); a pretraining corpus build needs a GLOBAL
ranking — tier boundaries are order statistics of the whole score
distribution, which is exactly the kind of "needs the full corpus"
computation that must not become a global sort at 100 TB.

Scale shape (the ``pack_sequences`` bounded-collect doctrine):
1. scores are QUANTIZED by construction (``token_stats.quality_score``
   is pinned to 6 dp in [0, ~1]), so ``groupBy(score).count()`` is a
   bounded histogram (<= ~1e6 rows) — one map-side-combined exchange,
   never a global sort;
2. the histogram lands on the driver behind an ENFORCED
   ``max_distinct_scores`` fail-fast (collecting an unquantized
   float column would be a driver OOM, so it is an error, not a
   slow path);
3. cutoffs are computed exactly on the driver from the cumulative
   histogram and re-enter the plan as LITERALS — tier assignment is
   then a pure codegen'd expression, map-only over the corpus.

Pinned tier definition (shared with the DuckDB oracle):
- n = corpus row count; scores sorted ascending (1-indexed ranks)
- cutoff ranks = the DISTINCT values of (n*t + T - 1) // T for
  t = 1..T-1 (integer ceil — pinned as integer arithmetic so Spark,
  Python and DuckDB agree bit-for-bit; no float quantile semantics;
  distinct because colliding targets at n < T must count once, the
  way a SQL ``rk IN (...)`` matches a row once)
- tier(doc) = number of cutoffs with score > c_t  -> 0..T-1, higher
  tier = higher score. Assignment depends only on the score, so equal
  scores always share a tier (no ntile row-order nondeterminism) and
  heavy ties may skip tiers — deterministic on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tier_cutoffs(
    df: DataFrame,
    score_col: str,
    n_tiers: int,
    max_distinct_scores: int = 2_000_000,
) -> list:
    """Exact tier boundaries [c_1..c_{T-1}] (ascending ranks) of
    ``score_col`` via the bounded-histogram two-phase plan. Driver
    memory is O(distinct scores), ENFORCED <= ``max_distinct_scores``.
    NULL scores are rejected — a NULL has no rank; filter or impute
    upstream (the documents corpus pins NULL text to score-able empty
    stats, so NULLs here mean a broken upstream)."""
    if n_tiers < 2:
        raise ValueError(f"n_tiers must be >= 2, got {n_tiers}")
    hist = (
        df.select(F.col(score_col).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # +1 sentinel: detect overflow without collecting the overflow
    rows = hist.limit(max_distinct_scores + 1).collect()
    if len(rows) > max_distinct_scores:
        raise ValueError(
            f"tier_cutoffs: more than {max_distinct_scores} distinct "
            f"scores in {score_col!r} — quantize the score (round) "
            "before tiering; an unquantized float column would "
            "materialize corpus-cardinality rows on the driver"
        )
    for r in rows:
        if r["s"] is None:
            raise ValueError(
                f"tier_cutoffs: NULL values in {score_col!r}; a NULL "
                "has no rank — filter or impute upstream"
            )
        if isinstance(r["s"], float) and math.isnan(r["s"]):
            raise ValueError(
                f"tier_cutoffs: NaN values in {score_col!r}; NaN "
                "compares false against everything, so sorting it "
                "would silently corrupt every cutoff — fail instead"
            )
    rows.sort(key=lambda r: r["s"])
    n = sum(r["c"] for r in rows)
    if n == 0:
        raise ValueError("tier_cutoffs: empty input")
    # DISTINCT ranks: for n < n_tiers several targets collide on one
    # rank; the pinned definition counts each rank once (matching a
    # SQL "rk IN (...)" oracle, where an IN-list matches a row once),
    # so a 2-doc 4-tier corpus has 2 cutoffs, not 3
    targets = sorted(
        {(n * t + n_tiers - 1) // n_tiers for t in range(1, n_tiers)}
    )
    cutoffs = []
    it = iter(rows)
    row = next(it)
    cum = row["c"]
    for rank in targets:  # targets ascend, so one forward sweep
        while cum < rank:
            row = next(it)
            cum += row["c"]
        cutoffs.append(row["s"])
    return cutoffs


def score_tiers(
    df: DataFrame,
    score_col: str,
    n_tiers: int = 4,
    max_distinct_scores: int = 2_000_000,
) -> DataFrame:
    """``df`` plus a ``tier`` column — global quality-tier label per
    doc, tier = |{t : score > c_t}| with exact order-statistic cutoffs
    (see module docstring for the pinned definition and the two-phase
    bounded-histogram plan). Appends rather than projects so a
    downstream consumer (token-budget sampling, tiered sinks) composes
    without a join back for its other columns. The assignment pass is
    map-only codegen: the cutoffs are literals, so the corpus is
    scanned exactly twice (histogram + label) and nothing corpus-sized
    ever shuffles on a non-key."""
    cutoffs = tier_cutoffs(df, score_col, n_tiers, max_distinct_scores)
    score = F.col(score_col)
    tier = None
    for c in cutoffs:
        term = F.when(score > F.lit(c), 1).otherwise(0)
        tier = term if tier is None else tier + term
    return df.withColumn("tier", tier.cast("long"))
