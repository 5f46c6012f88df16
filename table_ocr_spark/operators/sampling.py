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
    no join, still map-only.

    A ``None`` key in ``fractions`` (the NULL stratum, as
    :func:`temperature_fractions` returns for lang-id failures) is
    applied through an explicit ``isNull`` branch — a NULL map key is
    illegal in Spark, and a NULL lookup could never match anyway."""
    fractions = dict(fractions)
    null_frac = fractions.pop(None, None)
    pairs = []
    for s, frac in fractions.items():
        pairs.append(F.lit(s))
        pairs.append(F.lit(_threshold_hex(frac)))
    thresholds = F.create_map(*pairs) if pairs else F.lit(None)
    thr = F.coalesce(
        thresholds[F.col(strata_col)] if pairs else F.lit(None),
        F.lit(_threshold_hex(default_fraction)),
    )
    if null_frac is not None:
        thr = F.when(
            F.col(strata_col).isNull(), F.lit(_threshold_hex(null_frac))
        ).otherwise(thr)
    return df.filter(_hash_prefix(F.col(key)) < thr)


def temperature_fractions(
    df: DataFrame,
    strata_col: str = "lang",
    temperature: float = 0.7,
    total_fraction: float = 1.0,
    max_strata: int = 10_000,
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
    if temperature <= 0:  # validate BEFORE the eager aggregate
        raise ValueError(f"temperature must be positive, got {temperature}")
    # the bounded-collect claim above is ENFORCED, same sentinel shape
    # as token_budget_fractions: a mistakenly high-cardinality
    # strata_col (url, doc_id) must fail fast, not OOM the driver
    rows = (
        df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(max_strata + 1)
        .collect()
    )
    if len(rows) > max_strata:
        raise ValueError(
            f"temperature_fractions: more than {max_strata} distinct "
            f"{strata_col!r} values — strata must stay a bounded "
            "driver collect (raise max_strata only if the cardinality "
            "is genuinely that high)"
        )
    counts = {r["s"]: r["n"] for r in rows}
    return temperature_fractions_from_counts(
        counts, temperature, total_fraction
    )


def temperature_fractions_from_counts(
    counts: Dict, temperature: float = 0.7, total_fraction: float = 1.0
) -> Dict:
    """The pure fraction math of :func:`temperature_fractions`, split
    out so an oracle can feed it counts gathered by ANOTHER engine
    (the splits.py embed-as-literals recipe): fractions — and hence
    the hex thresholds — become a deterministic function of the
    counts MULTISET computed in exactly one place. Every float
    reduction is ORDER-PINNED (strata sorted, NULL last) because the
    caller's dict order is engine/collect-order dependent and float
    addition does not commute in the low bits."""
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    # drop zero-count strata BEFORE the weight math: a caller feeding
    # externally-gathered counts routinely pre-seeds strata (e.g.
    # dict.fromkeys(all_langs, 0)), and a zero-count stratum has no
    # rows to sample — its fraction is meaningless and its weight of
    # 0.0 would otherwise divide by counts[s]=0 below (review r4)
    counts = {s: c for s, c in counts.items() if c != 0}
    total = sum(counts.values())
    if total == 0:
        return {}
    order = sorted(counts, key=lambda s: (s is None, s))
    weights = {s: (counts[s] / total) ** temperature for s in order}
    wsum = 0.0
    for s in order:
        wsum += weights[s]
    # expected rows for stratum s: total_fraction * total * w_s / wsum;
    # fraction of the stratum's own rows, capped at 1.0
    return {
        s: min(1.0, total_fraction * total * (weights[s] / wsum) / counts[s])
        for s in order
    }


_U64 = 1 << 64
# Spark decimal(38,0) holds < 1e38; membership multiplies a u64 hash
# (< 1.845e19) by a per-stratum token total, so totals must stay below
# 1e38 / 2^64 ~ 5.4e18 tokens PER STRATUM for the product to be exact.
# 5.4 quintillion tokens per stratum is ~4 orders of magnitude past
# the largest published pretraining corpora — enforced anyway.
_MAX_STRATUM_WEIGHT = 10**38 // _U64


def token_budget_fractions(
    df: DataFrame,
    budget: int,
    strata_col: str = "tier",
    weight_col: str = "n_tokens",
    mix: Dict | None = None,
    max_strata: int = 10_000,
    cap_at_total: bool = True,
) -> Dict:
    """Per-stratum (kept_budget B_s, total T_s) integer pairs for
    :func:`token_budget_sample` — the "give me a 20 B-token corpus,
    60 % top tier / 30 % mid / 10 % tail" annealing-mix recipe
    (FineWeb-Edu / DCLM shape), as EXACT integer arithmetic.

    ``T_s`` = sum of ``weight_col`` over stratum ``s`` (one bounded
    map-side-combined aggregate; driver holds one row per stratum,
    ENFORCED <= ``max_strata``). ``B_s``:

    - ``mix=None`` (proportional downscale): ``B_s = budget*T_s //
      T_total`` — floor division, pure integers.
    - ``mix={stratum: share}``: shares are SNAPPED to parts-per-million
      (``int(round(share*1e6))``), then ``B_s = budget*ppm_s //
      10**6`` — pinned so the recipe is a closed-form function of
      integers, re-derivable on any engine with no float in sight.
      Strata absent from ``mix`` get ``B_s = 0``.

    ``B_s`` caps at ``T_s`` (a stratum cannot yield more tokens than
    it has in one pass; excess budget is NOT redistributed —
    closed-form beats clever, same deliberate choice as
    :func:`temperature_fractions`). ``cap_at_total=False`` returns the
    RAW ``B_s`` for :func:`token_budget_upsample`, whose multi-epoch
    semantics make an over-total budget meaningful.
    Weights must be non-negative; per-stratum totals are enforced
    below the decimal(38,0) exactness bound (~5.4e18 tokens).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    # sum in decimal(38,0): a long sum could wrap past 2^63 BEFORE the
    # exactness-bound check below runs (the guard must not be
    # defeatable by the overflow it guards against); count-vs-count
    # catches NULL weights (min() skips NULLs, so it cannot)
    totals_df = df.groupBy(F.col(strata_col).alias("s")).agg(
        F.sum(F.col(weight_col).cast("decimal(38,0)")).alias("t"),
        F.min(F.col(weight_col).cast("long")).alias("w_min"),
        (F.count(F.lit(1)) - F.count(weight_col)).alias("n_null"),
    )
    rows = totals_df.limit(max_strata + 1).collect()
    if len(rows) > max_strata:
        raise ValueError(
            f"token_budget_fractions: more than {max_strata} distinct "
            f"strata in {strata_col!r} — this operator is for bounded "
            "strata (tiers, languages); a high-cardinality column here "
            "would materialize corpus-cardinality rows on the driver"
        )
    for r in rows:
        if r["n_null"] > 0 or r["w_min"] is None or r["w_min"] < 0:
            raise ValueError(
                f"token_budget_fractions: NULL or negative {weight_col!r} "
                f"in stratum {r['s']!r} — weights are token counts; "
                "fix upstream"
            )
        if r["t"] > _MAX_STRATUM_WEIGHT:
            raise ValueError(
                f"token_budget_fractions: stratum {r['s']!r} total "
                f"{r['t']} exceeds the decimal(38,0) exactness bound "
                f"{_MAX_STRATUM_WEIGHT}"
            )
    totals = {r["s"]: int(r["t"]) for r in rows}
    t_total = sum(totals.values())
    out = {}
    for s, t_s in totals.items():
        if mix is None:
            b_s = budget * t_s // t_total if t_total else 0
        else:
            b_s = budget * int(round(mix.get(s, 0.0) * 10**6)) // 10**6
        out[s] = (min(b_s, t_s) if cap_at_total else b_s, t_s)
    return out


def token_budget_sample(
    df: DataFrame,
    budget: int,
    strata_col: str = "tier",
    weight_col: str = "n_tokens",
    mix: Dict | None = None,
    key: str = "doc_id",
    max_strata: int = 10_000,
) -> DataFrame:
    """Deterministic sample hitting a per-stratum TOKEN budget in
    expectation: row kept iff ``u64(md5(key)[:16]) * T_s < B_s *
    2^64`` — the rational-threshold form of the md5 rule
    (:func:`deterministic_sample`) with ZERO floating point anywhere:
    both sides are exact integers (Spark ``decimal(38,0)``, DuckDB
    ``HUGEINT``), so membership is bit-reproducible across engines,
    runs, and partitionings, and E[kept tokens in s] = (B_s/T_s)*T_s
    = B_s exactly (the hash is independent of document length).
    The float-threshold sibling (:func:`temperature_fractions`) is
    NOT oracle-checkable for data-derived rates — float rounding in
    ``int(frac * 2^64)`` differs across engines; this operator exists
    to make budgeted sampling exact. One bounded driver aggregate for
    (B_s, T_s), then a map-only codegen filter over the corpus.

    A NULL stratum rides through like any other (its (B, T) pair
    enters via the NULL-key fallback — map literals cannot match NULL).
    """
    fr = token_budget_fractions(
        df, budget, strata_col, weight_col, mix, max_strata
    )
    null_bt = fr.pop(None, (0, 0))
    pairs_t, pairs_rhs = [], []
    for s, (b_s, t_s) in fr.items():
        pairs_t += [F.lit(s), F.lit(str(t_s))]
        pairs_rhs += [F.lit(s), F.lit(str(b_s * _U64))]
    dec = "decimal(38,0)"
    s_col = F.col(strata_col)
    t_lit = (
        F.coalesce(F.create_map(*pairs_t)[s_col], F.lit(str(null_bt[1])))
        if pairs_t
        else F.lit(str(null_bt[1]))
    ).cast(dec)
    rhs = (
        F.coalesce(
            F.create_map(*pairs_rhs)[s_col], F.lit(str(null_bt[0] * _U64))
        )
        if pairs_rhs
        else F.lit(str(null_bt[0] * _U64))
    ).cast(dec)
    u64 = F.conv(_hash_prefix(F.col(key)), 16, 10).cast(dec)
    return df.filter(u64 * t_lit < rhs)


def token_budget_upsample(
    df: DataFrame,
    budget: int,
    strata_col: str = "tier",
    weight_col: str = "n_tokens",
    mix: Dict | None = None,
    key: str = "doc_id",
    max_strata: int = 10_000,
    max_epochs: int = 1_000,
    epoch_col: str = "epoch",
    fractions: Dict | None = None,
) -> DataFrame:
    """The data-constrained twin of :func:`token_budget_sample`
    (Muennighoff et al.'s regime — the budget EXCEEDS what one pass
    over a stratum can supply, so high-value strata repeat for
    multiple epochs): stratum ``s`` emits ``epochs_s = B_s // T_s``
    full passes (``epoch_col`` = 0..epochs_s-1) plus one residual
    pass (``epoch_col`` = epochs_s) whose membership is the SAME
    exact-integer rule on the remainder — row in iff
    ``u64(md5(key)) * T_s < (B_s mod T_s) * 2^64``. Everything stays
    integer (Spark decimal(38,0) ≡ DuckDB HUGEINT), so the output
    multiset is bit-reproducible across engines and partitionings and
    ``E[emitted tokens in s] = epochs_s*T_s + (B_s mod T_s) = B_s``
    EXACTLY — for any budget, under or over the corpus size
    (:func:`token_budget_sample` silently caps at one pass; this
    operator exists for the other side of that cap).

    A budget at or under ``T_s`` degenerates to the sample semantics
    (epochs_s = 0, every emitted row carries epoch 0) with the
    identical kept-row set. Pinned edge: a stratum whose total weight
    is 0 takes epochs_s = 0 and puts its WHOLE budget on the residual
    rule, where ``u64 * 0 < B_s * 2^64`` keeps every row iff
    ``B_s > 0`` — mirroring :func:`token_budget_sample` on weightless
    strata.

    Scale shape: one bounded driver aggregate for the (B_s, T_s)
    plan, then a map-only ``explode(sequence(...))`` over the corpus —
    no shuffle, no join; downstream shard packing re-keys on
    ``(key, epoch_col)``. Output amplification is caller-chosen and
    fail-fast-guarded by ``max_epochs`` (a fat-finger budget of 10^6x
    the corpus would otherwise materialize 10^6 copies of every row).

    ``fractions`` injects a precomputed ``{stratum: (B_s, T_s)}`` plan
    (exact integers, same shape :func:`token_budget_fractions` and
    :func:`unimax_fractions` return) and skips the internal aggregate —
    the hook that lets allocation POLICIES (proportional, fixed mix,
    UniMax waterfilling) share this one emission kernel. ``budget`` and
    ``mix`` are ignored when it is given.
    """
    if epoch_col in df.columns:
        raise ValueError(
            f"token_budget_upsample: input already has a {epoch_col!r} "
            "column — pass epoch_col= to avoid the clobber"
        )
    fr = fractions if fractions is not None else token_budget_fractions(
        df, budget, strata_col, weight_col, mix, max_strata,
        cap_at_total=False,
    )
    plan = {}
    for s, (b_s, t_s) in fr.items():
        # weightless stratum: only the SIGN of the residual matters
        # (u64*0 < r*2^64), so pin r to 1/0 — the raw uncapped B_s
        # could overflow the decimal(38,0) rhs literal and silently
        # flip keep-all into keep-none (review r4)
        ep, r_s = (b_s // t_s, b_s % t_s) if t_s > 0 else (
            0, 1 if b_s > 0 else 0
        )
        if ep > max_epochs:
            raise ValueError(
                f"token_budget_upsample: stratum {s!r} would repeat for "
                f"{ep} epochs (> max_epochs={max_epochs}) — budget "
                f"{b_s} vs stratum total {t_s}; raise max_epochs only "
                "if that amplification is intended"
            )
        plan[s] = (ep, r_s, t_s)
    null_plan = plan.pop(None, (0, 0, 0))
    dec = "decimal(38,0)"
    s_col = F.col(strata_col)

    def _lit_map(idx, as_dec=False, scale=1):
        pairs = []
        for s, p in plan.items():
            pairs += [F.lit(s), F.lit(str(p[idx] * scale))]
        default = F.lit(str(null_plan[idx] * scale))
        col = (
            F.coalesce(F.create_map(*pairs)[s_col], default)
            if pairs
            else default
        )
        return col.cast(dec) if as_dec else col.cast("int")

    epochs_lit = _lit_map(0)
    rhs = _lit_map(1, as_dec=True, scale=_U64)
    t_lit = _lit_map(2, as_dec=True)
    u64 = F.conv(_hash_prefix(F.col(key)), 16, 10).cast(dec)
    n_copies = epochs_lit + F.when(u64 * t_lit < rhs, 1).otherwise(0)
    # Spark sequence(0, -1) DESCENDS instead of being empty — rows with
    # zero copies must take the explicit empty array (explode drops them)
    seq = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(epoch_col, F.explode(seq))


def unimax_fractions(
    df: DataFrame,
    budget: int,
    max_epochs: int = 4,
    strata_col: str = "lang",
    weight_col: str = "n_tokens",
    max_strata: int = 10_000,
) -> Dict:
    """UniMax budget allocation (Chung et al. 2023): spread ``budget``
    tokens as UNIFORMLY as possible across strata, subject to the
    per-stratum epoch cap ``C_s = T_s * max_epochs`` — the published
    fix for temperature sampling's twin failure modes (low temperature
    starves tail languages, high temperature repeats them into
    memorization). Returns ``{stratum: (B_s, T_s)}`` exact-integer
    pairs, the same plan shape :func:`token_budget_fractions` emits, so
    :func:`token_budget_upsample` replays it verbatim.

    The waterfill is the CLOSED FORM, not the paper's iterative loop,
    so any engine re-derives it from the (stratum, T_s) table alone:
    sort strata by ``(C_s, str(stratum))`` ascending; stratum ``i``
    (1-based, full cap prefix ``P_{i-1}``) is *capped* iff
    ``C_i * (n-i+1) <= budget - P_{i-1}`` — cap-monotonicity makes the
    capped set a PREFIX of the order (if ``i`` fails, ``i+1`` fails:
    ``B - P_i < C_i*(n-i+1) - C_i <= C_{i+1}*(n-i)``), so the per-row
    test needs no iteration. Capped strata take ``C_s`` (exactly
    ``max_epochs`` passes); the ``m`` uncapped ones split the rest
    ``R`` as ``R // m`` each, with the ``R mod m`` remainder going one
    token apiece to the FIRST remainder-many uncapped strata in the
    same sort order. Everything is integer arithmetic — allocations
    sum to ``min(budget, sum_s C_s)`` exactly (a budget above the
    total cap leaves the excess deliberately unspent: every stratum is
    already at ``max_epochs``, and repeating further is precisely what
    UniMax exists to refuse).

    Scale shape: identical to :func:`token_budget_fractions` — one
    bounded map-side-combined aggregate (<= ``max_strata`` rows on the
    driver, enforced there), then O(n log n) driver arithmetic.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    totals = {
        s: t for s, (_, t) in token_budget_fractions(
            df, 0, strata_col, weight_col, None, max_strata
        ).items()
    }
    alloc = waterfill({s: t * max_epochs for s, t in totals.items()}, budget)
    return {s: (alloc[s], totals[s]) for s in totals}


def waterfill(caps: Dict, budget: int) -> Dict:
    """The pure closed-form waterfill at the heart of
    :func:`unimax_fractions` (docstring there proves the prefix
    property): exact-integer allocation of ``budget`` across capped
    strata, sums to ``min(budget, sum(caps))``. Exposed separately so
    the allocation law is testable against a brute-force reference
    without a Spark session, and reusable for any capped fair-share
    split (per-host fetch budgets, per-shard quotas)."""
    order = sorted(caps, key=lambda s: (caps[s], str(s)))
    n = len(order)
    alloc: Dict = {}
    prefix = 0
    j = n  # index of the first uncapped stratum
    for i, s in enumerate(order):
        if caps[s] * (n - i) <= budget - prefix:
            alloc[s] = caps[s]
            prefix += caps[s]
        else:
            j = i
            break
    if j < n:
        base, rem = divmod(budget - prefix, n - j)
        for idx, s in enumerate(order[j:]):
            alloc[s] = base + (1 if idx < rem else 0)
    return alloc


def unimax_sample(
    df: DataFrame,
    budget: int,
    max_epochs: int = 4,
    strata_col: str = "lang",
    weight_col: str = "n_tokens",
    key: str = "doc_id",
    max_strata: int = 10_000,
    epoch_col: str = "epoch",
) -> DataFrame:
    """UniMax-allocated corpus emission: :func:`unimax_fractions`
    plans ``(B_s, T_s)`` per stratum, :func:`token_budget_upsample`
    replays it with the exact-integer md5 membership rule — capped
    strata emit exactly ``max_epochs`` full passes, waterfilled strata
    emit ``B_s // T_s`` passes plus the bit-reproducible residual.
    ``E[emitted tokens] = min(budget, max_epochs * T_total)`` exactly.
    Map-only after one bounded driver aggregate; the per-stratum epoch
    count is ``<= max_epochs`` BY CONSTRUCTION, so the emission
    kernel's own amplification guard is passed through rather than
    re-tripped."""
    fr = unimax_fractions(
        df, budget, max_epochs, strata_col, weight_col, max_strata
    )
    return token_budget_upsample(
        df,
        0,
        strata_col,
        weight_col,
        key=key,
        max_strata=max_strata,
        max_epochs=max_epochs,
        epoch_col=epoch_col,
        fractions=fr,
    )


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
    # the NULL stratum's fraction rides in fr under key None;
    # stratified_sample applies it through its isNull branch
    return stratified_sample(df, fr, strata_col, key)
