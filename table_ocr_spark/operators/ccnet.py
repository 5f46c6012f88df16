"""CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
document with a language-model quality signal, compute PER-LANGUAGE
score terciles, and label each document head / middle / tail — the
classic crawl-curation step between extraction and sampling (head =
most-fluent third of its language, the slice CCNet keeps for LM
training; tail = the gibberish/boilerplate third).

The LM is the corpus's own unigram model
(:func:`textstats.unigram_logprob` — order-0 so it stays exactly
SQL-reproducible; README documents the production swap-in of a real
KenLM/fastText score, which drops into ``score_col`` unchanged), and
the per-language thresholds are exact order statistics from
:func:`tiers.grouped_tier_cutoffs` — ONE histogram exchange for every
language at once, never a per-language corpus scan.

Reference parity: the reference has no corpus layer (its pipeline ends
at OCR result JSON, ``table_ocr/core.py``); this is the curation stage
its extracted text would feed at pretraining scale.

100-TB shape: score pass (explode + vocab-sized join, measured in
textstats) -> one grouped-histogram exchange (|distinct (lang,
rounded-score)| rows, enforced bound) -> cutoffs re-enter as literals,
so labeling is map-only whole-stage codegen. Two full passes over the
score pipeline (cutoffs, then labeling) — the deliberate
no-corpus-sized-cache doctrine shared with score_tiers/token_budget
(BASELINE.md round-3 measurement); at production scale write the
scored frame to a lang-partitioned table once and run both passes
against that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import unigram_logprob
from .tiers import grouped_tier_cutoffs

CCNET_LABELS = ("head", "middle", "tail")


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    labels: tuple = CCNET_LABELS,
    max_distinct_scores: int = 2_000_000,
    max_groups: int = 1_000,
) -> DataFrame:
    """Label every document with its CCNet bucket: per ``lang_col``
    group, exact ``len(labels)``-quantile cutoffs of the 6-dp-rounded
    ``avg_neg_logprob`` score, then ``bucket = labels[|{c : score >
    c}|]`` — lowest neg-logprob (most fluent) lands in ``labels[0]``
    ('head'). Ties sit with the lower bucket (strict ``>``), the
    same pinned rule as :func:`tiers.score_tiers`.

    A language with fewer documents than buckets yields fewer cutoffs
    (the pinned DISTINCT-rank rule), so its docs spread over the first
    ``n_cutoffs + 1`` labels — no label is ever invented for a rank
    that does not exist. NULL ``lang_col`` is coalesced to ``''``.

    Output: (id_col, lang_col, n_tokens, avg_neg_logprob, bucket).
    Exchanges: the score pipeline's own (vocab-join + per-doc agg),
    one id-keyed join to re-attach the language, and the single
    grouped-histogram aggregate inside the cutoff engine; labeling
    itself is map-only literals.
    """
    if len(labels) < 2:
        raise ValueError(f"need >= 2 bucket labels, got {labels!r}")
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col)
    langed = scored.join(
        df.select(
            F.col(id_col),
            F.coalesce(F.col(lang_col).cast("string"), F.lit("")).alias(
                "_g"
            ),
        ),
        id_col,
    )
    cuts = grouped_tier_cutoffs(
        langed,
        "avg_neg_logprob",
        "_g",
        len(labels),
        max_distinct_scores=max_distinct_scores,
        max_groups=max_groups,
    )
    bucket = None
    for g in sorted(cuts):
        tier = F.lit(0)
        for c in cuts[g]:
            tier = tier + (
                F.col("avg_neg_logprob") > F.lit(float(c))
            ).cast("int")
        lbl = F.element_at(
            F.array(*[F.lit(l) for l in labels[: len(cuts[g]) + 1]]),
            tier + F.lit(1),
        )
        bucket = (
            F.when(F.col("_g") == g, lbl)
            if bucket is None
            else bucket.when(F.col("_g") == g, lbl)
        )
    if bucket is None:  # empty input: schema-stable empty frame
        bucket = F.lit(None).cast("string")
    return langed.select(
        F.col(id_col),
        F.col("_g").alias(lang_col),
        "n_tokens",
        "avg_neg_logprob",
        bucket.alias("bucket"),
    )
