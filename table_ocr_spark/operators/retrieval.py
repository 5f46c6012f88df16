"""BM25 text retrieval: top-k documents per query over a crawl-scale
corpus — the lexical half of similarity search (the embedding half
lives in ``operators/similarity.py``).

Spark shape — broadcast-stats scoring, NOT a posting-list join:
queries are few by definition (an eval set, a dedupe probe, a
labeling batch), so every corpus-global statistic BM25 needs — per-
term document frequency over the QUERY vocabulary, document count,
average document length — fits on the driver after ONE
aggregation pass (per-term df via array_contains sums), and scoring becomes a single MAP-ONLY pass over the
corpus: per document, an explicit left-to-right sum of per-term
contributions computed from its own token array. Nothing
corpus-sized ever shuffles on a term; the only exchange is the final
per-query top-k over the CANDIDATE set (documents sharing at least
one informative query term).

The classic scatter hazard is a stop-word query term: its candidate
set is the whole corpus. ``max_df_ratio`` prunes query terms whose
document frequency exceeds the ratio (they carry near-zero idf
anyway) — the same fail-safe-by-construction move as
``max_cell_size`` in the embedding near-dup.

Determinism pins (the oracle-exactness rules used repo-wide):
- tokenizer = the shared :func:`~table_ocr_spark.operators.textstats.
  tokens` (split ``\\s+``, drop empties); query strings are tokenized
  with the identical rule on the driver;
- query terms are deduplicated KEEPING FIRST-OCCURRENCE ORDER and the
  score is an explicit left-fold over them (``t1 + t2 + ...``), so
  float addition order is pinned and a SQL mirror writing the same
  chain reproduces every bit;
- ``idf="rational"`` = (N - df + 0.5) / (df + 0.5) — one correctly-
  rounded division, bit-identical on any IEEE engine (this is what
  the oracle pins); ``idf="ln"`` (default) = ln(1 + rational), the
  standard BM25+ shape, computed ONCE on the driver so at least the
  Spark plan sees only literals (ln itself is libm-dependent, which
  is exactly why the cross-engine oracle uses "rational").

Reference has no retrieval (per-document loop, ``table_ocr/core.py``);
this is the standard Robertson/Sparck-Jones BM25.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from table_ocr_spark.operators.textstats import tokens


def _py_tokens(text: str) -> list:
    """Driver-side twin of textstats.tokens. The character class is
    Java's ASCII \\s spelled out — Python's \\s is Unicode-aware
    (NBSP etc.) and would split query text where Spark does not,
    silently making such terms unmatchable."""
    return [w for w in re.split("[ \t\n\x0b\f\r]+", text or "") if w != ""]


def _empty_result(docs, queries, query_id_col: str, id_col: str) -> DataFrame:
    """Zero-row result preserving both id column types — the empty
    and non-empty paths must return the same schema."""
    qid_type = queries.schema[query_id_col].dataType
    return docs.select(
        F.lit(None).cast(qid_type).alias(query_id_col),
        F.col(id_col),
        F.lit(0.0).alias("score"),
        F.lit(0).alias("rank"),
    ).limit(0)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "ln",
    max_df_ratio: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    max_queries: int = 1000,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — the ``k`` best-scoring
    documents per query, rank 1-based, ties broken by min doc id. A
    query whose every term is unseen or df-pruned returns no rows; a
    document scores only if it shares >= 1 surviving term (score > 0).

    One aggregation pass for ALL the stats, one map-only scoring
    pass (all queries scored in a single scan via an exploded struct
    array), one top-k window over candidates. The window partitions
    by query — fine because queries are few and candidates are
    df-bounded; that boundedness is what ``max_df_ratio`` enforces.
    """
    if idf not in ("ln", "rational"):
        raise ValueError(f"idf must be 'ln' or 'rational', got {idf!r}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    qrows = queries.select(query_id_col, query_text_col).limit(
        max_queries + 1
    ).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"bm25_topk: more than {max_queries} queries — this operator "
            "broadcasts per-query term stats; batch-score a large query "
            "set in chunks"
        )
    qterms = {}
    for r in qrows:
        qid = r[query_id_col]
        if qid in qterms:
            raise ValueError(
                f"bm25_topk: duplicate query id {qid!r} — later rows "
                "would silently shadow earlier ones"
            )
        seen: dict = {}
        for t in _py_tokens(r[query_text_col]):
            seen.setdefault(t, None)
        qterms[qid] = list(seen)
    vocab = sorted({t for ts in qterms.values() for t in ts})
    if not vocab:
        return _empty_result(docs, queries, query_id_col, id_col)

    toked = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    # ONE aggregation pass for every corpus statistic: doc count,
    # token total, and per-term df via array_contains — the vocabulary
    # is query-bounded, so the agg width is small and the corpus is
    # read exactly twice overall (stats + scoring)
    stats = toked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("_toks")).alias("dl_sum"),
        *[
            F.sum(F.array_contains("_toks", t).cast("long")).alias(f"_df{i}")
            for i, t in enumerate(vocab)
        ],
    ).collect()[0]
    n_docs, dl_sum = stats["n"], stats["dl_sum"] or 0
    if n_docs == 0:
        return _empty_result(docs, queries, query_id_col, id_col)
    avgdl = dl_sum / n_docs
    dfs = {t: (stats[f"_df{i}"] or 0) for i, t in enumerate(vocab)}

    def _idf(term: str):
        d = dfs.get(term, 0)
        rational = (n_docs - d + 0.5) / (d + 0.5)
        return math.log(1.0 + rational) if idf == "ln" else rational

    dl = F.size("_toks").cast("double")
    one_minus_b = 1.0 - b

    def _eq(term):
        # factory, NOT a default-arg lambda: F.filter passes (element,
        # index) to a 2-arg lambda, silently clobbering a `t=t` default
        return lambda x: x == F.lit(term)

    structs = []
    for qid, terms in qterms.items():
        usable = [
            t for t in terms
            if 0 < dfs.get(t, 0) and dfs[t] / n_docs <= max_df_ratio
        ]
        if not usable:
            continue
        score = None
        for t in usable:
            tf = F.size(F.filter(F.col("_toks"), _eq(t))).cast("double")
            contrib = (
                F.lit(_idf(t))
                * (tf * F.lit(k1 + 1.0))
                / (tf + F.lit(k1) * (F.lit(one_minus_b)
                                     + F.lit(b) * dl / F.lit(avgdl)))
            )
            score = contrib if score is None else score + contrib
        structs.append(
            F.struct(F.lit(qid).alias("qid"), score.alias("score"))
        )
    if not structs:
        return _empty_result(docs, queries, query_id_col, id_col)
    scored = (
        toked.select(
            F.col(id_col), F.explode(F.array(*structs)).alias("_q")
        )
        .select(
            F.col("_q.qid").alias(query_id_col),
            F.col(id_col),
            F.col("_q.score").alias("score"),
        )
        .filter(F.col("score") > 0)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
