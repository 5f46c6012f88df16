"""BM25 top-k: exact agreement with a pinned python reference
(same fold order, same idf recipe), df pruning, tie-breaks, and the
guard rails."""

import math

import pytest

from table_ocr_spark.operators.retrieval import bm25_topk


DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana banana banana"),
    (2, "cherry apple"),
    (3, "durian cherry banana apple apple apple"),
    (4, "elderberry"),
    (5, "apple"),
    (6, "banana cherry"),
    (7, "filler words only here"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _qdf(spark, qs):
    return spark.createDataFrame(qs, "query_id string, query_text string")


def _py_bm25(query_text, k1=1.2, b=0.75, idf_mode="ln", max_df_ratio=0.5):
    """Reference twin of the operator: identical tokenization, term
    order, fold order, and idf recipe."""
    toks = [d[1].split() for d in DOCS]
    n = len(DOCS)
    avgdl = sum(len(t) for t in toks) / n
    dfs = {}
    for t in toks:
        for w in set(t):
            dfs[w] = dfs.get(w, 0) + 1
    seen = {}
    for w in query_text.split():
        seen.setdefault(w, None)
    usable = [w for w in seen
              if 0 < dfs.get(w, 0) and dfs[w] / n <= max_df_ratio]
    out = {}
    for (doc_id, _), tlist in zip(DOCS, toks):
        score = None
        for w in usable:
            d = dfs[w]
            rational = (n - d + 0.5) / (d + 0.5)
            idf = math.log(1.0 + rational) if idf_mode == "ln" else rational
            tf = float(tlist.count(w))
            dl = float(len(tlist))
            c = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * dl / avgdl))
            score = c if score is None else score + c
        if score is not None and score > 0:
            out[doc_id] = score
    return out


def test_exact_agreement_with_reference(spark):
    for idf_mode in ("ln", "rational"):
        got = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_topk(
                _df(spark), _qdf(spark, [("q1", "apple durian")]),
                k=100, idf=idf_mode, max_df_ratio=1.0,
            ).collect()
        }
        want = _py_bm25("apple durian", idf_mode=idf_mode, max_df_ratio=1.0)
        assert {d: s for (_, d), s in got.items()} == want


def test_rare_term_dominates_ranking(spark):
    # 'durian' appears only in doc 3 — it must rank first for a
    # query mixing it with a common term
    rows = bm25_topk(
        _df(spark), _qdf(spark, [("q", "durian apple")]),
        k=3, max_df_ratio=1.0,
    ).collect()
    assert rows[0]["doc_id"] == 3 and rows[0]["rank"] == 1
    assert len(rows) == 3


def test_df_pruning_drops_stop_terms(spark):
    # apple df=4/8=0.5 > 0.4: pruned; query of only such terms -> no rows
    out = bm25_topk(
        _df(spark), _qdf(spark, [("q", "apple")]), max_df_ratio=0.4
    )
    assert out.count() == 0
    # durian (df 1/8) survives the same ratio
    out2 = bm25_topk(
        _df(spark), _qdf(spark, [("q", "durian apple")]), max_df_ratio=0.4
    ).collect()
    assert [r["doc_id"] for r in out2] == [3]


def test_unseen_query_terms_ignored(spark):
    rows = bm25_topk(
        _df(spark), _qdf(spark, [("q", "zzz durian")]), max_df_ratio=1.0
    ).collect()
    assert [r["doc_id"] for r in rows] == [3]
    none = bm25_topk(_df(spark), _qdf(spark, [("q", "zzz yyy")]))
    assert none.count() == 0


def test_k_bound_and_tie_break(spark):
    # docs 2 and 6 are symmetric for 'cherry' (same tf, same dl):
    # identical scores, tie broken by min doc_id
    rows = bm25_topk(
        _df(spark), _qdf(spark, [("q", "cherry")]), k=2, max_df_ratio=1.0
    ).collect()
    assert len(rows) == 2
    scores = {r["doc_id"]: (r["score"], r["rank"]) for r in rows}
    assert 2 in scores and scores[2][1] < scores.get(6, (0, 99))[1]


def test_multiple_queries_one_pass(spark):
    rows = bm25_topk(
        _df(spark),
        _qdf(spark, [("a", "durian"), ("b", "elderberry")]),
        max_df_ratio=1.0,
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert by_q == {"a": [3], "b": [4]}


def test_guards(spark):
    df, q = _df(spark), _qdf(spark, [("q", "apple")])
    with pytest.raises(ValueError, match="idf"):
        bm25_topk(df, q, idf="bm11")
    with pytest.raises(ValueError, match="k must"):
        bm25_topk(df, q, k=0)
    with pytest.raises(ValueError, match="queries"):
        bm25_topk(df, _qdf(spark, [("a", "x"), ("b", "y")]), max_queries=1)
    assert bm25_topk(df.limit(0), q).count() == 0
    assert bm25_topk(df, _qdf(spark, [("q", "  ")])).count() == 0


def _collect_ranked(df):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in df.collect()
    )


def test_kernel_and_expr_engines_are_bit_identical(spark):
    # the Arrow kernel must reproduce the expression fold EXACTLY —
    # same float64 ops in the same pinned left-fold order
    docs = _df(spark).repartition(5)
    qs = _qdf(
        spark,
        [("q1", "apple durian"), ("q2", "banana"),
         ("q3", "cherry banana apple"), ("q4", "zzz elderberry")],
    )
    for idf_mode in ("ln", "rational"):
        a = _collect_ranked(bm25_topk(
            docs, qs, k=5, idf=idf_mode, max_df_ratio=1.0, method="expr"))
        b = _collect_ranked(bm25_topk(
            docs, qs, k=5, idf=idf_mode, max_df_ratio=1.0, method="kernel"))
        assert a == b, idf_mode  # exact float equality included
        assert len(a) > 0


def test_topk_partition_count_invariance(spark):
    # the two-phase pre-reduce (per-partition heap / (_pid, qid)
    # window) must not change results with the physical partitioning
    qs = _qdf(spark, [("q", "apple cherry")])
    base = None
    for n_parts, method in [(1, "expr"), (7, "expr"), (1, "kernel"),
                            (7, "kernel"), (3, "auto")]:
        got = _collect_ranked(bm25_topk(
            _df(spark).repartition(n_parts), qs, k=3,
            max_df_ratio=1.0, method=method))
        if base is None:
            base = got
        assert got == base, (n_parts, method)
    assert len(base) == 3


def test_expr_path_has_pre_reduce_in_plan(spark):
    # r3 verdict #2: the global per-query window must be fed by a
    # per-(partition, query) local top-k, never raw candidates
    plan = bm25_topk(
        _df(spark), _qdf(spark, [("q", "apple")]),
        max_df_ratio=1.0, method="expr",
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "_pid" in plan and "spark_partition_id" in plan.lower()
    # the local pre-reduce is a group-limit keyed by (_pid, query) —
    # Spark 4 pushes row_number<=k down as WindowGroupLimit
    assert "WindowGroupLimit [_pid" in plan


def test_expr_forced_past_term_guard_raises(spark):
    qs = _qdf(spark, [("q", "apple banana cherry durian")])
    with pytest.raises(ValueError, match="max_expr_terms"):
        bm25_topk(_df(spark), qs, max_df_ratio=1.0, method="expr",
                  max_expr_terms=3)
    # auto silently routes the same batch to the kernel
    out = bm25_topk(_df(spark), qs, max_df_ratio=1.0, method="auto",
                    max_expr_terms=3)
    assert out.count() > 0


def test_wide_vocab_stats_path_matches_wide_agg(spark):
    # past max_expr_terms the stats phase switches to the
    # explode+groupBy shape; dfs must agree with the wide aggregate
    qs_text = "apple banana cherry durian elderberry zzz filler"
    qs = _qdf(spark, [("q", qs_text)])
    a = _collect_ranked(bm25_topk(
        _df(spark), qs, k=8, max_df_ratio=1.0, max_expr_terms=64,
        method="kernel"))
    b = _collect_ranked(bm25_topk(
        _df(spark), qs, k=8, max_df_ratio=1.0, max_expr_terms=2,
        method="kernel"))
    assert a == b and len(a) > 0


def test_default_df_ratio_prunes_stop_words(spark):
    # 'banana' is in 4/8 docs (df ratio 0.5) — at the 0.05 default it
    # must be pruned; an explicit 1.0 keeps it
    qs = _qdf(spark, [("q", "banana")])
    assert bm25_topk(_df(spark), qs).count() == 0
    assert bm25_topk(_df(spark), qs, max_df_ratio=1.0).count() == 4

def test_bm25_parameter_guards(spark):
    """k1=0 forked the two engines (kernel ZeroDivisionError vs expr
    silent NaN-drop); both knobs are validated up front now."""
    import pytest

    from table_ocr_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    qs = spark.createDataFrame([(1, "a")], "query_id long, query_text string")
    with pytest.raises(ValueError, match="k1"):
        bm25_topk(docs, qs, k1=0.0)
    with pytest.raises(ValueError, match="b must"):
        bm25_topk(docs, qs, b=1.5)

