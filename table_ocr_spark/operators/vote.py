"""Majority-vote operator — Spark re-expression of the reference's one
genuine multi-operator relational query, ``sample_majority_vote``
(``table_ocr/parser.py:39-126``; caller ``ui/majority_vote.py:59-201``).

Semantics preserved (SURVEY.md §3.4):
1. ``n_samples`` defaults to ``countDistinct(sample)``      (parser.py:61-62)
2. group sizes via groupBy.count                            (parser.py:78)
3. ambiguous keys: groups with size > n_samples             (parser.py:81)
4. anti-join (unambiguous) / semi-join (ambiguous) split    (parser.py:84-85)
5. per-column mode + agreement proportion + n_samples       (parser.py:68-75,90-97)
6. ambiguous branch regrouped with ``resolve_group``        (parser.py:100-121)
7. diagonal-relaxed union of both branches, sorted by keys  (parser.py:122-126)

Documented deviation (SURVEY.md §2.4 A2): the reference's mode
tie-break (polars ``value_counts(sort=True).first()``) is unspecified.
We PIN ``(count desc, value asc, nulls last)`` and encode the same rule
in the DuckDB oracle.

Plan shape (100 TB-aware): values are unpivoted with ``stack`` so the
vote is ONE shuffle on (keys, column, value) + a window — independent
of the number of voted columns — instead of one groupBy per column.
Partial aggregation (map-side combine) applies to the count; AQE handles
skewed keys.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _vote(
    df: DataFrame,
    keys: List[str],
    value_cols: List[str],
    ambiguous: bool,
) -> DataFrame:
    """Mode + agreement per column per group, deterministic tie-break."""
    # unpivot value columns (stack keeps nulls; unpivot API may not).
    # Column names flow in from user table headers, so they are escaped
    # for BOTH contexts they land in: the string literal (backslash +
    # quote) and the backquoted identifier (backtick doubling) — an
    # unescaped quote would be a ParseException or, crafted, a
    # different expression.
    def _lit(c: str) -> str:
        return c.replace("\\", "\\\\").replace("'", "\\'")

    bad = [c for c in value_cols if "`" in c]
    if bad:
        # a clear error at the API boundary beats an AnalysisException
        # deep in the plan: backticks cannot be referenced unambiguously
        # through the downstream F.col() pivots
        raise ValueError(
            f"value column names may not contain backticks: {bad}; "
            f"rename them before voting"
        )
    stack_expr = "stack({n}, {pairs}) as (_col, _val)".format(
        n=len(value_cols),
        pairs=", ".join(
            f"'{_lit(c)}', cast(`{c}` as string)" for c in value_cols
        ),
    )
    long = df.select(*keys, F.expr(stack_expr))

    counts = long.groupBy(*keys, "_col", "_val").agg(F.count(F.lit(1)).alias("_cnt"))
    wk = [F.col(k) for k in keys] + [F.col("_col")]
    w_rank = Window.partitionBy(*wk).orderBy(
        F.desc("_cnt"), F.asc_nulls_last("_val")
    )
    w_tot = Window.partitionBy(*wk)
    ranked = counts.withColumn("_rn", F.row_number().over(w_rank)).withColumn(
        "_tot", F.sum("_cnt").over(w_tot)
    )
    winners = ranked.filter(F.col("_rn") == 1).select(
        *keys,
        "_col",
        "_val",
        (F.col("_cnt") / F.col("_tot")).alias("_agreement"),
        F.col("_tot").alias("_n"),
    )
    pivoted = (
        winners.groupBy(*keys)
        .pivot("_col", value_cols)
        .agg(
            F.first("_val").alias("v"),
            F.first("_agreement").alias("a"),
            F.first("_n").alias("n"),
        )
    )
    sel = [F.col(k) for k in keys]
    for c in value_cols:
        # backtick-quoted references: a dot in a value column name
        # ('price.usd', plausible from user table headers) would
        # otherwise parse as struct-field access and fail analysis
        # deep in the plan (backticks themselves are rejected above)
        sel.append(F.col(f"`{c}_v`").alias(c))
        sel.append(F.col(f"`{c}_a`").alias(f"{c}_agreement"))
    sel.append(F.col(f"`{value_cols[0]}_n`").alias("n_samples"))
    sel.append(F.lit(ambiguous).alias("ambiguous"))
    return pivoted.select(*sel)


def sample_majority_vote(
    df: DataFrame,
    group_by_cols: List[str],
    n_samples: Optional[int] = None,
    resolve_group: Optional[str] = None,
    sample_col: str = "sample",
) -> DataFrame:
    """See module docstring. ``df`` is the long multi-sample table
    (one row per (group, sample) observation); returns one row per
    group (plus ``resolve_group`` splits for ambiguous groups) with the
    voted value, ``{col}_agreement``, ``n_samples`` and ``ambiguous``.

    Voted values are compared as strings (the reference's frames are
    string-dominant; dtypes restored on output).
    """
    value_cols = [
        c for c in df.columns
        if c not in group_by_cols and c != sample_col and c != resolve_group
    ]
    if not value_cols:
        raise ValueError("no value columns to vote on")
    dtypes = dict(df.dtypes)

    if n_samples is None:
        n_samples = df.select(
            F.countDistinct(sample_col).alias("n")
        ).first()["n"]

    sizes = df.groupBy(*group_by_cols).agg(F.count(F.lit(1)).alias("_gs"))
    ambiguous_keys = sizes.filter(F.col("_gs") > F.lit(n_samples)).select(
        *group_by_cols
    )

    unamb = df.join(ambiguous_keys, on=group_by_cols, how="left_anti")
    amb = df.join(ambiguous_keys, on=group_by_cols, how="left_semi")

    res_unamb = _vote(unamb, group_by_cols, value_cols, ambiguous=False)

    amb_keys = (
        group_by_cols + [resolve_group]
        if resolve_group is not None
        else list(group_by_cols)
    )
    res_amb = _vote(amb, amb_keys, value_cols, ambiguous=True)

    out = res_unamb.unionByName(res_amb, allowMissingColumns=True)

    # restore original dtypes for voted columns (vote compared strings)
    for c in value_cols:
        if dtypes.get(c) and dtypes[c] != "string":
            out = out.withColumn(c, F.col(c).cast(dtypes[c]))
    return out.orderBy(*group_by_cols)
