"""Reusable JVM-side column expressions (no Python UDFs in here).

Everything stays inside whole-stage codegen / higher-order functions:
cosine similarity, pinned tokenization, two-phase salted aggregation.
(The JVM-HOF shingle/minhash helpers that used to live here were dead
code duplicating the pinned Arrow-kernel implementations in
operators/dedup.py — two divergent "pinned" definitions invite oracle
drift, so they were removed rather than kept as a trap.)
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_array(col: str | Column) -> Column:
    """array<float> → array<double> (match the oracle's double math)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same evaluation order as the
    DuckDB oracle's list_dot_product, so doubles agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def words(col: str | Column) -> Column:
    """Whitespace tokenization — pinned as split on \\s+ with empty
    tokens dropped (identical regex on the DuckDB side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def salted_agg(
    df: DataFrame,
    key: str,
    agg_cols: dict,
    salt_buckets: int = 8,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(key, salt) partial →
    groupBy(key) final. ``agg_cols`` maps output name → (col, 'sum'|'count').

    The partial pass spreads a hot key over ``salt_buckets`` reducers
    (north rule: explicit salting for skewed hosts); the final pass
    combines ``salt_buckets`` tiny partials per key.
    """
    src = salt_source if salt_source is not None else F.spark_partition_id()
    if isinstance(src, str):
        src = F.col(src)
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(salt_buckets)))

    partial_aggs, final_aggs = [], []
    for name, (col, kind) in agg_cols.items():
        if kind == "sum":
            partial_aggs.append(F.sum(col).alias(f"_p_{name}"))
        elif kind == "count":
            # honor the supplied column: count(col) is the NON-NULL
            # count (count(lit(1)) would silently count all rows even
            # when the caller asked to count a nullable column)
            partial_aggs.append(F.count(col).alias(f"_p_{name}"))
        else:
            raise ValueError(kind)
        final_aggs.append(F.sum(f"_p_{name}").alias(name))

    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
