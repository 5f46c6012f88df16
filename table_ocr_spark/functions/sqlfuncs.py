"""Reusable JVM-side column expressions (no Python UDFs in here).

Everything stays inside whole-stage codegen / higher-order functions:
cosine similarity, word shingles, min-hash signatures, two-phase salted
aggregation. These are the building blocks for the dedup / similarity /
text-analysis operators (the training-data-pipeline surface).
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


def word_shingles(words_col: Column, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined). Empty when < k words."""
    n = F.size(words_col)
    idx = F.sequence(F.lit(0), n - k)  # inclusive; negative → CASE below
    mk = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words_col, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, mk).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> List[Column]:
    """num_hashes independent min-hashes of a shingle set, via seeded
    xxhash64 (seed mixed in as a literal column). JVM-side only.

    NOTE: the per-seed lambda must be built by a factory with exactly
    one parameter — a default-arg lambda (``lambda s, i=i``) would be
    introspected by pyspark as a 2-arg (element, index) lambda and the
    seed would silently become the array index.
    """

    def _hasher(seed: int):
        def h(s: Column) -> Column:
            return F.xxhash64(F.lit(seed), s)

        return h

    return [
        F.array_min(F.transform(shingles, _hasher(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def band_keys(sig_cols: Sequence[str], rows_per_band: int = 2) -> List[Column]:
    """LSH band bucket keys: hash of each consecutive group of
    ``rows_per_band`` signature components."""
    out = []
    for b in range(0, len(sig_cols), rows_per_band):
        group = [F.col(c) for c in sig_cols[b : b + rows_per_band]]
        out.append(F.xxhash64(F.lit(b), *group).alias(f"band_{b // rows_per_band}"))
    return out


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
            partial_aggs.append(F.count(F.lit(1)).alias(f"_p_{name}"))
        else:
            raise ValueError(kind)
        final_aggs.append(F.sum(f"_p_{name}").alias(name))

    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
