"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline; the IVF variant
(coarse partition -> search only the probed cell) is the scale path:
at 10^12 vectors the cross join is impossible, but a partition-pruned
cell scan is a broadcast-join of the query set against ~1/nlist of the
data. Here the coarse quantizer is the pre-assigned ``label`` column
(at real scale: k-means centroid ids); the *plan shape* — prune, then
exact re-rank inside the cell — is the point.

All math is JVM-side higher-order functions (``zip_with``/``aggregate``
— a sequential left-fold dot product, the same evaluation order DuckDB
uses, so oracle doubles agree). Scores are rounded to 6 dp in outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from table_ocr_spark.functions.sqlfuncs import as_double_array, cosine


def _with_vec(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.select(
        F.col("vec_id"), as_double_array(vec_col).alias("vec"), F.col("label")
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for the given query vec_ids.

    Plan: broadcast the (tiny) query set against the full collection —
    a map-only broadcast nested loop, no shuffle of the big side except
    the final per-query top-k (window over k*|Q| rows after local
    pre-filtering by rank). Output: (query_id, neighbor_id, rank, score).
    """
    base = _with_vec(emb, vec_col)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    pairs = base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qvec"), F.col("vec")).alias("_score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_score", 6).alias("score"))
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: search only the query's own coarse cell
    (``label``), exact re-rank inside it. Equi-join on label instead of
    a cross join — the collection side is hash-partitioned by label, so
    each query touches one cell (partition pruning at scale).
    """
    base = _with_vec(emb, vec_col)
    q = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    pairs = base.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qvec"), F.col("vec")).alias("_score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_score", 6).alias("score"))
    )


HP_BITS = 16
HP_BAND_BITS = 4  # 4 bands of 4 bits


def _hyperplane_sig(vec: Column) -> Column:
    """Random-hyperplane signature: bit b set iff dot(vec, w_b) >= 0,
    with plane weights derived deterministically from xxhash64(b, j)
    (no RNG state to ship; same planes on every executor/run). The
    2-arg transform lambda is the (element, index) form — index IS the
    dimension here."""
    def _weigher(b: int):
        # factory: the lambda must have EXACTLY (element, index) params —
        # a default-arg third parameter breaks pyspark arity introspection
        def w(x: Column, i: Column) -> Column:
            h = F.xxhash64(F.lit(b), i)
            return x * ((F.pmod(h, F.lit(1001)) - 500) / F.lit(500.0))

        return w

    sig = F.lit(0).cast("long")
    for b in range(HP_BITS):
        proj = F.aggregate(
            F.transform(vec, _weigher(b)), F.lit(0.0), lambda acc, v: acc + v
        )
        sig = sig + F.when(proj >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return sig


def hyperplane_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH + exact
    cosine verification — the label-free scale path (no coarse cells
    needed): candidates come from shared signature bands, survivors are
    verified exactly, so precision is 1.0; recall at cos >= 0.99
    (angle <= 8.1 deg) is 1 - (1-(1-θ/π)^4)^4 ≈ 1 - 8e-4, and exact
    (1.0) for true duplicates, whose signatures are identical."""
    base = _with_vec(emb, vec_col)
    sig = base.select("vec_id", "vec", _hyperplane_sig(F.col("vec")).alias("_sig"))
    mask = (1 << HP_BAND_BITS) - 1
    n_bands = HP_BITS // HP_BAND_BITS
    banded = sig.select(
        "vec_id",
        "vec",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright("_sig", i * HP_BAND_BITS)
                    .bitwiseAND(F.lit(mask))
                    .alias("bkey"),
                )
                for i in range(n_bands)
            ])
        ).alias("bb"),
    ).select("vec_id", "vec", "bb.band", "bb.bkey")
    a = banded.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("_va"), "band", "bkey")
    b = banded.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("_vb"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = cosine(F.col("_va"), F.col("_vb"))
    return (
        cand.filter(sim >= threshold)
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_id_a < vec_id_b,
    cosine >= threshold), blocked by the coarse ``label`` cell: true
    near-dups of a vector land in its own cell, so the join is
    label-equi rather than all-pairs (same pruning argument as IVF).
    """
    base = _with_vec(emb, vec_col)
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("_va"), "label"
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("_vb"), "label"
    )
    sim = cosine(F.col("_va"), F.col("_vb"))
    return (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(sim >= threshold)  # threshold on the unrounded value
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
    )
