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

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from table_ocr_spark.functions.sqlfuncs import as_double_array, cosine


def _with_vec(
    df: DataFrame, vec_col: str = "embedding", with_label: bool = True
) -> DataFrame:
    cols = [F.col("vec_id"), as_double_array(vec_col).alias("vec")]
    if with_label:
        cols.append(F.col("label"))
    return df.select(*cols)


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


# 64-bit signatures in 8 bands of 8 bits: 256-way bucket selectivity
# per band (4-bit bands had 16 values — every bucket held ~n/16 vectors
# and the candidate join went quadratic). Recall at cos>=0.99 is
# 1-(1-(1-θ/π)^8)^8 ≈ 1-8e-5; exact duplicates are always found.
HP_BITS = 64
HP_BAND_BITS = 8


def _plane_matrix(bits: int, dim: int):
    """Deterministic pseudo-random planes in [-1, 1): a pinned integer
    mix of (bit, dim) — no RNG state, identical on every executor and
    run. numpy-computable so the signature UDF is one matmul."""
    import numpy as np

    b = np.arange(bits, dtype=np.uint64).reshape(-1, 1)
    j = np.arange(dim, dtype=np.uint64).reshape(1, -1)
    h = (b * np.uint64(1_000_003) + j * np.uint64(7919)) * np.uint64(2654435761)
    return (h % np.uint64(2**32)).astype(np.float64) / float(2**31) - 1.0


def _hyperplane_sig_udf(bits: int):
    """vec array -> signature via one numpy matmul per Arrow batch.
    NOT a Spark higher-order fold: bits x dim interpreted lambda steps
    cost ~3ms/vector (measured), the matmul ~microseconds — the same
    interpreted-HOF trap as shingle construction."""
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def udf(vecs):  # type: ignore[no-untyped-def]
        import numpy as np

        live = [(i, v) for i, v in enumerate(vecs) if v is not None and len(v)]
        out = [None] * len(vecs)  # NULL vec -> NULL signature; null band
        # keys never equi-join, so such rows yield no candidates
        if live:
            M = np.stack([np.asarray(v, dtype=np.float64) for _, v in live])
            W = _plane_matrix(bits, M.shape[1])
            sig_bits = (M @ W.T) >= 0  # (n, bits)
            weights = np.left_shift(np.uint64(1), np.arange(bits, dtype=np.uint64))
            packed = (sig_bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
            for (i, _), p_ in zip(live, packed.view(np.int64)):
                out[i] = int(p_)
        return pd.Series(out, dtype="object")

    return udf


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
    (1.0) for true duplicates, whose signatures are identical. The
    input needs only (vec_id, vec_col) — genuinely label-free."""
    base = _with_vec(emb, vec_col, with_label=False)
    sig = base.select(
        "vec_id", _hyperplane_sig_udf(HP_BITS)(F.col("vec")).alias("_sig")
    )
    mask = (1 << HP_BAND_BITS) - 1
    n_bands = HP_BITS // HP_BAND_BITS
    # Band rows and the candidate self-join carry ONLY (vec_id, band,
    # bkey) — 24 bytes/row. The previous shape exploded the full vector
    # 8x through the exchange and shuffled two vector copies per
    # candidate BEFORE dedup; at crawl scale that exchange dominates the
    # whole job. Vectors re-join ONCE per deduped pair for the exact
    # verification — the same narrow-candidates-then-rejoin shape as
    # MinHash's _pair_jaccard (operators/dedup.py).
    banded = sig.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    # unsigned shift: the packed 64-bit signature may be
                    # negative as a long; arithmetic shift would smear
                    # the sign bit into high bands
                    F.shiftrightunsigned("_sig", i * HP_BAND_BITS)
                    .bitwiseAND(F.lit(mask))
                    .alias("bkey"),
                )
                for i in range(n_bands)
            ])
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bkey")
    # cached: both sides of the band self-join read it; uncached, the
    # signature matmul UDF would run twice over every embedding
    banded = banded.cache()
    a = banded.select(F.col("vec_id").alias("id_a"), "band", "bkey")
    b = banded.select(F.col("vec_id").alias("id_b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = base.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("_va"))
    vb = base.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("_vb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    sim = cosine(F.col("_va"), F.col("_vb"))
    return (
        pairs.filter(sim >= threshold)
        .select("id_a", "id_b", F.round(sim, 6).alias("cosine"))
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    max_cell_size: Optional[int] = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_id_a < vec_id_b,
    cosine >= threshold), blocked by the coarse ``label`` cell: true
    near-dups of a vector land in its own cell, so the join is
    label-equi rather than all-pairs (same pruning argument as IVF).

    Within a cell the comparison IS all-pairs — quadratic in the cell.
    Zipfian label distributions put a whole corpus slice in one cell
    and turn one reducer quadratic, so ``max_cell_size`` guards the
    plan: cells above the cap fail fast with the offending labels
    (a bounded collect — one count per label, filtered to violators)
    instead of silently hanging a 4-hour stage. For corpora whose cells
    can't be bounded, use :func:`hyperplane_near_dup_pairs` — the
    label-free LSH path whose candidate count is ~linear. Pass ``None``
    to skip the check (e.g. inside tests with known-small cells).
    """
    base = _with_vec(emb, vec_col)
    if max_cell_size is not None:
        hot = (
            base.groupBy("label")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_cell_size)
            .limit(20)
            .collect()
        )
        if hot:
            detail = ", ".join(f"{r['label']}={r['_n']}" for r in hot)
            raise ValueError(
                f"cosine_near_dup_pairs: label cell(s) exceed "
                f"max_cell_size={max_cell_size} ({detail}); all-pairs "
                f"within such a cell is quadratic — raise the cap "
                f"consciously or use hyperplane_near_dup_pairs"
            )
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
