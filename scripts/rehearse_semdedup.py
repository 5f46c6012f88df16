"""1M-vector rehearsal of SemDeDup (operators/similarity.py
semantic_dedup) with closed-form planted truth.

Corpus: n deterministic pseudo-random 64-dim vectors (the same
splitmix64 integer-mix as rehearse_pq — no RNG state, executor-side
generation) plus EXACT copies of the first ``n_dup`` ids under
COPY_OFF. Random 64-dim cosines top out ≲ 0.65 over 1M pairs (see
rehearse_pq), so at threshold 0.99 the duplicate groups are EXACTLY
the planted (base, copy) pairs — closed form:

  - output rows == n + n_dup (one audit row per input vector)
  - keep=false rows == n_dup, every one a COPY_OFF id (identical
    vectors tie on centroid_sim, so the min-id rule keeps the base)
  - every duplicate group has size 2; singletons everywhere else

Stages timed separately: k-means training (bounded 65,536-vector
driver sample, k=256), then the full semantic_dedup call (matmul
assignment -> per-cell blocked-matmul pairs -> pointer-jumping CC ->
survivor argmax). Each number self-qualifies with the in-band host
probe.

Usage: python scripts/rehearse_semdedup.py [n] [n_dup] [k]

``k`` defaults to 256 and should grow with the corpus (constant
n/k cell size keeps the per-cell quadratic pair work LINEAR in n —
the SemDeDup deployment rule); k > 256 also exercises the
wide-k trainer path train_kmeans unlocked in round 5.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

COPY_OFF = 1_000_000_000
K_DEFAULT = 256
DIM = 64


def _mix_vec(ids: np.ndarray) -> np.ndarray:
    """(n,) int64 -> (n, DIM) float64 in [-1, 1) — the rehearse_pq
    splitmix64 avalanche, REDEFINED here (not imported) so cloudpickle
    ships it by value to executors (an import from scripts/ would
    pickle by reference and fail on workers, which don't carry this
    directory on their path)."""
    j = np.arange(DIM, dtype=np.uint64).reshape(1, -1)
    i = ids.astype(np.uint64).reshape(-1, 1)
    z = i * np.uint64(DIM) + j + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(32)).astype(np.float64) / float(2**31) - 1.0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_dup = int(sys.argv[2]) if len(sys.argv) > 2 else n // 20
    k = int(sys.argv[3]) if len(sys.argv) > 3 else K_DEFAULT

    from bench import probe_effective_cores
    from table_ocr_spark.operators.similarity import (
        semantic_dedup,
        train_kmeans,
    )
    from table_ocr_spark.session import get_spark

    spark = get_spark(
        "rehearse_semdedup",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])

    def gen(batches):  # executor-side deterministic generation
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            # a COPY_OFF id carries its base id's exact vector
            base_ids = np.where(ids >= COPY_OFF, ids - COPY_OFF, ids)
            vecs = _mix_vec(base_ids).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})

    ids = spark.range(n).select(F.col("id")).unionByName(
        spark.range(n_dup).select((F.col("id") + COPY_OFF).alias("id"))
    )
    emb = ids.repartition(64).mapInPandas(gen, schema=schema).cache()
    total = emb.count()
    assert total == n + n_dup

    t0 = time.time()
    cents = train_kmeans(emb, k=k, max_train=65_536)
    t_train = time.time() - t0
    print(f"[probe {probe_effective_cores():.1f}/32] train_kmeans "
          f"k={k} on the bounded 65,536 sample: {t_train:.1f} s")

    t0 = time.time()
    out = semantic_dedup(
        emb, centroids=cents, threshold=0.99, max_cell_size=200_000
    ).cache()
    n_out = out.count()
    t_dedup = time.time() - t0

    # ---- closed-form asserts
    assert n_out == total, (n_out, total)
    dropped = out.filter(~F.col("keep"))
    n_dropped = dropped.count()
    assert n_dropped == n_dup, (n_dropped, n_dup)
    bad = dropped.filter(F.col("vec_id") < COPY_OFF).count()
    assert bad == 0, f"{bad} base ids dropped (min-id tie rule violated)"
    sizes = (
        out.groupBy("group_size").count().orderBy("group_size").collect()
    )
    by_size = {r["group_size"]: r["count"] for r in sizes}
    assert by_size == {1: total - 2 * n_dup, 2: 2 * n_dup}, by_size
    # every copy's group label is its base id
    mislabeled = (
        out.filter(F.col("vec_id") >= COPY_OFF)
        .filter(F.col("group_id") != F.col("vec_id") - COPY_OFF)
        .count()
    )
    assert mislabeled == 0, f"{mislabeled} copies mislabeled"

    print(f"[probe {probe_effective_cores():.1f}/32] semantic_dedup "
          f"{t_dedup:.1f} s over {total:,} vectors "
          f"({total / t_dedup:,.0f} vectors/s); kept "
          f"{n_out - n_dropped:,}, dropped {n_dropped:,} "
          f"(== planted copies, min-id survivors, all group sizes "
          f"closed-form exact)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
