"""1M-vector rehearsal of the PQ ANN path (operators/similarity.py).

Planted ground truth: 1M deterministic pseudo-random 64-dim vectors
(integer-mix formula, no RNG state) plus, for each of 3 query ids, 5
planted near-duplicates (q + 0.02·perturbation, cosine ≈ 0.9995). A
random unit vector pair in R^64 has cosine ~ N(0, 1/64) (std 0.125);
the max over 1M samples stays ≲ 0.65, so the exact top-5 of every
query IS its planted set — closed-form, asserted on the brute-force
engine, then used to score PQ recall.

Reports, each self-qualified with the in-band host probe:
  - brute_force_topk wall time (the exact engine at 1M)
  - PQ train / encode / search wall times and vectors/s
  - code-table compression vs the float table
  - PQ recall@5 against the planted truth (expected 1.0: planted ADC
    ≈ the reconstruction ceiling, random ADC ~ 0 ± quantization noise)

Usage: python scripts/rehearse_pq.py [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

DIM = 64
QUERIES = [11, 222, 3333]
PLANTS_PER_QUERY = 5
K = 5


def _mix_vec(ids: np.ndarray) -> np.ndarray:
    """(n,) int64 -> (n, DIM) float64 in [-1, 1): splitmix64 avalanche
    of (id*DIM + coord) — identical in the Spark kernel and the
    driver-side check. A LINEAR mix is not enough here: without the
    avalanche, ids at a fixed stride share a constant per-coordinate
    shift mod 2^64 and become accidental near-duplicates that beat the
    planted ones (caught by the planted-truth assert)."""
    j = np.arange(DIM, dtype=np.uint64).reshape(1, -1)
    i = ids.astype(np.uint64).reshape(-1, 1)
    z = i * np.uint64(DIM) + j + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(32)).astype(np.float64) / float(2**31) - 1.0


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from bench import probe_effective_cores
    from table_ocr_spark.operators.similarity import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )
    from table_ocr_spark.session import get_spark

    spark = get_spark(
        "rehearse_pq",
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
            vecs = _mix_vec(ids).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vecs)}
            )

    base = spark.range(n).repartition(64).mapInPandas(gen, schema=schema)

    # planted near-duplicates: ids n, n+1, ... copy each query's vector
    # with a small deterministic perturbation
    plants = []
    for qi, q in enumerate(QUERIES):
        qv = _mix_vec(np.asarray([q]))[0]
        for p in range(PLANTS_PER_QUERY):
            pert = _mix_vec(np.asarray([10_000_000 + qi * 100 + p]))[0]
            pv = qv + 0.02 * pert
            plants.append((n + qi * PLANTS_PER_QUERY + p,
                           [float(x) for x in pv.astype(np.float32)]))
    planted_ids = {
        q: {n + qi * PLANTS_PER_QUERY + p for p in range(PLANTS_PER_QUERY)}
        for qi, q in enumerate(QUERIES)
    }
    emb = base.unionByName(spark.createDataFrame(plants, schema)).cache()
    total = emb.count()
    assert total == n + len(QUERIES) * PLANTS_PER_QUERY

    # ---- exact engine: brute force at 1M (and the ground-truth check)
    t0 = time.time()
    bf = brute_force_topk(emb, QUERIES, k=K).collect()
    t_bf = time.time() - t0
    got_bf = {}
    for r in bf:
        got_bf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for q in QUERIES:
        assert got_bf[q] == planted_ids[q], (
            f"planted truth violated for q={q}: {sorted(got_bf[q])}"
        )
    print(f"[probe {probe_effective_cores():.1f}/32] brute_force_topk "
          f"{t_bf:.1f} s over {total:,} vectors x {len(QUERIES)} queries "
          f"({total * len(QUERIES) / t_bf:,.0f} cosines/s); "
          f"exact top-{K} == planted set for all queries")

    # ---- PQ: train (bounded driver k-means), encode (map-only), search
    t0 = time.time()
    books = train_pq_codebooks(emb, m=16, ksub=16, max_train=65_536)
    t_train = time.time() - t0

    t0 = time.time()
    enc = pq_encode(emb, books)
    enc.write.format("noop").mode("overwrite").save()
    t_enc = time.time() - t0

    t0 = time.time()
    pq = pq_topk(emb, QUERIES, k=K, codebooks=books).collect()
    t_pq = time.time() - t0
    got_pq = {}
    for r in pq:
        got_pq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got_pq.get(q, set()) & planted_ids[q]) for q in QUERIES)
    recall = hits / (len(QUERIES) * K)
    code_bytes = 16
    float_bytes = DIM * 4
    print(f"[probe {probe_effective_cores():.1f}/32] pq: train {t_train:.1f} s "
          f"(65,536-sample driver k-means), encode {t_enc:.1f} s "
          f"({total / t_enc:,.0f} vec/s, {code_bytes} B/vec vs {float_bytes} "
          f"B/vec floats = {float_bytes / code_bytes:.0f}x), "
          f"search {t_pq:.1f} s ({total * len(QUERIES) / t_pq:,.0f} "
          f"ADC lookups/s), recall@{K} vs planted truth = {recall:.3f}")
    assert recall >= 0.8, f"recall collapsed: {recall}"

    # ---- steady-state serving: codes PERSISTED once (the production
    # shape), each query batch scans the 16-byte table only
    import tempfile as _tf

    codes_dir = _tf.mkdtemp(prefix="pq_codes_") + "/codes"
    pq_encode(emb, books).write.mode("overwrite").parquet(codes_dir)
    codes = spark.read.parquet(codes_dir)
    t0 = time.time()
    pq2 = pq_topk(emb, QUERIES, k=K, codebooks=books, codes=codes).collect()
    t_serve = time.time() - t0
    assert sorted(map(tuple, pq2)) == sorted(map(tuple, pq)), \
        "persisted-codes path diverged from inline encode"
    import shutil as _sh

    _sh.rmtree(codes_dir.rsplit("/", 1)[0], ignore_errors=True)
    print(f"[probe {probe_effective_cores():.1f}/32] pq serve (persisted "
          f"codes table, no re-encode): {t_serve:.1f} s "
          f"({total * len(QUERIES) / t_serve:,.0f} ADC lookups/s), "
          f"results identical to the inline-encode run")

    # ---- IVF×PQ: 1000 coarse cells (vec_id % 1000; planted rows take
    # their query's cell), so the scan touches ~|Q| cells ≈ 0.3% of the
    # corpus — the cell constraint is per-query inside the kernel
    from table_ocr_spark.operators.similarity import ivf_pq_topk

    labeled = emb.withColumn(
        "label",
        F.when(
            F.col("vec_id") >= n,
            # planted id -> its query's label
            F.element_at(
                F.array(*[F.lit(q % 1000) for q in QUERIES]),
                ((F.col("vec_id") - n) / PLANTS_PER_QUERY).cast("int") + 1,
            ),
        ).otherwise(F.col("vec_id") % 1000),
    )
    t0 = time.time()
    ipq = ivf_pq_topk(labeled, QUERIES, k=K, codebooks=books).collect()
    t_ivf = time.time() - t0
    got_ipq = {}
    for r in ipq:
        got_ipq.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got_ipq.get(q, set()) & planted_ids[q]) for q in QUERIES)
    recall_ivf = hits / (len(QUERIES) * K)
    print(f"[probe {probe_effective_cores():.1f}/32] ivf_pq (1000 cells, "
          f"~{(len(QUERIES)/1000)*100:.1f}% of the corpus scanned): "
          f"{t_ivf:.1f} s, recall@{K} vs planted truth = {recall_ivf:.3f}")
    assert recall_ivf >= 0.8, f"ivf_pq recall collapsed: {recall_ivf}"
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
