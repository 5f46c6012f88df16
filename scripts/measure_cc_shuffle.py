"""Measure total shuffle-write bytes for the duplicate_clusters
iteration shapes: the SHIPPED edge-induced-subgraph loop vs the naive
full-corpus loop (every doc carried through every round). Same recipe
as measure_shuffle.py: one fresh SparkSession per shape, per-shape sum
of shuffleWriteBytes over completed stages via the REST API, both
shapes built from ONE parameterized body so nothing but the measured
axis differs, and the library call cross-checked against its shipping
shape.

The win scales with dup-graph sparsity, so two densities are measured
(the naive shape's bytes barely move — that is the point: it pays for
the CORPUS each round, not for the graph):
  - 10% of docs in a near-dup pair (realistic-ish crawl near-dup graph)
  - 50% of docs in a near-dup pair (pathologically dense)

Usage: python scripts/measure_cc_shuffle.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from pyspark.sql import functions as F  # noqa: E402

# ONE measurement recipe: the session (auto-broadcast DISABLED — at
# 10% density the subgraph shape's label frames would be broadcast-
# eligible while the naive shape's corpus-sized labels are not, and
# the axis under measurement is iteration-state scope, not broadcast
# eligibility; at crawl scale nothing here broadcasts) and the
# bound-port REST byte reader both come from measure_shuffle.py.
from measure_shuffle import _session, _shuffle_write_bytes  # noqa: E402


def _input(spark, n_docs: int, pair_mod: int):
    """n_docs ids; disjoint 2-node chains on every pair_mod-th id —
    fraction of docs touched by the graph = 2 / pair_mod."""
    docs = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    pairs = (
        docs.filter((F.col("doc_id") % pair_mod == 0)
                    & (F.col("doc_id") + 1 < n_docs))
        .select(F.col("doc_id").alias("id_a"),
                (F.col("doc_id") + 1).alias("id_b"))
    )
    return docs, pairs


def cc_shape(spark, docs, pairs, subgraph_only: bool):
    """One parameterized body mirroring operators/dedup.py
    duplicate_clusters; the ONLY branch is the measured axis — whether
    iteration state covers the edge-induced subgraph (shipped) or the
    whole corpus (naive pre-rewrite shape)."""
    from table_ocr_spark.operators.dedup import _truncate_plan

    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges.persist()
    if subgraph_only:
        init = edges.select(F.col("src").alias("id")).distinct()
    else:
        init = docs.select(F.col("doc_id").alias("id"))
    labels, _ = _truncate_plan(init.withColumn("lbl", F.col("id")))
    prev = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
                      ).collect()[0]["s"]
    rounds = 0
    for _ in range(25):
        offered = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "lbl")
        )
        merged = labels.union(offered).groupBy("id").agg(
            F.min("lbl").alias("lbl")
        )
        l2 = merged.select(F.col("id").alias("_jid"), F.col("lbl").alias("_jlbl"))
        jumped = merged.join(l2, merged["lbl"] == l2["_jid"]).select(
            "id", F.least("lbl", "_jlbl").alias("lbl")
        )
        labels, _ = _truncate_plan(jumped)
        new = labels.agg(F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
                         ).collect()[0]["s"]
        rounds += 1
        if new == prev:
            break
        prev = new
    edges.unpersist()
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("n"))
    labeled = labels.join(sizes, "lbl")
    if subgraph_only:
        out = (
            docs.select(F.col("doc_id").alias("id"))
            .join(labeled, "id", "left")
            .select(
                F.col("id").alias("doc_id"),
                F.coalesce("lbl", F.col("id")).alias("cluster_id"),
                F.coalesce(F.col("n"), F.lit(1)).cast("long").alias("cluster_size"),
                F.coalesce(F.col("id") != F.col("lbl"), F.lit(False)).alias("is_dup"),
            )
        )
    else:
        out = labeled.select(
            F.col("id").alias("doc_id"),
            F.col("lbl").alias("cluster_id"),
            F.col("n").cast("long").alias("cluster_size"),
            (F.col("id") != F.col("lbl")).alias("is_dup"),
        )
    return out, rounds


def run_shape(n_docs: int, pair_mod: int, mode: str):
    spark = _session()
    try:
        docs, pairs = _input(spark, n_docs, pair_mod)
        t0 = time.perf_counter()
        if mode == "library":
            from table_ocr_spark.operators.dedup import duplicate_clusters

            out, rounds = duplicate_clusters(docs, pairs), -1
        else:
            out, rounds = cc_shape(spark, docs, pairs, mode == "subgraph")
        out.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        b = _shuffle_write_bytes(spark)
        n_out = out.count()
        return b, wall, rounds, n_out
    finally:
        spark.stop()


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    for pair_mod, label in ((20, "10% of docs in pairs"),
                            (4, "50% of docs in pairs")):
        res = {}
        for mode in ("subgraph", "naive", "library"):
            b, wall, rounds, n_out = run_shape(n_docs, pair_mod, mode)
            res[mode] = b
            print(f"{label:24s} {mode:9s}: {b/1e6:8.2f} MB shuffle, "
                  f"{wall:6.1f} s, rounds={rounds}, rows={n_out}")
        ratio = res["naive"] / max(res["subgraph"], 1)
        drift = abs(res["library"] - res["subgraph"]) / max(res["subgraph"], 1)
        print(f"{label:24s} naive/subgraph = {ratio:.2f}x  "
              f"(library vs mirrored shape drift {drift:.1%})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
