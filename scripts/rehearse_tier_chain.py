"""Standalone full-tier-chain rehearsal (VERDICT r3 #6): raw pages ->
extract -> quality -> exact dedup -> minhash CC closure -> survivors ->
PII -> tiers -> token budget -> tier=K/ layout -> per-tier packed shard
sets, one composition end to end at 1M pages. The same stage runs at
the tail of scripts/scale_rehearsal.py; this script exists so the
full-chain number can be (re)captured without re-timing the nine
stages before it.

Usage: python scripts/rehearse_tier_chain.py [target_docs] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from table_ocr_spark.operators.docpages import documents_as_pages
    from table_ocr_spark.pipelines import (
        build_training_corpus,
        materialize_tiered_corpus,
    )
    from table_ocr_spark.session import get_spark

    spark = get_spark(
        "rehearse_tier_chain",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    work = tempfile.mkdtemp(prefix="tos_chain_")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        reps = max(1, target // max(n, 1))
        heavy = docs.withColumn(
            "text", F.concat_ws(" ", "text", "text", "text", "text")
        )
        big_docs = (
            heavy.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
            )
            .withColumn(
                "doc_id", (F.col("doc_id") * reps + F.col("rep")).cast("long")
            )
            .drop("rep")
        )
        pages = documents_as_pages(
            big_docs.withColumn(
                "url",
                F.concat(
                    F.lit("https://rehearsal.example/"),
                    F.col("doc_id").cast("string"),
                ),
            )
        )
        pages_path = os.path.join(work, "pages")
        pages.repartition(64).write.mode("overwrite").parquet(pages_path)
        pages = spark.read.parquet(pages_path)
        n_total = pages.count()
        print(f"corpus: {n_total} pages")

        t0 = time.perf_counter()
        corpus, rep = build_training_corpus(
            pages, n_tiers=4, token_budget=100_000_000
        )
        chain_path = os.path.join(work, "tiered")
        chain_report = materialize_tiered_corpus(corpus, chain_path)
        t_chain = time.perf_counter() - t0
        n_chain_docs = sum(t["n_docs"] for t in chain_report.values())
        print(
            f"full tier chain {n_total} pages: {t_chain:.1f} s -> "
            f"{n_chain_docs} docs in {len(chain_report)} tiers "
            f"({ {t: s['n_shards'] for t, s in chain_report.items()} } "
            f"shards); stages: {rep}"
        )
        assert n_chain_docs == rep.n_after_budget
        assert set(chain_report) == set(range(4))

        # layout contract: planning-time partition pruning on tier=K/
        one_tier = spark.read.parquet(os.path.join(chain_path, "corpus"))
        pruned = one_tier.filter(F.col("tier") == 0)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan or "tier" in plan
        print("tier=K/ partition pruning: OK")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
