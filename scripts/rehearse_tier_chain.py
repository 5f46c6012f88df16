"""Standalone full-tier-chain rehearsal (VERDICT r3 #6): raw pages ->
extract -> quality -> exact dedup -> minhash CC closure -> survivors ->
PII -> tiers -> token budget -> tier=K/ layout -> per-tier packed shard
sets, one composition end to end at 1M pages. The same stage runs at
the tail of scripts/scale_rehearsal.py; this script exists so the
full-chain number can be (re)captured without re-timing the nine
stages before it.

Corpus shape matters here: scale_rehearsal.py's pure-replica corpus is
the dedup WORST case (every replica exact-identical), so exact dedup
collapses 1M -> ~5k and the tier/budget/shard stages downstream see
almost nothing — fine for the dedup stages, useless as evidence for
the rest of the chain. This script builds a realistic crawl mix
instead, all deterministic expressions:

  90% unique   — per-replica word permutation (sort words by
                 xxhash64(word, pos, doc_id)) with a per-(doc, word)
                 numeric salt suffix. The salt matters: the synthetic
                 corpus draws from a ~31-word vocabulary, so UNSALTED
                 permutations of different docs still share k-word
                 shingles at rates that make every LSH band bucket hot
                 and the candidate-verify join quadratic in the corpus
                 (measured: >80 GB shuffle at 1M docs — ENOSPC). Real
                 web text has a ~10^6-word vocabulary; the salt
                 restores that property (cross-doc shingle overlap ~0)
                 while keeping token counts and near-Gopher word-length
                 stats intact;
  8%  exact    — byte-identical replicas (exact-dedup fodder);
  2%  near-dup — base text + one unique trailing token (J ~= 0.99:
                 exact dedup misses them, MinHash+CC must catch them).

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
        # base-weight text (~1.6 KB/doc — realistic web-page extract),
        # NOT the 4x-quadrupled corpus scale_rehearsal.py uses: at 1M
        # near-unique docs the MinHash verify stage shuffles the shingle
        # sets, and 4x text quadruples that exchange past this host's
        # ~80 GB scratch space (measured: the quadrupled run died on
        # ENOSPC in the CC init). Doc COUNT is the axis this rehearsal
        # pins; per-doc weight is scale_rehearsal's.
        replicated = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
        ).withColumn(
            "doc_id", (F.col("doc_id") * reps + F.col("rep")).cast("long")
        )
        words = F.split(F.col("text"), " ")
        permuted = F.array_join(
            F.transform(
                F.array_sort(
                    F.transform(
                        words,
                        lambda w, i: F.struct(
                            F.xxhash64(w, i, F.col("doc_id")).alias("k"),
                            F.concat(
                                w,
                                (
                                    F.abs(
                                        F.xxhash64(
                                            w, i, F.col("doc_id"), F.lit("s")
                                        )
                                    )
                                    % 9973
                                ).cast("string"),
                            ).alias("w"),
                        ),
                    )
                ),
                lambda s: s["w"],
            ),
            " ",
        )
        cls = F.col("doc_id") % 100
        big_docs = replicated.withColumn(
            "text",
            F.when(cls < 90, permuted)
            .when(cls < 98, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"),
                    F.lit(" nd"),
                    F.col("doc_id").cast("string"),
                )
            ),
        ).drop("rep")
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
        # ~10 kept tokens/doc against ~50 actual tokens/doc -> the
        # budget stage genuinely down-samples (~20%) at any corpus size
        corpus, rep = build_training_corpus(
            pages, n_tiers=4, token_budget=10 * target
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
        # the mix must have exercised every stage: exact dedup collapses
        # only the 8% exact class (each base keeps one survivor), the
        # near-dup class must survive exact dedup and die in CC closure,
        # and the budget stage must have actually down-sampled
        assert 0.88 * n_total < rep.n_after_exact_dedup < 0.94 * n_total, rep
        assert rep.n_after_near_dedup < rep.n_after_exact_dedup, rep
        assert 0 < rep.n_after_budget < rep.n_after_near_dedup, rep

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
