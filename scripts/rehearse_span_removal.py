"""1M-doc rehearsal for operators/dedup.remove_duplicate_spans (the
round-4 ExactSubstr-removal operator). Two corpus regimes, because the
operator's cost has two distinct worst axes:

  realistic — per-doc salted-unique bodies (the rehearse_tier_chain.py
              salt recipe: cross-doc gram overlap ~0) with a fixed
              10-token passage planted at the FRONT of 10% of docs.
              Expected removal is closed-form: grams inside the
              passage are hot, grams straddling the passage/body
              boundary contain salted tokens and stay unique, so
              EXACTLY the 10 planted tokens drop per planted doc —
              asserted in-run. This regime stresses the gram-count
              exchange (~50M gram instances) with a tiny hot set.
  degenerate — every doc identical (scale_rehearsal.py's pure-replica
              shape): every position covered, the kernel strips 100%
              of every doc. Maximum covered-position traffic and
              maximum kernel work; the hot-gram set is tiny. The worst
              case must be a slope, not a cliff.

Usage: python scripts/rehearse_span_removal.py [target_docs] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from table_ocr_spark.operators.dedup import remove_duplicate_spans
    from table_ocr_spark.session import get_spark

    spark = get_spark(
        "rehearse_span_removal",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    reps = max(1, target // max(n, 1))
    replicated = docs.withColumn(
        "rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
    ).withColumn(
        "doc_id", (F.col("doc_id") * reps + F.col("rep")).cast("long")
    ).drop("rep")

    # salted-unique body (rehearse_tier_chain.py recipe, minus the
    # permutation — position order is irrelevant to gram uniqueness)
    words = F.split(F.col("text"), " ")
    salted = F.array_join(
        F.transform(
            words,
            lambda w, i: F.concat(
                w,
                (
                    F.abs(F.xxhash64(w, i, F.col("doc_id"), F.lit("s")))
                    % 9973
                ).cast("string"),
            ),
        ),
        " ",
    )
    # the passage is followed by a PER-DOC-UNIQUE separator token:
    # without it, the boundary gram "…theta iota kappa <body0>" carries
    # only ONE salted token, and body0's value space (the ~31-word base
    # vocabulary x 9973 salts ~= 309k) collides birthday-style across
    # 100k planted docs (~28% gained a spurious +1 covered token when
    # this script first ran without the separator) — the separator
    # makes every passage/body boundary gram globally unique, so the
    # expected drop count is exactly closed-form
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    realistic = replicated.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.lit(passage + " uq"),
                F.col("doc_id").cast("string"),
                F.lit(" "),
                salted,
            ),
        ).otherwise(salted).alias("text"),
    )
    realistic.write.mode("overwrite").parquet("/tmp/tos_span_corpus")
    realistic = spark.read.parquet("/tmp/tos_span_corpus")
    n_total = realistic.count()
    n_planted = realistic.filter(F.col("doc_id") % 10 == 0).count()

    t0 = time.perf_counter()
    out = remove_duplicate_spans(realistic, k=5)
    agg = out.agg(
        F.sum("n_dropped").alias("drop"),
        F.sum(F.when(F.col("n_dropped") > 0, 1).otherwise(0)).alias("touched"),
    ).collect()[0]
    t_real = time.perf_counter() - t0
    print(
        f"remove_duplicate_spans realistic {n_total}: {t_real:.1f} s, "
        f"{agg['touched']} docs touched, {agg['drop']} tokens dropped"
    )
    assert agg["touched"] == n_planted, (agg, n_planted)
    assert agg["drop"] == 10 * n_planted, (agg, n_planted)

    degenerate = replicated.select(
        "doc_id", F.lit("one two three four five six seven eight").alias("text")
    )
    degenerate.write.mode("overwrite").parquet("/tmp/tos_span_corpus_deg")
    degenerate = spark.read.parquet("/tmp/tos_span_corpus_deg")
    degenerate.count()
    t0 = time.perf_counter()
    dout = remove_duplicate_spans(degenerate, k=5)
    dagg = dout.agg(
        F.sum("n_dropped").alias("drop"), F.sum("n_kept").alias("kept")
    ).collect()[0]
    t_deg = time.perf_counter() - t0
    print(
        f"remove_duplicate_spans degenerate {n_total}: {t_deg:.1f} s, "
        f"dropped {dagg['drop']}, kept {dagg['kept']}"
    )
    assert dagg["kept"] == 0 and dagg["drop"] == 8 * n_total, dagg
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
