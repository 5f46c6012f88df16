"""1M-doc rehearsal for the hashed-ngram linear quality classifier
(operators/importance.apply_linear_model + train_quality_classifier).

Claims to rehearse:
- the model build stays B-bounded: two explode→groupBy(bucket)
  aggregates whose exchange carries ≤ n_buckets rows per partition
  regardless of corpus size (the weight table is then ≤ B rows,
  broadcast);
- scoring is one corpus-feature-stream pass with a single id-keyed
  exchange of partial (sum, count) pairs — throughput should track
  the DSIR scorer, which shares the plan shape;
- correctness holds closed-form at scale: replicas of the same
  document text must receive EXACTLY the same score as the original
  (the score is a pure function of the text), and the pos-slice mean
  score must exceed the neg-slice mean (the training objective).

Corpus: sf documents replicated to the target count with doc_id
re-keyed (text repeats — the production case where near-identical
boilerplate dominates the feature stream and bucket counts are
heavy-hitter skewed; map-side combine is what absorbs it).

Usage: python scripts/rehearse_classifier.py [target_docs] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from table_ocr_spark.operators.importance import (
        apply_linear_model,
        train_quality_classifier,
    )
    from table_ocr_spark.session import get_spark

    spark = get_spark(
        "rehearse_classifier",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    reps = max(1, target // max(n, 1))
    corpus = (
        docs.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(reps - 1))))
        .select(
            (F.col("doc_id") * reps + F.col("r")).alias("doc_id"),
            F.col("doc_id").alias("base_id"),
            "text",
        )
        .repartition(64)
        .persist()
    )
    n_corpus = corpus.count()
    print(f"corpus: {n_corpus} docs ({n} base x {reps})")

    pos = corpus.filter(F.col("base_id") % 10 == 0)
    neg = corpus.filter(F.col("base_id") % 10 != 0)

    t0 = time.time()
    weights = train_quality_classifier(pos, neg).persist()
    n_w = weights.count()
    t_train = time.time() - t0
    assert n_w <= 10_000, n_w
    print(f"train: {t_train:.1f}s, weight rows: {n_w} (<= B: OK)")

    t0 = time.time()
    scored = apply_linear_model(corpus, weights).persist()
    n_scored = scored.count()
    t_score = time.time() - t0
    assert n_scored == n_corpus, (n_scored, n_corpus)
    rate = n_corpus / t_score
    print(f"score: {t_score:.1f}s = {rate:,.0f} docs/s")

    # closed-form: replicas of one base text share one exact score
    j = scored.join(
        corpus.select("doc_id", "base_id"), "doc_id"
    )
    distinct_per_base = (
        j.groupBy("base_id")
        .agg(F.count_distinct("quality_score").alias("k"))
        .agg(F.max("k"))
        .collect()[0][0]
    )
    assert distinct_per_base == 1, (
        f"replica scores diverged: {distinct_per_base} distinct per base"
    )
    means = (
        j.groupBy((F.col("base_id") % 10 == 0).alias("is_pos"))
        .agg(F.avg("quality_score").alias("m"))
        .collect()
    )
    m = {r["is_pos"]: r["m"] for r in means}
    assert m[True] > m[False], m
    print(
        f"asserts OK: replica-score-exactness, pos mean {m[True]:.4f} > "
        f"neg mean {m[False]:.4f}"
    )
    print(
        f"REHEARSAL_RESULT train={t_train:.1f}s score={t_score:.1f}s "
        f"rate={rate:,.0f}_docs/s weights={n_w}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
