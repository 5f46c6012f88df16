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

    # ---- multiclass lang-id leg -----------------------------------
    # Same corpus with PLANTED language classes: class = base_id % 3,
    # marked by a class-specific token run appended to the text (one
    # distinct marker bigram per class, bucket-verified disjoint
    # below). NB must recover the planted label: the marker bigram is
    # frequent inside its class and UNSEEN in the others, so its
    # log-prob vs the unseen default dominates any shared-vocab noise
    # — a closed-form expectation that holds at any corpus size.
    from table_ocr_spark.operators.importance import (
        apply_langid_model,
        train_langid_classifier,
    )

    markers = {0: "zqa", 1: "xqb", 2: "wqc"}
    langs = {0: "aa", 1: "bb", 2: "cc"}
    # marker bigram buckets must be pairwise distinct or the classes
    # alias (pinned hash: ((31*len + 7*first + last) * K) % 2^32 % B)
    bks = {
        ((7 * 31 + 7 * ord(t[0]) + ord(t[-1])) * 2654435761 % (1 << 32))
        % 10_000
        for t in markers.values()
    }
    assert len(bks) == 3, f"marker buckets collided: {bks}"

    lang_expr = (
        F.when(F.col("base_id") % 3 == 0, F.lit(langs[0]))
        .when(F.col("base_id") % 3 == 1, F.lit(langs[1]))
        .otherwise(F.lit(langs[2]))
    )
    mark_expr = (
        F.when(F.col("base_id") % 3 == 0, F.lit(f" {markers[0]} {markers[0]} {markers[0]} {markers[0]}"))
        .when(F.col("base_id") % 3 == 1, F.lit(f" {markers[1]} {markers[1]} {markers[1]} {markers[1]}"))
        .otherwise(F.lit(f" {markers[2]} {markers[2]} {markers[2]} {markers[2]}"))
    )
    lcorpus = corpus.select(
        "doc_id",
        "base_id",
        F.concat(F.col("text"), mark_expr).alias("text"),
        lang_expr.alias("lang"),
    ).persist()
    lcorpus.count()

    t0 = time.time()
    lmodel = train_langid_classifier(
        lcorpus.filter(F.col("base_id") % 10 < 8)
    ).persist()
    n_lm = lmodel.count()
    t_ltrain = time.time() - t0
    assert n_lm <= 10_000 * 3 + 2 * 3, n_lm  # <= B*C + 2C by construction
    print(f"langid train: {t_ltrain:.1f}s, model rows: {n_lm} (<= BxC+2C: OK)")

    t0 = time.time()
    lpred = apply_langid_model(lcorpus, lmodel).persist()
    n_lp = lpred.count()
    t_lscore = time.time() - t0
    assert n_lp == n_corpus, (n_lp, n_corpus)
    lrate = n_corpus / t_lscore
    print(f"langid score: {t_lscore:.1f}s = {lrate:,.0f} docs/s")

    lj = lpred.join(lcorpus.select("doc_id", "base_id", "lang"), "doc_id")
    # replicas of one base text must predict identically (pure text fn)
    ldistinct = (
        lj.groupBy("base_id")
        .agg(
            F.count_distinct("lang_pred").alias("kp"),
            F.count_distinct("lang_logprob").alias("ks"),
        )
        .agg(F.max("kp").alias("mp"), F.max("ks").alias("ms"))
        .collect()[0]
    )
    assert ldistinct["mp"] == 1 and ldistinct["ms"] == 1, dict(ldistinct.asDict())
    acc_row = lj.agg(
        F.avg((F.col("lang_pred") == F.col("lang")).cast("double")).alias("a")
    ).collect()[0]
    acc = acc_row["a"]
    assert acc >= 0.99, f"planted-label recovery accuracy {acc}"
    print(f"langid asserts OK: replica-exactness, planted accuracy {acc:.4f}")
    print(
        f"REHEARSAL_RESULT_LANGID train={t_ltrain:.1f}s "
        f"score={t_lscore:.1f}s rate={lrate:,.0f}_docs/s "
        f"model_rows={n_lm} accuracy={acc:.4f}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
