"""1M-doc rehearsal for the BPE tokenizer swap-in
(operators/bpe.train_bpe + bpe_token_count + pack_sequences weight
integration).

Claims to rehearse:
- training's only distributed work is the bounded top-N sample scan
  (TakeOrderedAndProject) — wall time must be dominated by the
  driver-side merge loop and INDEPENDENT of corpus size;
- counting is a map-only Arrow kernel with ZERO exchange, so
  throughput is pure CPU and the per-worker word cache must make the
  replicated corpus (the production boilerplate case) run at cache
  speed: every replica of a base text re-uses the distinct-word
  encodings;
- correctness holds closed-form at scale: replicas of one base text
  get EXACTLY the same token count (pure text function), every count
  is >= the whitespace word count (merges only join within words,
  and each word carries an EOW symbol), and the BPE weights drive
  pack_sequences to a total equal to sum(n_bpe_tokens) — the
  swap-in contract.

Usage: python scripts/rehearse_bpe.py [target_docs] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from table_ocr_spark.operators.bpe import bpe_token_count, train_bpe
    from table_ocr_spark.operators.packing import pack_sequences
    from table_ocr_spark.operators.textstats import tokens
    from table_ocr_spark.session import get_spark

    spark = get_spark(
        "rehearse_bpe",
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

    t0 = time.time()
    merges = train_bpe(corpus, n_merges=512, sample_docs=20_000)
    t_train = time.time() - t0
    # the synthetic corpus has a small closed vocabulary, so training
    # legitimately exhausts (every sampled word fully merged) before
    # 512 merges; on real web text it runs to the requested count
    assert 0 < len(merges) <= 512, len(merges)
    print(
        f"train: {t_train:.1f}s, {len(merges)} merges learned on a "
        f"20k-doc sample (early stop = sample vocabulary exhausted)"
    )

    t0 = time.time()
    counted = bpe_token_count(corpus, merges).persist()
    n_counted = counted.count()
    t_count = time.time() - t0
    assert n_counted == n_corpus
    rate = n_corpus / t_count
    print(f"count: {t_count:.1f}s = {rate:,.0f} docs/s (map-only, no exchange)")

    # closed-form: replica-count exactness + per-doc lower bound
    bad = (
        counted.groupBy("base_id")
        .agg(F.count_distinct("n_bpe_tokens").alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    assert bad == 0, f"{bad} base texts with diverging replica counts"
    under = counted.filter(
        F.col("n_bpe_tokens") < F.size(tokens(F.col("text")))
    ).count()
    assert under == 0, f"{under} docs counted below their word count"

    # swap-in contract: BPE weights drive packing; conservation holds
    t0 = time.time()
    packed = pack_sequences(
        counted, capacity=2048, weight_col="n_bpe_tokens"
    ).persist()
    total_packed = packed.agg(
        F.sum("n_tokens").alias("s"), F.max(
            F.col("start_offset") + F.col("n_tokens")
        ).alias("end")
    ).collect()[0]
    t_pack = time.time() - t0
    total_counted = counted.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert total_packed["s"] == total_counted == total_packed["end"]
    print(
        f"pack: {t_pack:.1f}s; token conservation OK "
        f"({total_counted:,} BPE tokens through pack_sequences)"
    )
    print(
        f"REHEARSAL_RESULT train={t_train:.1f}s count={t_count:.1f}s "
        f"rate={rate:,.0f}_docs/s pack={t_pack:.1f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
