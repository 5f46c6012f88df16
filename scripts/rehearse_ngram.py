"""1M-doc rehearsal of the stupid-backoff trigram LM
(textstats.ngram_logprob) and the corpus data card
(report.corpus_report), with closed-form spot asserts.

Corpus: 1M synthetic documents over a pinned 1,000-word vocabulary —
~40 tokens each, drawn by a deterministic integer mix (no RNG state),
with an 8% replica class (doc copies a base doc's text verbatim).
Closed-form checks:

  - REPLICA EXACTNESS: the LM score is a pure function of the text,
    so every replica must score identically to its base (joined and
    asserted exactly, like the classifier rehearsals).
  - min_count=1 never backs off (self-scoring makes every count >= 1):
    asserted backoff_frac == 0.0 for ALL docs on a 50k slice run.
  - the card's corpus.docs/tokens rows equal independent Spark counts.

Reports wall time and docs/s for the trigram pass (gram-key joins +
the two lag windows — the corpus-statistic-join family's cost shape)
and for the card's four aggregates, each with the in-band host probe.

Usage: python scripts/rehearse_ngram.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

REPLICA_MOD = 12  # ~8% of docs are replicas of base doc (id - id%MOD)
DOC_TOKENS = 40
VOCAB = 1_000


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from bench import probe_effective_cores
    from table_ocr_spark.operators.report import corpus_report
    from table_ocr_spark.operators.textstats import ngram_logprob
    from table_ocr_spark.session import get_spark

    spark = get_spark(
        "rehearse_ngram",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )

    def gen(batches):  # executor-side deterministic generation
        import numpy as np
        import pandas as pd

        def mix(z):
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return z ^ (z >> np.uint64(31))

        j = np.arange(DOC_TOKENS, dtype=np.uint64).reshape(1, -1)
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            # replica class: id % MOD == 1 copies id - 1's text
            src = np.where(ids % REPLICA_MOD == 1, ids - 1, ids)
            z = mix(
                src.astype(np.uint64).reshape(-1, 1) * np.uint64(DOC_TOKENS)
                + j
                + np.uint64(0x9E3779B97F4A7C15)
            )
            words = (z % np.uint64(VOCAB)).astype(np.int64)
            texts = [" ".join(f"w{w}" for w in row) for row in words]
            langs = np.where(ids % 3 == 0, "en", "de")
            yield pd.DataFrame(
                {"doc_id": ids, "text": texts, "lang": langs}
            )

    docs = (
        spark.range(n).repartition(64).mapInPandas(gen, schema=schema)
    ).cache()
    total = docs.count()
    assert total == n

    # ---- trigram LM at scale
    t0 = time.time()
    scored = ngram_logprob(docs, n=3, min_count=2).cache()
    n_scored = scored.count()
    t_lm = time.time() - t0
    assert n_scored == n
    print(f"[probe {probe_effective_cores():.1f}/32] trigram_logprob "
          f"{t_lm:.1f} s over {total:,} docs ({total / t_lm:,.0f} docs/s)")

    # replica exactness: id%MOD==1 copies id-1's text verbatim
    reps = scored.filter(F.col("doc_id") % REPLICA_MOD == 1).select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("avg_neg_logprob").alias("rep_score"),
        F.col("backoff_frac").alias("rep_bo"),
    )
    bad = (
        scored.join(reps, "doc_id")
        .filter(
            (F.col("avg_neg_logprob") != F.col("rep_score"))
            | (F.col("backoff_frac") != F.col("rep_bo"))
        )
        .count()
    )
    assert bad == 0, f"{bad} replicas scored differently from their base"
    n_reps = n // REPLICA_MOD + (1 if n % REPLICA_MOD > 1 else 0)
    print(f"  replica exactness: all ~{n_reps:,} replica/base pairs "
          "score identically")

    # min_count=1 never backs off (50k slice — the property is per-doc)
    slice_ = docs.filter(F.col("doc_id") < 50_000)
    nb = (
        ngram_logprob(slice_, n=3, min_count=1)
        .filter(F.col("backoff_frac") != 0.0)
        .count()
    )
    assert nb == 0, f"{nb} docs backed off at min_count=1"
    print("  min_count=1: zero backoffs on the 50k slice")

    # ---- the data card at scale
    t0 = time.time()
    card = {
        (r["section"], r["key"]): (r["n"], r["value"])
        for r in corpus_report(docs).collect()
    }
    t_card = time.time() - t0
    assert card[("corpus", "docs")][0] == n
    assert card[("corpus", "tokens")][0] == n * DOC_TOKENS
    assert card[("corpus", "empty_docs")][0] == 0
    assert abs(card[("lang", "en")][1] - 1 / 3) < 0.01
    print(f"[probe {probe_effective_cores():.1f}/32] corpus_report "
          f"{t_card:.1f} s over {total:,} docs "
          f"({total / t_card:,.0f} docs/s); docs/tokens/lang rows "
          "closed-form exact")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
