"""Measure total shuffle-write bytes for the token/gram exchange-key
choices (VERDICT r2 #2/#5 done-criteria): one fresh SparkSession per
shape, per-shape sum of shuffleWriteBytes over all completed stages via
the Spark REST API (the same recipe that recorded the 65x embedding-LSH
reduction in BASELINE.md). Shapes differ ONLY in the axis being
measured — the first version of this script compared the library call
(with its zero-token backfill) against a stripped inline shape and
mis-attributed the difference to the key encoding.

Recorded results (sf0.1, shuffled-join regime forced):
- unigram_logprob key encoding, head-to-head: raw tokens 1.09 MB vs
  xxhash64 1.18 MB — hashing short Zipfian tokens LOSES (lz4
  compresses them better than random 64-bit values). Shipping = raw.
- unigram_logprob zero-token backfill: left_anti join 2.14 MB vs
  map-side filter 1.13 MB — the anti-join doubled the query's total
  shuffle. Shipping = map-side filter.
- dup_span_stats key encoding: raw 5-gram strings 13.20 MB vs
  xxhash64 7.62 MB (1.73x) — long near-unique keys DO narrow under
  hashing. Shipping = hashed.

Auto-broadcast is DISABLED for the measurement: at toy SF the
vocabulary/count side fits under the broadcast threshold, so the raw
token strings never cross an exchange and every shape reads near-zero.
The key-encoding choice targets the crawl-scale regime where the build
side exceeds broadcast (billion-token vocabularies) and the stream
itself shuffles on the join key — forcing the shuffled join reproduces
that regime's exchange shape at measurable size. (Run with
MEASURE_BROADCAST=1 to see the default-config numbers too.)

Usage: python scripts/measure_shuffle.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

UI_PORT = 4311


def _session():
    from table_ocr_spark.session import get_spark

    return get_spark(
        "measure_shuffle",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.sql.files.maxPartitionBytes": "2m",
            **(
                {}
                if os.environ.get("MEASURE_BROADCAST") == "1"
                else {
                    "spark.sql.autoBroadcastJoinThreshold": "-1",
                    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
                }
            ),
        },
    )


def _shuffle_write_bytes(spark) -> int:
    # read the BOUND UI url, not the requested port: on a conflict
    # Spark silently rebinds to the next free port, and a hardcoded
    # port would then read another application's stages
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    url = f"{ui}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url) as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


# --- unigram_logprob shapes (mirror the library body; axes: key
# encoding, zero-token backfill strategy) ---------------------------

def unigram_shape(spark, sf_dir, hashed: bool, anti_join_backfill: bool):
    from table_ocr_spark.operators.textstats import tokens

    df = _docs(spark, sf_dir)
    ex = df.select(
        F.col("doc_id").alias("id"), F.explode(tokens(F.col("text"))).alias("tok")
    )
    if hashed:
        ex = ex.select("id", F.xxhash64("tok").alias("tok"))
    counts = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
    total = counts.agg(F.sum("_c").alias("_t"))
    out = (
        ex.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(-F.log(F.col("_c") / F.col("_t"))).alias("avg_neg_logprob"),
        )
    )
    if anti_join_backfill:
        empties = df.select(F.col("doc_id").alias("id")).join(
            out.select("id"), "id", "left_anti"
        ).select(
            "id",
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0.0).alias("avg_neg_logprob"),
        )
    else:
        empties = df.filter(F.size(tokens(F.col("text"))) == 0).select(
            F.col("doc_id").alias("id"),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0.0).alias("avg_neg_logprob"),
        )
    return out.unionByName(empties)


# --- dup_span_stats shapes (mirror the library body; axis: gram key
# encoding) ----------------------------------------------------------

def spans_shape(spark, sf_dir, hashed: bool):
    from pyspark.sql import Window

    from table_ocr_spark.operators.dedup import _gram_seq_udf
    from table_ocr_spark.operators.textstats import tokens

    k, min_count = 5, 2
    df = _docs(spark, sf_dir)
    sizes = df.select(
        F.col("doc_id").alias("id"),
        F.coalesce(F.size(tokens(F.col("text"))), F.lit(0))
        .cast("long").alias("n_tokens"),
    )
    ex = df.select(
        F.col("doc_id").alias("id"),
        F.posexplode(_gram_seq_udf(k)(tokens(F.col("text")))).alias("pos", "_g"),
    )
    gram = F.xxhash64("_g") if hashed else F.col("_g")
    ex = ex.select("id", "pos", gram.alias("gram"))
    hot = (
        ex.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("gram")
    )
    dup = ex.join(hot, "gram", "left_semi").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dup.withColumn(
        "_new",
        F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1)
        .otherwise(0),
    ).withColumn("_island", F.sum("_new").over(w))
    spans = marked.groupBy("id", "_island").agg(
        F.min("pos").alias("_s"), F.max(F.col("pos") + (k - 1)).alias("_e")
    )
    per_doc = spans.groupBy("id").agg(
        F.sum(F.col("_e") - F.col("_s") + 1).alias("n_dup_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return sizes.join(per_doc, "id", "left")


def ship_unigram(spark, sf_dir):
    from table_ocr_spark.operators.textstats import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


def ship_spans(spark, sf_dir):
    from table_ocr_spark.operators.dedup import duplicate_span_stats

    return duplicate_span_stats(_docs(spark, sf_dir))


SHAPES = [
    ("unigram raw-key filter-backfill [shipping shape]",
     lambda s, d: unigram_shape(s, d, hashed=False, anti_join_backfill=False)),
    ("unigram hashed-key filter-backfill",
     lambda s, d: unigram_shape(s, d, hashed=True, anti_join_backfill=False)),
    ("unigram raw-key ANTI-JOIN-backfill (round-2 shape)",
     lambda s, d: unigram_shape(s, d, hashed=False, anti_join_backfill=True)),
    ("unigram library call (must match shipping shape)", ship_unigram),
    ("spans hashed-key [shipping shape]",
     lambda s, d: spans_shape(s, d, hashed=True)),
    ("spans raw-key (round-2 shape)",
     lambda s, d: spans_shape(s, d, hashed=False)),
    ("spans library call (must match shipping shape)", ship_spans),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results = {}
    for name, fn in SHAPES:
        spark = _session()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[name] = _shuffle_write_bytes(spark)
        finally:
            spark.stop()
        print(f"{name}: {results[name] / 1e6:.2f} MB shuffle write")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
