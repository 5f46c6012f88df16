"""North-star single-call rehearsal (round-5 judge task #6): real
.warc.gz container bytes in → loader-ready packed shard sets out,
through ONE public call (`pipelines.crawl_to_shards`), timed end to
end with closed-form asserts and the per-stage audit counts.

The stages are individually rehearsed elsewhere (blocks A–R,
rehearse_tier_chain); the number this script pins is the missing
headline: container-bytes → shards in one composition, no
intermediate materialization between ingest and the corpus builder.

Corpus: the tier-chain realistic mix (90% salted-permutation unique /
8% exact replicas / 2% near-dups with one trailing novel token),
wrapped into per-record gzip members across 256 .warc.gz files — the
CC layout the ingest path consumes at file grain.

Usage: python scripts/rehearse_north_star.py [target_docs] [sf_dir]
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

    from table_ocr_spark.pipelines import crawl_to_shards
    from table_ocr_spark.sources.warc import warc_record_expr
    from table_ocr_spark.session import get_spark

    # local mode concentrates EVERY executor's storage in one JVM, so
    # heap must scale with the corpus here (a real cluster holds
    # data-per-executor constant by growing executors instead): at 4M
    # docs the default 8g heap hit storage-eviction thrash in the
    # near-dup→CC region and a Python worker crash. ~6 GB per 1M docs
    # of this mix keeps the persisted edge/label frames resident.
    if "SPARK_DRIVER_MEM" not in os.environ:
        os.environ["SPARK_DRIVER_MEM"] = f"{max(8, 6 * target // 1_000_000)}g"

    spark = get_spark(
        "rehearse_north_star",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    work = tempfile.mkdtemp(prefix="tos_north_")
    # TOS_CHECKPOINT_DIR=1 routes the CC iteration through the
    # RELIABLE checkpoint branch (persist + checkpoint(eager=False),
    # dedup._truncate_plan) — the cluster-deployment path that
    # survives executor loss — instead of the sandbox default
    # localCheckpoint. Set to a path to use that path verbatim.
    ckpt = os.environ.get("TOS_CHECKPOINT_DIR")
    if ckpt:
        ckpt_dir = ckpt if ckpt != "1" else os.path.join(work, "ckpt")
        spark.sparkContext.setCheckpointDir(ckpt_dir)
        print(f"reliable checkpoint dir: {ckpt_dir}")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        reps = max(1, target // max(n, 1))
        replicated = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(reps - 1)))
        ).withColumn(
            "doc_id", (F.col("doc_id") * reps + F.col("rep")).cast("long")
        )
        # the tier-chain mix (see rehearse_tier_chain.py for why the
        # per-(doc, word) salt is load-bearing at 1M docs)
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
        mixed = replicated.withColumn(
            "text",
            F.when(cls < 90, permuted)
            .when(cls < 98, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"), F.lit(" nd"),
                    F.col("doc_id").cast("string"),
                )
            ),
        )
        n_files = 256
        recs = mixed.select(
            (F.col("doc_id") % n_files).alias("g"),
            warc_record_expr(
                F.concat(
                    F.lit("https://north.example/"),
                    F.col("doc_id").cast("string"),
                ),
                F.lit("2026-01-01T00:00:00Z"),
                F.concat(
                    F.lit("<article><p>"), F.col("text"),
                    F.lit("</p></article>"),
                ),
            ).alias("rec"),
        )

        from pyspark.sql import types as T

        warc_dir = os.path.join(work, "warc")
        os.makedirs(warc_dir)

        def writer(batches):
            import gzip as _gz

            import pandas as _pd

            bufs: dict = {}
            counts: dict = {}
            for pdf in batches:
                for g, grp in pdf.groupby("g"):
                    buf = bufs.setdefault(int(g), [])
                    for rec in grp["rec"]:
                        buf.append(
                            _gz.compress(rec.encode("utf-8"), mtime=0)
                        )
                    counts[int(g)] = counts.get(int(g), 0) + len(grp)
            rows = []
            for g, buf in bufs.items():
                path = os.path.join(warc_dir, f"part-{g:05d}.warc.gz")
                with open(path, "wb") as f:
                    f.write(b"".join(buf))
                rows.append((path, counts[g]))
            if rows:
                yield _pd.DataFrame(rows, columns=["path", "n"])

        t0 = time.perf_counter()
        built = (
            recs.repartition(n_files, "g")
            .mapInPandas(writer, T.StructType([
                T.StructField("path", T.StringType()),
                T.StructField("n", T.LongType()),
            ]))
            .groupBy()
            .agg(F.sum("n").alias("n"), F.count("*").alias("files"))
            .collect()[0]
        )
        t_build = time.perf_counter() - t0
        n_total = int(built.n)
        total_bytes = sum(
            os.path.getsize(os.path.join(warc_dir, p))
            for p in os.listdir(warc_dir)
        )
        print(
            f"built {built.files} .warc.gz files, {n_total} records, "
            f"{total_bytes / 1e6:.0f} MB in {t_build:.1f} s"
        )

        # ---------------- THE single call: container bytes -> shards
        out = os.path.join(work, "tiered")
        t0 = time.perf_counter()
        rep = crawl_to_shards(
            spark,
            warc_dir + "/*.warc.gz",
            out,
            n_tiers=4,
            token_budget=10 * target,
        )
        t_chain = time.perf_counter() - t0
        c = rep["corpus"]
        n_shard_docs = sum(t["n_docs"] for t in rep["tiers"].values())
        print(
            f"crawl_to_shards: {t_chain:.1f} s end to end "
            f"({n_total / t_chain:,.0f} container docs/s) -> "
            f"{n_shard_docs} docs in {len(rep['tiers'])} tiers; "
            f"stages: {c}"
        )

        # closed-form asserts (the tier-chain mix contract)
        assert c.n_input == n_total, (c.n_input, n_total)
        assert c.n_extracted == n_total, c
        assert 0.88 * n_total < c.n_after_exact_dedup < 0.94 * n_total, c
        assert c.n_after_near_dedup < c.n_after_exact_dedup, c
        assert 0 < c.n_after_budget < c.n_after_near_dedup, c
        assert n_shard_docs == c.n_after_budget
        assert set(rep["tiers"]) == set(range(4)), rep["tiers"]
        # shard files really exist under shards/tier=K/
        import glob as _g

        files = _g.glob(f"{out}/shards/tier=*/**/*.parquet", recursive=True)
        assert files, "no shard parquet written"
        print(
            f"REHEARSAL_RESULT build={t_build:.1f}s chain={t_chain:.1f}s "
            f"rate={n_total / t_chain:,.0f}_docs/s "
            f"shard_docs={n_shard_docs} tiers={len(rep['tiers'])} "
            f"shard_files={len(files)}"
        )
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
