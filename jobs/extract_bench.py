"""spark-submit job: time the full extraction stage at a given parallelism.

Deployment contract (north rule): runs via
  spark-submit --master local[N] --py-files article_extraction_spark.zip \
      jobs/extract_bench.py --sf-dir /root/testdata/sf0.1 --reps 40

Prints one JSON line {"master", "turns", "seconds", "turns_per_sec"}.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--iterations", type=int, default=3)
    args = ap.parse_args()

    import os

    builder = (
        SparkSession.builder.appName("extract-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
    )
    if os.path.isdir("/dev/shm"):
        # disk-backed shuffle contends under many local threads; tmpfs local
        # dirs are the local-mode analog of cluster NVMe shuffle volumes
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    master = spark.sparkContext.master
    cores = spark.sparkContext.defaultParallelism
    if args.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    else:
        spark.conf.set("spark.sql.shuffle.partitions", str(cores))

    # imports resolve from --py-files on every worker
    from article_extraction_spark.fixtures.synth import amplified_transcripts
    from article_extraction_spark.pipeline import convert_transcripts

    # materialize the corpus as compressed parquet (the production input
    # shape — columnar scan, not an uncompressed in-memory cache whose
    # bandwidth-bound reads would dominate the timed span)
    corpus_path = f"/dev/shm/bench_corpus_{args.reps}.parquet"
    import os as _os

    if not _os.path.exists(corpus_path):
        # fixed file count so the scan parallelism is independent of the
        # master that happened to materialize the corpus
        amplified_transcripts(spark, args.sf_dir, reps=args.reps).repartition(64).write.mode(
            "overwrite"
        ).parquet(corpus_path)
    transcripts = spark.read.parquet(corpus_path)
    n = transcripts.count()

    # warm the python workers (imports of pandas/pyarrow/the engine zip)
    # outside the timed span — we measure steady-state throughput
    from pyspark.sql import functions as F

    from article_extraction_spark.extract.udfs import to_text_udf

    spark.range(cores * 2).select(
        to_text_udf(F.lit("html"), F.lit("<p>warm</p>")).alias("r")
    ).write.format("noop").mode("overwrite").save()

    # repeat and take the best run: the sandbox is a shared host with
    # fluctuating capacity; min is the standard noise-robust estimator
    times = []
    for _ in range(args.iterations):
        t0 = time.perf_counter()
        convert_transcripts(transcripts, num_partitions=cores * 2).write.format("noop").mode(
            "overwrite"
        ).save()
        times.append(time.perf_counter() - t0)
    dt = min(times)

    print(
        json.dumps(
            {
                "master": master,
                "turns": n,
                "seconds": round(dt, 3),
                "turns_per_sec": round(n / dt, 1),
                "all_seconds": [round(x, 3) for x in times],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
