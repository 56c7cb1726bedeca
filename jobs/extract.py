"""THE production extraction job (north rule deliverable):

  spark-submit --master <cluster> --py-files article_extraction_spark.zip \
      jobs/extract.py --input /path/transcripts --output /path/dest \
      [--n-buckets 4096] [--run-id r7] [--salt 0]

Reads the transcripts table (parquet directory here; Iceberg on a cluster
with the jars — identical plan), runs the convert_to_txt pipeline with
salted skew handling, checkpoints per bucket with lineage rows, and resumes
idempotently: re-running after a failure processes only missing buckets.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--num-partitions", type=int, default=None)
    args = ap.parse_args()

    import os

    builder = (
        SparkSession.builder.appName("extract-transcripts")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.python.worker.reuse", "true")
    )
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from article_extraction_spark.pipeline.checkpoint import input_snapshot_id, run_with_checkpoint

    transcripts = spark.read.parquet(args.input)
    snapshot = input_snapshot_id(spark, args.input)
    stats = run_with_checkpoint(
        spark,
        transcripts,
        args.output,
        n_buckets=args.n_buckets,
        run_id=args.run_id,
        input_snapshot=snapshot,
        salt=args.salt,
        num_partitions=args.num_partitions,
    )
    print(json.dumps({"input_snapshot": snapshot, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
