"""Custom PySpark DataSource (Spark 4 public python data source API):
batch partition planning + executor-side deterministic generation +
filter pushdown, and the streaming twin's checkpointed offset resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def registered(spark):
    from article_extraction_spark.sources.transcript_source import (
        SyntheticTranscriptsDataSource,
    )

    spark.dataSource.register(SyntheticTranscriptsDataSource)
    yield spark


def test_batch_read_partitions_and_determinism(registered):
    spark = registered
    df = (
        spark.read.format("synthetic_transcripts")
        .option("n_convs", 50).option("turns_per_conv", 4)
        .option("num_partitions", 8).load()
    )
    assert df.count() == 200
    assert df.select(F.spark_partition_id()).distinct().count() == 8
    # rows are seeded per conversation — identical to the pure generator
    from article_extraction_spark.sources.transcript_source import _conv_rows

    row = df.where(
        (F.col("conv_id") == "conv-000007") & (F.col("turn_idx") == 2)
    ).collect()[0]
    exp = [r for r in _conv_rows(7, 4, 42) if r[1] == 2][0]
    assert (row["text"], row["ts"], row["role"]) == (exp[3], exp[5], exp[2])
    # a different num_partitions yields the SAME rows (partition-invariant)
    df2 = (
        spark.read.format("synthetic_transcripts")
        .option("n_convs", 50).option("turns_per_conv", 4)
        .option("num_partitions", 3).load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, df2.collect()))


def test_option_based_source_pruning(registered):
    """Generation-time pruning via explicit options (the module docstring
    explains why this is options, not pushFilters: Spark 4.1 reuses the
    relation's reader across queries, so pushed-filter state silently
    constrains later unfiltered queries on the same DataFrame)."""
    spark = registered
    pruned = (
        spark.read.format("synthetic_transcripts")
        .option("n_convs", 40).option("turns_per_conv", 6)
        .option("turn_min", 2).option("turn_max", 3).load()
    )
    assert pruned.count() == 80
    assert pruned.agg(F.min("turn_idx"), F.max("turn_idx")).first() == (2, 3)
    one = (
        spark.read.format("synthetic_transcripts")
        .option("n_convs", 40).option("turns_per_conv", 6)
        .option("conv_id", "conv-000003").load()
    )
    assert one.count() == 6
    assert one.select("conv_id").distinct().first()[0] == "conv-000003"
    # and a reused unpruned frame is never contaminated by other reads
    base = (
        spark.read.format("synthetic_transcripts")
        .option("n_convs", 40).option("turns_per_conv", 6).load()
    )
    assert base.count() == 240
    assert base.where(F.col("turn_idx") == 0).count() == 40
    assert base.count() == 240  # unchanged after a filtered query


def test_stream_reader_offset_resume(registered, tmp_path):
    """availableNow drains one micro-batch per run; the checkpointed
    offset resumes exactly — four runs cover all 30 conversations with
    no overlap, and a fifth adds nothing."""
    spark = registered
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("synthetic_transcripts")
            .option("n_convs", 30).option("turns_per_conv", 2)
            .option("convs_per_batch", 10).load()
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    counts = [run_once().count() for _ in range(5)]
    assert counts == [20, 40, 60, 60, 60], counts
    final = spark.read.parquet(out)
    assert final.select("conv_id").distinct().count() == 30
    # exactly-once: no (conv, turn) emitted twice across the five runs
    assert final.count() == final.select("conv_id", "turn_idx").distinct().count()


def test_empty_source_reads_zero_rows(registered):
    """review r4: n_convs=0 must plan an empty scan, not crash in
    range() during partition planning."""
    spark = registered
    df = (
        spark.read.format("synthetic_transcripts")
        .option("n_convs", 0).load()
    )
    assert df.count() == 0
