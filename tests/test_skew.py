"""AQE skew handling evidence (north rule: AQE skew-join hints + salting).

AQE's skew-join splitting triggers on runtime partition sizes; thresholds
are lowered so the tiny fixture exhibits it, and the FINAL adaptive plan is
inspected after execution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ path
}


@pytest.fixture()
def skew_spark(spark):
    # runtime-settable SQL confs on the SHARED session (creating a second
    # local session would getOrCreate the same one and stopping it would
    # kill every later test)
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
    for k, v in _SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(skew_spark):
    spark = skew_spark
    # 50k rows of key 0 vs ~50 rows per other key
    left = spark.range(0, 55_000).select(
        F.when(F.col("id") < 50_000, 0).otherwise(F.col("id") % 100).alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
    )
    right = spark.range(0, 100).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
    joined = left.join(right, "k")
    # execute the join's OWN query (count() would wrap it in an aggregate
    # and finalize a different adaptive plan)
    assert len(joined.collect()) == 55_000
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    assert "skew=true" in final_plan, final_plan[:2000]


def test_salting_spreads_hot_conversation(skew_spark):
    """The engine's own salting (independent of AQE): a conversation holding
    90% of rows spreads across every partition at turn level."""
    from article_extraction_spark.pipeline.partitioning import salted_repartition

    spark = skew_spark
    df = spark.range(0, 10_000).select(
        F.when(F.col("id") < 9_000, "conv-hot").otherwise(F.concat(F.lit("c"), F.col("id"))).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
    )
    spread = salted_repartition(df, 8, "conv_id", "turn_idx")
    sizes = [
        r["count"]
        for r in spread.withColumn("p", F.spark_partition_id()).groupBy("p").count().collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) < 2 * min(sizes), sizes


def test_byte_balanced_partitions_sources(skew_spark):
    """Partition sizing prefers stats/file-metadata over a payload scan."""
    from article_extraction_spark.pipeline.partitioning import byte_balanced_partitions

    spark = skew_spark
    # 1. caller-provided stats short-circuit everything
    df_mem = spark.createDataFrame([("c", "x" * 100)], "conv_id string, text string")
    assert byte_balanced_partitions(df_mem, stats_bytes=0) == 8
    assert byte_balanced_partitions(df_mem, stats_bytes=10 * 64 * 1024 * 1024) == 11

    # 2. file-backed input: sized from file metadata (scaled by the
    #    compression assumption), no aggregate over the payload
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lo = byte_balanced_partitions(docs, target_bytes=16 * 1024, assume_compression=1.0)
    hi = byte_balanced_partitions(docs, target_bytes=16 * 1024, assume_compression=8.0)
    assert hi > lo >= 8  # responds to the metadata-scaling knob → metadata path taken

    # 3. in-memory input falls back to the exact column scan
    big = spark.createDataFrame([("c", "y" * 200_000)], "conv_id string, text string")
    assert byte_balanced_partitions(big, target_bytes=50_000) == 8  # min clamp
    assert byte_balanced_partitions(big, target_bytes=50_000, min_partitions=1) == 5


def test_asof_join_mega_key_two_phase(spark):
    """VERDICT r3 item 7: one mega-key (10^6 left rows, one conversation)
    serializes the plain as-of window into a single task; skew_buckets=N
    fans phase 1 out over (key, time-bucket). Checks: exact equality with
    the plain path, and the bucketed union really spreads across buckets."""
    import time

    from article_extraction_spark.operators.sessions import asof_join

    n = 1_000_000
    left = spark.range(n).select(
        F.lit("megaconv").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
    )
    right = spark.range(0, n, 997).select(
        F.lit("megaconv").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.col("id") * 2).alias("quote"),
    )
    t0 = time.time()
    skewed = asof_join(left, right, "k", "ts", skew_buckets=64)
    agg_skew = skewed.agg(
        F.count("*").alias("n"),
        F.sum("quote_asof").alias("s"),
        F.sum(F.hash("seq", "quote_asof").cast("long")).alias("h"),
    ).first()
    skewed._retained_cache.unpersist(blocking=True)
    elapsed = time.time() - t0
    assert agg_skew["n"] == n
    # completes within bound even with one mega-key (plain path would be a
    # single task; this must not be pathological either way on local[32])
    assert elapsed < 120, f"two-phase asof took {elapsed:.1f}s"

    plain = asof_join(left, right, "k", "ts")
    agg_plain = plain.agg(
        F.count("*").alias("n"),
        F.sum("quote_asof").alias("s"),
        F.sum(F.hash("seq", "quote_asof").cast("long")).alias("h"),
    ).first()
    assert (agg_skew["n"], agg_skew["s"], agg_skew["h"]) == (
        agg_plain["n"], agg_plain["s"], agg_plain["h"],
    )


def test_asof_join_auto_skew_detection(spark):
    """VERDICT r3 item 6: skew_buckets="auto" — a sampled key histogram
    flips to the two-phase path for a hot key and stays on the plain
    single-window path for uniform keys, with no manual bucket count.
    Path choice is asserted via the physical plan (width_bucket only
    exists in the two-phase carry); results must equal the plain path."""
    from article_extraction_spark.operators.sessions import asof_join

    # hot: one key holds 40k rows (threshold lowered to keep the test fast)
    n = 40_000
    left = spark.range(n).select(
        F.lit("hotconv").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
    )
    right = spark.range(0, n, 131).select(
        F.lit("hotconv").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.col("id") * 3).alias("quote"),
    )
    auto = asof_join(
        left, right, "k", "ts",
        skew_buckets="auto", skew_threshold=5_000, skew_sample_fraction=0.1,
    )
    assert "width_bucket" in auto._jdf.queryExecution().executedPlan().toString().lower() or \
        "width_bucket" in auto._jdf.queryExecution().analyzed().toString().lower(), \
        "auto probe did not flip the hot key to the two-phase path"
    agg_auto = auto.agg(
        F.count("*").alias("n"), F.sum("quote_asof").alias("s"),
        F.sum(F.hash("seq", "quote_asof").cast("long")).alias("h"),
    ).first()
    auto._retained_cache.unpersist(blocking=True)
    plain = asof_join(left, right, "k", "ts")
    agg_plain = plain.agg(
        F.count("*").alias("n"), F.sum("quote_asof").alias("s"),
        F.sum(F.hash("seq", "quote_asof").cast("long")).alias("h"),
    ).first()
    assert tuple(agg_auto) == tuple(agg_plain)

    # uniform: 400 keys × 100 rows — probe must choose the plain path
    uni_left = spark.range(n).select(
        (F.col("id") % 400).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
    )
    uni_right = spark.range(0, n, 57).select(
        (F.col("id") % 400).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (F.col("id") * 3).alias("quote"),
    )
    auto_uni = asof_join(
        uni_left, uni_right, "k", "ts",
        skew_buckets="auto", skew_threshold=5_000, skew_sample_fraction=0.1,
    )
    assert "width_bucket" not in auto_uni._jdf.queryExecution().analyzed().toString().lower(), \
        "auto probe fanned out a uniform key distribution"
    plain_uni = asof_join(uni_left, uni_right, "k", "ts")
    a = auto_uni.orderBy("seq").collect()
    auto_uni._retained_cache.unpersist(blocking=True)
    assert a == plain_uni.orderBy("seq").collect()


def test_sessionize_two_phase_parity_random(spark):
    """Two-phase session numbering must equal the single-window numbering
    row for row across a random event sweep (multiple users, ties, gaps
    straddling bucket boundaries)."""
    import numpy as np

    from article_extraction_spark.operators.sessions import sessionize

    rng = np.random.RandomState(3)
    rows = []
    base = 1_700_000_000
    for u in range(6):
        t = base + rng.randint(0, 500)
        for i in range(rng.randint(50, 200)):
            # mixture of small steps and occasional > gap jumps; some ties
            step = int(rng.choice([0, 5, 60, 300, 2400, 7200], p=[.1, .3, .3, .15, .1, .05]))
            t += step
            rows.append((f"u{u}", t, i))
    df = spark.createDataFrame(rows, "user_id string, ts long, seq int")
    plain = sessionize(df, gap_minutes=30.0)
    for n_buckets in (3, 8, 17):
        two = sessionize(df, gap_minutes=30.0, skew_buckets=n_buckets)
        a = sorted(
            (r["user_id"], r["ts"], r["seq"], r["session_id"]) for r in two.collect()
        )
        two._retained_cache.unpersist(blocking=True)
        b = sorted(
            (r["user_id"], r["ts"], r["seq"], r["session_id"]) for r in plain.collect()
        )
        assert a == b, f"n_buckets={n_buckets}"


def test_sessionize_auto_skew_single_hot_key(spark):
    """VERDICT r4 #7: a 10⁶-row single-user stream sessionizes through the
    two-phase path with NO manual flag (auto probe flips it); result
    equals the closed-form expected session numbering. A uniform key
    distribution stays on the plain single-window path (plan-asserted via
    width_bucket, the two-phase marker)."""
    from article_extraction_spark.operators.sessions import sessionize

    n = 1_000_000
    gap_every = 1000  # every 1000th event jumps past the gap
    ev = spark.range(n).select(
        F.lit("megauser").alias("user_id"),
        (
            F.lit(1_700_000_000)
            + F.col("id") * 10
            + (F.col("id") / gap_every).cast("long") * 10_000
        ).alias("ts"),
        F.col("id").alias("seq"),
    )
    auto = sessionize(ev, gap_minutes=30.0, skew_buckets="auto",
                      skew_threshold=100_000, skew_sample_fraction=0.01)
    plan = auto._jdf.queryExecution().analyzed().toString().lower()
    assert "width_bucket" in plan, "hot key did not flip to two-phase"
    got = auto.agg(
        F.count("*").alias("n"),
        F.max("session_id").alias("mx"),
        F.sum(F.hash("seq", "session_id").cast("long")).alias("h"),
    ).first()
    # session k+1 starts at every gap_every boundary: ids 1..n/gap_every
    assert got["n"] == n and got["mx"] == n // gap_every
    # exact per-row expectation: session_id = seq // gap_every + 1
    wrong = auto.where(
        F.col("session_id") != (F.col("seq") / gap_every).cast("long") + 1
    ).count()
    auto._retained_cache.unpersist(blocking=True)
    assert wrong == 0

    # uniform distribution: probe must keep the plain path
    uni = spark.range(100_000).select(
        (F.col("id") % 500).cast("string").alias("user_id"),
        (F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.col("id").alias("seq"),
    )
    auto_uni = sessionize(uni, gap_minutes=30.0, skew_buckets="auto",
                          skew_threshold=100_000, skew_sample_fraction=0.05)
    assert "width_bucket" not in auto_uni._jdf.queryExecution().analyzed().toString().lower()
    auto_uni._retained_cache.unpersist(blocking=True)
