"""Event-stream operators: gap sessionization and as-of join.

Classic OLAP patterns absent from the reference but core to transcript/event
processing at scale. Both are pure window compositions — no UDF, one shuffle
on the entity key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same user exceeds the gap. session_id is the
    running count of boundaries per user (lag + conditional cumsum)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    gap_s = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)
    boundary = F.when(prev_ts.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("_b", boundary).withColumn(
        session_col, F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("_b")


def session_stats(sessions: DataFrame, user_col: str = "user_id", session_col: str = "session_id") -> DataFrame:
    return sessions.groupBy(user_col, session_col).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum("value").alias("session_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, the latest right row of the same key
    with right.ts <= left.ts.

    Spark lacks a native ASOF JOIN; the scalable formulation is the
    union-tag trick: tag both streams, sort per key by (ts, tag), and carry
    the last-seen right values forward with last(ignoreNulls) — ONE shuffle
    on the key, no range explosion, skew handled by AQE. (The
    applyInPandas/merge_asof alternative ships whole groups to Python.)
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    lcols = [c for c in left.columns]
    # Carry ONE struct of all right value columns per right row, not one
    # last() per column: per-column last(ignorenulls) would skip a matched
    # right row whose value is genuinely NULL and resurrect a stale earlier
    # value. The struct itself is non-null for every right row, so
    # last(struct, ignorenulls) always lands on the latest right ROW and its
    # NULL fields survive the projection.
    tagged_right = right.select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c) for c in right_value_cols]).alias("_r"),
    )
    tagged_left = left.select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(tagged_right.schema["_r"].dataType).alias("_r"),
    )
    tagged_right = tagged_right.withColumn(
        "_l", F.lit(None).cast(tagged_left.schema["_l"].dataType)
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort BEFORE left rows at equal ts (tag 0 < 1) → ties match
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_rlast")
    )
    return carried.where(F.col("_is_left") == 1).select(
        "_l.*",
        *[F.col(f"_rlast.{c}").alias(f"{c}{suffix}") for c in right_value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval join: left rows whose ``ts`` falls in [start, end] of a right
    interval (inclusive).

    The naive formulation is a cross join + filter — |L|×|R| at any scale.
    Scale-safe shape: quantize time into fixed buckets, explode each right
    interval into the buckets it spans, equi-join on the bucket, then apply
    the exact range predicate. Each matched (l, r) pair meets EXACTLY once
    (a left row has one bucket; the right side lists each of its buckets
    once), so no dedup pass is needed. Cost scales with
    |L| + Σ interval_length/bucket — pick bucket_seconds near the typical
    interval length; AQE handles residual bucket skew."""
    if "_rj_bk" in left.columns or "_rj_bk" in right.columns:
        raise ValueError("range_join reserves the column name '_rj_bk'")
    secs = F.lit(bucket_seconds)
    # aliased sides: the range predicate must resolve unambiguously even
    # when left and right share column names (e.g. both carry a 'ts')
    lb = left.withColumn("_rj_bk", F.floor(F.unix_timestamp(F.col(ts_col)) / secs)).alias("_rj_l")
    rb = right.withColumn(
        "_rj_bk",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / secs),
                F.floor(F.unix_timestamp(F.col(end_col)) / secs),
            )
        ),
    ).alias("_rj_r")
    return (
        lb.join(rb, F.col("_rj_l._rj_bk") == F.col("_rj_r._rj_bk"))
        .where(
            (F.col(f"_rj_l.{ts_col}") >= F.col(f"_rj_r.{start_col}"))
            & (F.col(f"_rj_l.{ts_col}") <= F.col(f"_rj_r.{end_col}"))
        )
        .drop("_rj_bk")
    )
