"""Sequence packing for LLM pretraining: concat-and-chunk block planning.

The standard GPT-style data layout lays documents end-to-end in a
deterministic order and cuts the stream into fixed ``block_tokens`` blocks
(documents straddle block boundaries). This operator emits the PLAN — one
row per (document × block) span with both offsets — so a downstream
tokenizer/writer can materialize blocks without ever holding the global
stream.

Scale shape: the only global computation is an exclusive prefix-sum of
token counts over the document order. A global window would serialize into
one task, so it uses the same two-phase prefix-sum as
aggregates.cumulative_mean_distributed: range-partition on the order key,
collect ONE (sum) row per partition (N rows at any data scale), broadcast
the per-partition offsets back, and window only WITHIN partitions — every
partition runs in parallel. The block fan-out is a native
sequence()+explode (a doc spanning k blocks emits k rows), so the result
stays JVM-side end-to-end: no Python, no shuffle beyond the range
partitioning.
"""

from __future__ import annotations

import itertools

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concat_chunk_plan(
    df: DataFrame,
    token_count_col: str,
    block_tokens: int,
    order_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Plan rows: (<df columns minus token count>, block_id, doc_offset,
    block_offset, n_tokens) — the sub-span of each document that lands in
    each block.

    Invariants (tested): per-block spans sum to exactly ``block_tokens``
    (except the final partial block); per-doc spans sum to the doc's token
    count; offsets tile both the doc and the block gaplessly. Zero-token
    documents emit no rows. Ties in ``order_col`` would make the layout
    nondeterministic — use a unique key.

    The returned DataFrame carries the range-partitioned input cache in
    ``_retained_cache`` (phase 2 reads it after phase 1's collect);
    ``.unpersist()`` it after consuming the result.
    """
    if block_tokens <= 0:
        raise ValueError("block_tokens must be positive")
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(n, F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    totals = sorted(
        part.groupBy("_pid").agg(F.sum(token_count_col).alias("s")).collect(),
        key=lambda r: r["_pid"],
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[r["_pid"]] = acc
        acc += int(r["s"] or 0)
    off_map = F.create_map(
        *itertools.chain.from_iterable(
            (F.lit(k), F.lit(v)) for k, v in offsets.items()
        )
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.col(token_count_col).cast("long")
    start = (
        F.coalesce(F.sum(token_count_col).over(w), F.lit(0)).cast("long")
        + off_map[F.col("_pid")]
    )
    planned = part.select(
        *[c for c in df.columns if c != token_count_col],
        cnt.alias("_cnt"),
        start.alias("_start"),
    ).where(F.col("_cnt") > 0)
    b = F.lit(int(block_tokens))
    exploded = planned.select(
        "*",
        F.explode(
            F.sequence(
                (F.col("_start") / b).cast("long"),
                ((F.col("_start") + F.col("_cnt") - 1) / b).cast("long"),
            )
        ).alias("block_id"),
    )
    span_start = F.greatest(F.lit(0), F.col("block_id") * b - F.col("_start"))
    span_end = F.least(F.col("_cnt"), (F.col("block_id") + 1) * b - F.col("_start"))
    out = exploded.select(
        *[c for c in df.columns if c != token_count_col],
        "block_id",
        span_start.alias("doc_offset"),
        F.greatest(F.lit(0), F.col("_start") - F.col("block_id") * b).alias("block_offset"),
        (span_end - span_start).alias("n_tokens"),
    )
    out._retained_cache = part  # type: ignore[attr-defined]
    return out
