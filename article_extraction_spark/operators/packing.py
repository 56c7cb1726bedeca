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


def length_bucketed_batches(
    df: DataFrame,
    len_col: str,
    batch_token_budget: int,
    order_col: str | None = None,
    bucket: str = "pow2",
) -> DataFrame:
    """Padding-aware INFERENCE batching (round 5) — the serving-side
    complement of concat_chunk_plan's training packing: sequences are
    bucketed by length, and each bucket is cut into batches of
    ``floor(budget / bucket_cap)`` rows, so a batch's padded cost
    (rows × its bucket cap) never exceeds the token budget. Bucketing by
    powers of two (``"pow2"``, the dynamic-batching default of serving
    stacks) bounds per-row padding waste below 2× while keeping the
    assignment DETERMINISTIC and fully relational: one row_number per
    bucket, integer division — no global greedy scan, no driver loop.

    Returns the input plus (bucket_cap, batch_id, slot, padded_len):
    ``batch_id`` is globally unique (bucket_cap folded in), ``slot`` the
    row's position inside its batch, ``padded_len`` = bucket_cap (what
    the row will cost after padding). Rows longer than the budget raise
    — a silent oversize row would OOM the serving batch. ``order_col``
    fixes the within-bucket order (default: the length column then the
    row's natural columns are NOT enough — pass a unique key for full
    determinism)."""
    if batch_token_budget < 1:
        raise ValueError(f"batch_token_budget must be >= 1, got {batch_token_budget}")
    if bucket != "pow2":
        raise ValueError(f"only bucket='pow2' is implemented, got {bucket!r}")
    # F.shiftleft only takes a literal bit count — express the next
    # power of two in SQL (exact integer arithmetic, no double rounding
    # beyond log2's, which ceil() absorbs for all realistic lengths).
    # ADVICE r5: backtick-quote the identifier so column names with
    # spaces/hyphens/dots parse (backticks inside the name double-escape).
    quoted = "`" + len_col.replace("`", "``") + "`"
    cap = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST(ceil(log2(CAST(greatest({quoted}, 1) AS DOUBLE))) AS INT))"
    )
    # the oversize/NULL guard lives INSIDE bucket_cap, which every
    # derived column reads, so Catalyst cannot prune it away (the r4
    # ADVICE lesson: a projected-then-dropped assert column is a no-op)
    # — a sequence longer than the budget OR of unknown length fails the
    # job instead of silently producing a batch that would OOM the
    # server (review r5: greatest(NULL, 1) used to file NULL lengths
    # into the cap-1 bucket, the exact under-allocation the guard
    # exists to prevent)
    # backtick-quoted references resolve the EXACT name; bare F.col (and
    # even df[...] in Spark 4.1) parse dots as struct field access on
    # these user-supplied identifiers (same ADVICE item)
    len_c = F.col(quoted)
    cap = F.when(
        len_c.isNotNull() & (cap <= batch_token_budget), cap
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"sequence length NULL or longer than batch_token_budget="
                    f"{batch_token_budget}: len="
                ),
                F.coalesce(len_c.cast("string"), F.lit("NULL")),
            )
        ).cast("long")
    )
    out = df.withColumn("bucket_cap", cap)
    rows_per_batch = (F.lit(int(batch_token_budget)) / F.col("bucket_cap")).cast("long")
    order = (
        [F.col("`" + order_col.replace("`", "``") + "`")] if order_col else [len_c]
    )
    w = Window.partitionBy("bucket_cap").orderBy(*order)
    return (
        out.withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn(
            "batch_id",
            F.concat_ws("_", F.col("bucket_cap"), (F.col("__rn") / rows_per_batch).cast("long")),
        )
        .withColumn("slot", F.col("__rn") % rows_per_batch)
        .withColumn("padded_len", F.col("bucket_cap"))
        .drop("__rn")
    )
