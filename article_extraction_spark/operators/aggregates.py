"""Aggregation operators A1-A8 as reusable plan builders.

Each helper returns a lazily-composed DataFrame; Catalyst handles partial
(map-side) aggregation and AQE sizes the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(df: DataFrame, group: str, order: str) -> DataFrame:
    """A1: last-per-group (latest ``order`` per ``group``) — reference
    country_table.py:61-74 (groupby-idxmax). max_by over a struct keeps the
    whole row with ONE shuffle (no window + second pass)."""
    cols = [c for c in df.columns]
    return (
        df.groupBy(group)
        .agg(F.max_by(F.struct(*[F.col(c) for c in cols if c != group]), F.col(order)).alias("_s"))
        .select(group, "_s.*")
    )


def descriptive_stats(df: DataFrame, value: str) -> DataFrame:
    """A4: count/mean/median/stddev(pop)/min/max + p90/p95 (reference
    scores.py:35-44; diagnosis/nb_token_papers.py:63-74)."""
    c = F.col(value)
    return df.agg(
        F.count(c).alias("n"),
        F.avg(c).alias("mean"),
        F.median(c).alias("median"),
        F.stddev_pop(c).alias("std_pop"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.percentile_approx(c, 0.9).alias("p90_approx"),
        F.percentile_approx(c, 0.95).alias("p95_approx"),
    )


def top_k(df: DataFrame, order: Column, k: int) -> DataFrame:
    """W4/A5: global top-k — orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort)."""
    return df.orderBy(order.desc()).limit(k)


def top_k_per_group(df: DataFrame, group: str, order: Column, k: int) -> DataFrame:
    w = Window.partitionBy(group).orderBy(order.desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")


def best_answer_per_group(df: DataFrame, group: str, answer: str, score: str) -> DataFrame:
    """A5/A6 'best': keep the max-score answer per group (reference
    qa_squad.py:40-48, 155-161)."""
    return df.groupBy(group).agg(
        F.max_by(F.col(answer), F.col(score)).alias("answer"),
        F.max(F.col(score)).alias("score"),
    )


def aggregate_answers(
    df: DataFrame,
    group: str,
    answer: str,
    score: str,
    mode: str,
    order_col: str | None = None,
) -> DataFrame:
    """A6: answer aggregation modes best | longest | concat (reference
    qa_squad.py:40-48).

    The reference's ``_aggregate`` receives answers in window order:
    ``concat`` joins non-empty answers in list order, and Python ``max``
    breaks best/longest ties in favor of the FIRST element. Pass
    ``order_col`` (the window index) to reproduce that exactly; without it,
    concat falls back to score-descending order and ties break on the answer
    value — deterministic across runs either way (collect_list/max_by order
    alone is not).
    """
    a, s = F.col(answer), F.col(score)
    o = F.col(order_col) if order_col is not None else None
    if mode in ("best", "longest"):
        k = s if mode == "best" else F.length(a)
        # struct key: primary = score/length, tiebreak = first-in-order
        # (-order) when an order exists, else the answer value itself
        tie = (-o) if o is not None else a
        agg = F.max_by(a, F.struct(k.alias("k"), tie.alias("t")))
    elif mode == "concat":
        if o is not None:
            sort_struct = F.struct(o.alias("k1"), (-s).alias("k2"), a.alias("a"))
        else:
            sort_struct = F.struct((-s).alias("k1"), a.alias("k2"), a.alias("a"))
        agg = F.array_join(
            F.filter(
                F.transform(F.array_sort(F.collect_list(sort_struct)), lambda x: x["a"]),
                lambda x: x.isNotNull() & (x != ""),
            ),
            " ",
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return df.groupBy(group).agg(agg.alias("answer"))


def cumulative_mean(df: DataFrame, order: str, value: str, out_col: str = "cum_mean") -> DataFrame:
    """A7: expanding mean over a defined order (reference scores.py:454,
    511-512, 555-558). Per-key ordering must be globally defined; for a
    distributed cumulative, wrap with partitionBy on a group column."""
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.avg(value).over(w))
