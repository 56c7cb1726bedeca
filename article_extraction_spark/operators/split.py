"""W2: deterministic shuffled train/test/dev split.

Reference semantics (tables/other/split.py:20-47, epoch_table.py:195-219):
shuffle the full frame with a fixed seed, slice exact counts by ratio,
remainder → dev. ``randomSplit`` is only approximate and not reproducible
across partitionings, so the engine uses a seeded-hash rank instead
(SURVEY.md §7.4 determinism note): order by xxhash64(key, seed), take exact
cut points. Any executor count yields the identical assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def deterministic_split(
    df: DataFrame,
    key: str,
    train: float,
    test: float,
    dev: float,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Adds ``out_col`` ∈ {train,test,dev}; exact counts, remainder → dev.

    Scale note: the global rank uses a single-partition window over only
    (key, hash) — at 10^12 rows you'd switch to a two-phase rank
    (per-partition rank + offset by partition counts); the assignment
    function itself is already partition-count independent.
    """
    total = sum((train, test, dev))
    if not (abs(total - 1.0) < 1e-9):
        raise ValueError(f"ratios must sum to 1, got {total}")
    n = df.count()
    n_train = int(n * train)
    n_test = int(n * test)
    w = Window.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key))
    ranked = df.withColumn("_rk", F.row_number().over(w))
    return ranked.withColumn(
        out_col,
        F.when(F.col("_rk") <= n_train, "train")
        .when(F.col("_rk") <= n_train + n_test, "test")
        .otherwise("dev"),
    ).drop("_rk")
