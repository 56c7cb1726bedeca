"""Mergeable fixed-bin histogram quantiles (round 7).

Exact percentiles (``F.percentile``) need a full sort or a
per-group collect of values; at 100 TB the standard answer is a
MERGEABLE summary. This is the simplest member of that family — an
equi-width histogram over a caller-declared domain:

* build = one map-side-combined groupBy over ≤ ``bins`` keys (rows
  shuffle a bin id, never a value);
* merge = summing bin counts (decomposable ⇒ maintainable with
  ``IncrementalRollup``, partial per-day histograms roll up);
* quantile estimate = linear interpolation inside the located bin,
  closed-form arithmetic any engine replays bit-for-bit (unlike
  t-digest/KLL, whose data-dependent centroids defeat cross-engine
  value oracles — the trade is a declared domain and equi-width error
  bounds: per-quantile error ≤ one bin width).

GK/KLL give tighter adaptive bounds; the histogram is chosen here for
replayability and rollup-maintainability (same reasoning as the
quantized HLL denominator in sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hist_counts", "hist_merge", "hist_quantiles", "maintained_hist"]


def _bin_col(col, lo: float, hi: float, bins: int):
    """Equi-width bin id, clamped to [0, bins-1] (values at/beyond the
    declared domain edges land in the boundary bins — declared-domain
    outliers must be counted, not dropped, or quantiles shift)."""
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(bins))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")


def hist_counts(
    df: DataFrame, value_col: str, lo: float, hi: float, bins: int = 1024
) -> DataFrame:
    """(bin, cnt) histogram of ``value_col`` over the declared [lo, hi)
    domain. NULLs are excluded (no observation). One shuffle of ≤ bins
    keys; partial aggregation does the map-side combine."""
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    c = F.col(value_col)
    return (
        df.where(c.isNotNull())
        .select(_bin_col(c, lo, hi, bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Merge histogram partials built with the SAME (lo, hi, bins):
    union + per-bin sum — the decomposability that makes the sketch
    maintainable under ingest."""
    if not hists:
        raise ValueError("hist_merge needs at least one histogram")
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def maintained_hist(source, rollup, value_col: str, lo: float, hi: float, bins: int = 1024):
    """The histogram as a MAINTAINED artifact: an ``IncrementalRollup``
    whose ``prepare`` hook projects each source row to its bin — refreshes
    fold only CDC deltas (bin counts are sum-decomposable), and because
    the rollup is count-only it rides the DELETE-AWARE path too: MoR
    equality deletes on the source fold as negative bin counts and
    emptied bins tombstone-sweep away. Quantiles over a 100-TB table
    under append+delete churn stay fresh without ever rescanning it.
    Read estimates with ``hist_quantiles(rollup.read(spark)
    .withColumnRenamed("n", "cnt"), ...)`` after ``refresh()``."""
    from ..rollup import IncrementalRollup

    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")

    def prepare(df: DataFrame) -> DataFrame:
        c = F.col(value_col)
        return df.where(c.isNotNull()).select(_bin_col(c, lo, hi, bins).alias("bin"))

    return IncrementalRollup(source, rollup, ["bin"], {"n": ("count", None)}, prepare=prepare)


def hist_quantiles(
    counts: DataFrame, qs: list[float], lo: float, hi: float, bins: int
) -> DataFrame:
    """(q, estimate) per requested quantile from the bin counts: target
    rank r = q·N, located in the first bin whose cumulative count
    reaches r, linearly interpolated inside it. Window work over ≤ bins
    rows (never the data). Per-quantile error ≤ one bin width by
    construction. Deterministic closed-form doubles — a second engine
    replays the estimate exactly."""
    from pyspark.sql import Window

    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    width = (hi - lo) / bins
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    qdf = counts.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    # first bin with cum >= q*N (q <= 1 so it always exists)
    hit = (
        cum.join(qdf, cum["cum"] >= qdf["q"] * cum["n"])
        .groupBy("q")
        .agg(
            F.min_by(F.struct("bin", "cnt", "cum", "n"), F.col("bin")).alias("b")
        )
    )
    frac = (F.col("b.n") * F.col("q") - (F.col("b.cum") - F.col("b.cnt"))) / F.col("b.cnt")
    return hit.select(
        "q",
        (F.lit(lo) + (F.col("b.bin") + frac) * F.lit(width)).alias("estimate"),
    )
