"""Mergeable histogram quantiles (operators/histogram.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from article_extraction_spark.operators.histogram import (
    hist_counts,
    hist_merge,
    hist_quantiles,
)


def _est(spark, rows, qs, lo, hi, bins):
    df = spark.createDataFrame([(float(v),) for v in rows], "v double")
    h = hist_counts(df, "v", lo, hi, bins)
    return {r["q"]: r["estimate"] for r in hist_quantiles(h, qs, lo, hi, bins).collect()}


def test_quantiles_within_one_bin_of_exact(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vals = rng.uniform(0, 1000, size=5000).tolist() + [-50.0, 2000.0]  # domain outliers
    lo, hi, bins = 0.0, 1000.0, 500
    width = (hi - lo) / bins
    got = _est(spark, vals, [0.5, 0.9, 0.99], lo, hi, bins)
    exact = np.quantile(np.clip(np.array(vals), lo, hi), [0.5, 0.9, 0.99])
    for q, e in zip([0.5, 0.9, 0.99], exact):
        assert abs(got[q] - e) <= 2 * width, (q, got[q], e)


def test_python_twin_exact(spark):
    """The estimate is a pure function of (bin counts, q): a python twin
    replays it to the bit — the property the value oracle relies on."""
    vals = [1.0, 2.0, 2.0, 3.0, 7.0, 8.0, 9.5, 9.9]
    lo, hi, bins = 0.0, 10.0, 5
    width = (hi - lo) / bins
    counts: dict[int, int] = {}
    for v in vals:
        b = min(max(int((v - lo) / (hi - lo) * bins), 0), bins - 1)
        counts[b] = counts.get(b, 0) + 1
    n = len(vals)

    def twin(q):
        cum = 0
        for b in sorted(counts):
            cum += counts[b]
            if cum >= q * n:
                frac = (n * q - (cum - counts[b])) / counts[b]
                return lo + (b + frac) * width
        raise AssertionError

    got = _est(spark, vals, [0.25, 0.5, 0.75, 1.0], lo, hi, bins)
    for q in got:
        assert got[q] == pytest.approx(twin(q), abs=0), q


def test_merge_equals_single_build_and_rollup_maintainable(spark):
    df = spark.createDataFrame([(float(i % 97),) for i in range(3000)], "v double")
    a = df.where(F.col("v") < 50)
    b = df.where(F.col("v") >= 50)
    lo, hi, bins = 0.0, 100.0, 64
    merged = hist_merge(hist_counts(a, "v", lo, hi, bins), hist_counts(b, "v", lo, hi, bins))
    single = hist_counts(df, "v", lo, hi, bins)
    assert {(r["bin"], r["cnt"]) for r in merged.collect()} == {
        (r["bin"], r["cnt"]) for r in single.collect()
    }
    q_m = {r["q"]: r["estimate"] for r in hist_quantiles(merged, [0.5], lo, hi, bins).collect()}
    q_s = {r["q"]: r["estimate"] for r in hist_quantiles(single, [0.5], lo, hi, bins).collect()}
    assert q_m == q_s


def test_validation_and_nulls(spark):
    df = spark.createDataFrame([(1.0,), (None,), (2.0,)], "v double")
    h = hist_counts(df, "v", 0.0, 10.0, 4)
    assert sum(r["cnt"] for r in h.collect()) == 2  # NULL excluded
    with pytest.raises(ValueError, match="hi > lo"):
        hist_counts(df, "v", 5.0, 5.0, 4)
    with pytest.raises(ValueError, match="bins"):
        hist_counts(df, "v", 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="quantiles"):
        hist_quantiles(h, [0.0], 0.0, 10.0, 4).collect()


def test_maintained_hist_under_ingest_and_delete(spark, tmp_path):
    """maintained_hist composes the histogram with the delete-aware
    rollup: appends refresh incrementally, a MoR delete folds negative
    bin counts (mode stays "incremental"), emptied bins sweep away, and
    quantiles always equal a from-scratch histogram of the live rows."""
    from pyspark.sql import functions as F

    from article_extraction_spark.catalog import ManifestTable
    from article_extraction_spark.operators.histogram import (
        hist_counts,
        hist_quantiles,
        maintained_hist,
    )

    lo, hi, bins = 0.0, 100.0, 20
    source = ManifestTable(str(tmp_path / "src"))
    rollup = ManifestTable(str(tmp_path / "roll"))
    mh = maintained_hist(source, rollup, "v", lo, hi, bins)

    def quants(counts_df):
        return {
            r["q"]: r["estimate"]
            for r in hist_quantiles(counts_df, [0.5, 0.9], lo, hi, bins).collect()
        }

    def expected():
        return quants(hist_counts(source.read(spark), "v", lo, hi, bins))

    def got():
        return quants(rollup.read(spark).withColumnRenamed("n", "cnt"))

    rows = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(2000)], "event_id long, v double"
    )
    source.append(rows.where(F.col("event_id") < 1000))
    assert mh.refresh(spark)["mode"] == "full"  # bootstrap
    assert got() == expected()
    source.append(rows.where(F.col("event_id") >= 1000))
    assert mh.refresh(spark)["mode"] == "incremental"
    assert got() == expected()
    # delete everything in one value band: negative partials + sweep
    source.delete(
        spark,
        rows.where((F.col("v") >= 40) & (F.col("v") < 45)).select("event_id"),
        ["event_id"],
    )
    s = mh.refresh(spark)
    assert s["mode"] == "incremental"
    assert got() == expected()
    emptied = {8}  # bins 40-45 live in bin 8 at width 5
    assert not emptied & {r["bin"] for r in rollup.read(spark).collect()}
