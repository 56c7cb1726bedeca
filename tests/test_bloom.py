"""Bloom anti-join: result-identical to left_anti, both probe paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from article_extraction_spark.operators.bloom import (
    BloomSpec,
    bloom_anti_join,
    bloom_build,
)


def _left_anti(probe, build, keys):
    return probe.join(build.select(*keys).distinct(), keys, "left_anti")


def _ids(df):
    return sorted((r["a"], r["b"]) for r in df.select("a", "b").collect())


@pytest.fixture()
def frames(spark):
    probe = spark.createDataFrame(
        [(i, i % 5, f"p{i}") for i in range(500)], "a long, b long, s string"
    )
    build = spark.createDataFrame(
        [(i, i % 5) for i in range(0, 500, 7)], "a long, b long"
    )
    return probe, build


def test_equals_left_anti_single_and_composite_keys(spark, frames):
    probe, build = frames
    for keys in (["a"], ["a", "b"]):
        got = _ids(bloom_anti_join(probe, build, keys))
        want = _ids(_left_anti(probe, build, keys))
        assert got == want and len(got) < 500


def test_no_false_negatives_members_all_dropped(spark, frames):
    """Feeding the build rows themselves as the probe must yield EMPTY —
    a false negative anywhere in build/probe hashing would leak one."""
    probe, build = frames
    members = probe.join(build.select("a").distinct(), "a", "left_semi")
    assert bloom_anti_join(members, build, ["a"]).count() == 0


def test_null_probe_keys_always_survive(spark):
    probe = spark.createDataFrame(
        [(1, "x"), (None, "nullrow"), (2, "y")], "a long, s string"
    ).withColumn("b", F.lit(0).cast("long"))
    build = spark.createDataFrame([(1, 0)], "a long, b long")
    got = sorted(r["s"] for r in bloom_anti_join(probe, build, ["a"]).collect())
    assert got == ["nullrow", "y"]  # NULL key never matches (left_anti parity)


def test_pandas_path_matches_literal_path(spark, frames):
    probe, build = frames
    lit = _ids(bloom_anti_join(probe, build, ["a", "b"]))
    pdp = _ids(bloom_anti_join(probe, build, ["a", "b"], literal_max_words=0))
    assert lit == pdp


def test_probe_path_choice_visible_in_plan(spark, frames):
    probe, build = frames
    lit_plan = bloom_anti_join(probe, build, ["a"])._jdf.queryExecution().toString()
    assert "ArrowEvalPython" not in lit_plan  # literal path stays JVM-side
    pd_plan = (
        bloom_anti_join(probe, build, ["a"], literal_max_words=0)
        ._jdf.queryExecution()
        .toString()
    )
    assert "ArrowEvalPython" in pd_plan or "EvalPython" in pd_plan


def test_bloom_actually_prunes(spark, frames):
    """Non-members overwhelmingly resolve on the negative (join-free)
    branch: the bitmap rejects >90% of them at 10 bits/key."""
    probe, build = frames
    n = build.count()
    spec = BloomSpec(n)
    words = bloom_build(build, ["a"], spec)
    dense = [0] * (spec.m // 64)
    for w, b in words:
        dense[w] = b
    flagged = (
        probe.join(build, ["a"], "left_anti")  # true non-members only
        .withColumn("__p", F.array(*spec.position_cols(["a"])))
        .withColumn("__bm", F.lit(dense))
        .withColumn(
            "hit",
            F.expr(
                "forall(__p, p -> (element_at(__bm, cast(p div 64 as int) + 1)"
                " & shiftleft(1L, cast(pmod(p, 64) as int))) != 0L)"
            ),
        )
    )
    rows = flagged.select("hit").collect()
    fp = sum(1 for r in rows if r["hit"]) / len(rows)
    assert fp < 0.10, f"false-positive rate {fp:.3f}"


def test_empty_build_passes_everything(spark, frames):
    probe, _ = frames
    empty = spark.createDataFrame([], "a long, b long")
    assert bloom_anti_join(probe, empty, ["a"]).count() == probe.count()


def test_retained_cache_exposed_and_releasable(spark, frames):
    """Review r6: the internal persists are handed back for release."""
    probe, build = frames
    out = bloom_anti_join(probe, build, ["a"], persist=True)
    out.count()
    assert len(out._retained_cache) == 2
    for c in out._retained_cache:
        c.unpersist(blocking=True)
    out2 = bloom_anti_join(probe, build, ["a"])
    assert len(out2._retained_cache) == 1
    for c in out2._retained_cache:
        c.unpersist(blocking=True)


def test_bitmap_sized_from_distinct_keys_not_rows(spark):
    """Review r6: 10k duplicate rows over 10 keys must size the bloom for
    10 keys (m = 64 minimum bucket, k capped), not 10k."""
    from article_extraction_spark.operators.bloom import BloomSpec

    build = spark.createDataFrame([(i % 10,) for i in range(10_000)], "a long")
    probe = spark.createDataFrame([(i,) for i in range(50)], "a long")
    got = sorted(r["a"] for r in bloom_anti_join(probe, build, ["a"]).collect())
    assert got == list(range(10, 50))
    # the spec a raw-row count would produce differs from the distinct one
    assert BloomSpec(10).m < BloomSpec(10_000).m
