"""Bloom-filter anti-join: membership pruning without shuffling the big side.

Decontamination, incremental-resume and dedup-against-index all reduce to
"drop the probe rows whose key appears in a build set" (reference behavior:
the per-key resume loop in ``results/020925/scores.py`` re-queries processed
keys; at 100 TB the equivalent anti-join shuffles the entire corpus on the
key). The classic fix (public: Bloom 1970; Spark's own runtime row-level
filtering applies the same idea to inner joins) is a Bloom filter built from
the SMALL side:

  * build: k positions per key from ``xxhash64(i, keys...)`` (JVM-side,
    deterministic), ``bit_or``-aggregated into an m-bit bitmap — a native
    map-side-combined groupBy over ``m/64`` words, never a driver loop;
  * probe: every row checks its k bits. Bloom-NEGATIVE rows are *definitely*
    absent from the build set — they are results of the anti-join and never
    touch a join. Only bloom-POSITIVE rows (true members + the ~fp fraction)
    enter an exact ``left_anti`` confirmation, so the final result equals
    ``probe.join(build, keys, "left_anti")`` EXACTLY — false positives are
    filtered by the confirm, false negatives cannot exist.

Two probe implementations, chosen by bitmap size:

  * ``<= literal_max_words`` words: the bitmap rides in the plan as an array
    literal and the check is one ``forall`` expression — fully JVM-side.
  * larger: the bitmap is an ``sc.broadcast`` numpy array and the check is an
    Arrow-batched pandas UDF doing pure int64 gathers (positions are still
    computed natively; Python never hashes, so build/probe hashing agrees by
    construction).

Scale notes (100 TB): the probe side is scanned, bits checked, and only the
positive sliver shuffles into the confirm join — against a broadcast of the
build keys when small, SMJ otherwise. The price is that the probe plan is
referenced twice (negative branch ∪ confirmed-positive branch): two scans of
the source unless ``persist=True`` (MEMORY_AND_DISK on the probe+flag frame).
Columnar scans are usually far cheaper than shuffling the full probe, which
is exactly the trade Spark's runtime bloom filters make. When the build side
is small enough to broadcast anyway, a plain broadcast ``left_anti`` is
already one pass — use that instead; this operator exists for build sets in
the "too big to broadcast, far smaller than the corpus" band, capped by
``max_bits`` (a 1e9-key build at 10 bits/key would need a 1.25 GB bitmap —
beyond the cap the filter degrades to a higher fp rate, never to wrong
results).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_anti_join", "bloom_build", "BloomSpec"]


class BloomSpec:
    """Sizing + the shared position expressions (build and probe MUST hash
    identically; both sides go through this object)."""

    def __init__(self, n_keys: int, bits_per_key: int = 10, max_bits: int = 1 << 30):
        n = max(1, n_keys)
        m = 1 << max(6, math.ceil(math.log2(n * bits_per_key)))
        self.m = min(m, max_bits)
        # optimal k = ln2 * m/n, clamped: k=0 would accept everything
        self.k = max(1, min(16, round(0.693 * self.m / n)))

    def position_cols(self, keys: list[str]) -> list:
        """k bit positions as native columns — xxhash64 seeded by the probe
        index via a prepended literal (pyspark's xxhash64 has a fixed
        seed, so vary the input instead)."""
        return [
            F.pmod(F.xxhash64(F.lit(i), *[F.col(c) for c in keys]), F.lit(self.m)).cast(
                "long"
            )
            for i in range(self.k)
        ]


def bloom_build(build: DataFrame, keys: list[str], spec: BloomSpec) -> list[tuple]:
    """Aggregate the build side into bitmap words ``(word_idx, bits)``.
    One explode(k) + map-side-combined groupBy over at most m/64 distinct
    words; the collect is bounded by the bitmap size, never the key count."""
    pos = F.explode(F.array(*spec.position_cols(keys))).alias("pos")
    words = (
        build.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return [(r["word"], r["bits"]) for r in words.collect()]


def bloom_anti_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    bits_per_key: int = 10,
    max_bits: int = 1 << 30,
    literal_max_words: int = 1 << 16,
    persist: bool = False,
) -> DataFrame:
    """Rows of ``probe`` whose key tuple does NOT appear in ``build`` —
    result-identical to ``probe.join(build.select(keys).distinct(), keys,
    "left_anti")`` (NULL in any probe key never equals anything, so such
    rows always survive — through the confirm join, same as plain
    left_anti). See module docstring for the why and the scale shape.

    The returned DataFrame carries ``_retained_cache`` (the distinct
    build-key frame, plus the flagged probe when ``persist=True`` —
    packing.py convention): ``.unpersist()`` each entry after consuming
    the result, or repeated calls accumulate cached blocks (review r6)."""
    from pyspark import StorageLevel

    # ONE distinct pass sizes the bitmap (distinct keys, not raw rows —
    # a 1e9-row build over 1e6 keys would otherwise oversize m 1000x and
    # scan build three times), feeds the bitmap build, and serves as the
    # confirm join's right side (review r6)
    key_rows = build.select(*keys).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    n = key_rows.count()
    spec = BloomSpec(n, bits_per_key=bits_per_key, max_bits=max_bits)
    words = bloom_build(key_rows, keys, spec)

    pos_arr = F.array(*spec.position_cols(keys))
    n_words = spec.m // 64
    if n_words <= literal_max_words:
        dense = [0] * n_words
        for w, b in words:
            dense[w] = b
        # SQL text keeps shiftleft's column bit-count legal and references
        # the literal array exactly once per row
        flagged = (
            probe.withColumn("__bloom_pos", pos_arr)
            .withColumn("__bloom_bm", F.lit(dense))
            .withColumn(
                "__bloom_hit",
                F.expr(
                    "forall(__bloom_pos, p -> "
                    "(element_at(__bloom_bm, cast(p div 64 as int) + 1) "
                    " & shiftleft(1L, cast(pmod(p, 64) as int))) != 0L)"
                ),
            )
            .drop("__bloom_pos", "__bloom_bm")
        )
    else:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        dense = np.zeros(n_words, dtype=np.int64)
        for w, b in words:
            dense[w] = b
        sc = probe.sparkSession.sparkContext
        bc = sc.broadcast(dense)

        def _hit(*pos):
            bm = bc.value
            out = np.ones(len(pos[0]), dtype=bool)
            for p in pos:
                pv = p.to_numpy()
                out &= (bm[pv >> 6] >> (pv & 63)) & 1 != 0
            return pd.Series(out)

        # legacy registration: typed @pandas_udf rejects *args signatures
        hit_udf = pandas_udf(_hit, "boolean")
        flagged = probe.withColumn(
            "__bloom_hit", hit_udf(*spec.position_cols(keys))
        )

    retained = [key_rows]
    if persist:
        flagged = flagged.persist(StorageLevel.MEMORY_AND_DISK)
        retained.append(flagged)
    negatives = flagged.where(~F.col("__bloom_hit")).drop("__bloom_hit")
    confirm = (
        flagged.where(F.col("__bloom_hit"))
        .drop("__bloom_hit")
        .join(key_rows, keys, "left_anti")
    )
    out = negatives.unionByName(confirm)
    out._retained_cache = retained
    return out
