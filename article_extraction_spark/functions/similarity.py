"""String & vector similarity (F11, F12, F17).

Jaro-Winkler has no Spark builtin, so it runs as an Arrow-batched pandas UDF
(textbook Winkler 1990 formulation — prefix scale 0.1 capped at 4 chars —
matching the reference's semantics at tables/paper_information_table.py:464-521
without porting its code). Levenshtein and cosine are native expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity (Jaro 1989). Independent textbook implementation."""
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    if not n1 or not n2:
        return 0.0
    window = max(max(n1, n2) // 2 - 1, 0)

    # greedy left-to-right matching within the window
    taken2 = bytearray(n2)
    match1: list[int] = []  # indices into s1, in order
    match2_flags = bytearray(n2)
    for i, ch in enumerate(s1):
        lo, hi = max(0, i - window), min(n2, i + window + 1)
        for j in range(lo, hi):
            if not taken2[j] and s2[j] == ch:
                taken2[j] = 1
                match1.append(i)
                match2_flags[j] = 1
                break
    m = len(match1)
    if m == 0:
        return 0.0
    matched2 = [s2[j] for j in range(n2) if match2_flags[j]]
    half_transpositions = sum(s1[i] != c2 for i, c2 in zip(match1, matched2))
    t = half_transpositions // 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1, max_prefix: int = 4) -> float:
    """Jaro-Winkler similarity (Winkler 1990): boost by shared prefix."""
    j = jaro(s1, s2)
    if j == 1.0:
        return 1.0
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_scale * (1.0 - j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """F11 as an Arrow-batched column function."""
    return pd.Series(
        [
            jaro_winkler(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


def levenshtein_normalized_col(a: Column, b: Column) -> Column:
    """F12: levenshtein / max(len) — 0.0 for two empty strings
    (reference scores.py:190-219)."""
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(0.0)).otherwise(
        F.levenshtein(a, b).cast("double") / denom
    )


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over two array<float|double> columns — native higher-order
    functions, no Python boundary (F17 building block)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    denom = norm_col(a) * norm_col(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_col(a, b) / denom)


def cosine_distance_col(a: Column, b: Column) -> Column:
    """F17: 1 − cosine, clamped ≥ 0 (reference scores.py:159-167)."""
    return F.greatest(F.lit(0.0), F.lit(1.0) - cosine_similarity_col(a, b))
