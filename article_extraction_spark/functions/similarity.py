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


# strings longer than this fall back to the scalar kernel (the B×L² match
# tensor would dominate memory; fuzzy-join inputs are short names)
_JW_VECTOR_MAX_LEN = 128
_JW_CHUNK = 4096


def _jw_batch_numpy(sa: list[str], sb: list[str]) -> "object":
    """Vectorized Jaro-Winkler over a batch of SHORT string pairs.

    Same greedy in-window matching as ``jaro`` but executed as numpy tensor
    ops: the per-character python loop becomes L numpy steps over the whole
    batch (~10× on fuzzy-join shapes). Property-tested equal to the scalar
    twin (tests/test_functions.py)."""
    import numpy as np

    B = len(sa)
    n1 = np.fromiter((len(s) for s in sa), dtype=np.int64, count=B)
    n2 = np.fromiter((len(s) for s in sb), dtype=np.int64, count=B)
    L = int(max(n1.max(initial=0), n2.max(initial=0), 1))
    a_mat = np.zeros((B, L), dtype=np.uint32)
    b_mat = np.zeros((B, L), dtype=np.uint32)
    for r, s in enumerate(sa):
        if s:
            a_mat[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for r, s in enumerate(sb):
        if s:
            b_mat[r, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    ar = np.arange(L)
    valid1 = ar[None, :] < n1[:, None]
    valid2 = ar[None, :] < n2[:, None]
    eq = (a_mat[:, :, None] == b_mat[:, None, :]) & valid1[:, :, None] & valid2[:, None, :]
    window = np.maximum(np.maximum(n1, n2) // 2 - 1, 0)
    eq &= np.abs(ar[:, None] - ar[None, :])[None, :, :] <= window[:, None, None]

    taken = np.zeros((B, L), dtype=bool)
    m1 = np.zeros((B, L), dtype=bool)
    for i in range(L):
        cand = eq[:, i, :] & ~taken
        rows = np.nonzero(cand.any(axis=1))[0]
        j = cand[rows].argmax(axis=1)
        taken[rows, j] = True
        m1[rows, i] = True
    m = m1.sum(axis=1)

    # order-aligned matched sequences for the half-transposition count
    out1 = np.zeros((B, L), dtype=np.uint32)
    out2 = np.zeros((B, L), dtype=np.uint32)
    r1, c1 = np.nonzero(m1)
    out1[r1, (np.cumsum(m1, axis=1) - 1)[r1, c1]] = a_mat[r1, c1]
    r2, c2 = np.nonzero(taken)
    out2[r2, (np.cumsum(taken, axis=1) - 1)[r2, c2]] = b_mat[r2, c2]
    half_t = ((out1 != out2) & (ar[None, :] < m[:, None])).sum(axis=1)
    t = half_t // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro_v = (m / n1 + m / n2 + (m - t) / np.maximum(m, 1)) / 3.0
    jaro_v = np.where((m == 0) | (n1 == 0) | (n2 == 0), 0.0, jaro_v)

    k = min(4, L)
    pm = (a_mat[:, :k] == b_mat[:, :k]) & valid1[:, :k] & valid2[:, :k]
    prefix = np.cumprod(pm, axis=1).sum(axis=1)
    jw = jaro_v + prefix * 0.1 * (1.0 - jaro_v)
    # identical strings are exactly 1.0 (incl. two empties, like the scalar twin)
    jw = np.where((n1 == n2) & (a_mat == b_mat).all(axis=1), 1.0, jw)
    return jw


def jw_batch_safe(sa: list[str], sb: list[str]) -> list[float]:
    """Memory-safe batch Jaro-Winkler: chunks the vectorized kernel at
    _JW_CHUNK pairs (the kernel's match tensor is B×L² — unchunked, a
    million-pair fuzzy-match batch with one long token would allocate tens
    of GB) and falls back to the scalar twin for strings over
    _JW_VECTOR_MAX_LEN. Same values as jaro_winkler for every pair."""
    import numpy as np

    n = len(sa)
    out = np.empty(n, dtype="float64")
    ok_idx = [
        i
        for i in range(n)
        if len(sa[i]) <= _JW_VECTOR_MAX_LEN and len(sb[i]) <= _JW_VECTOR_MAX_LEN
    ]
    for lo in range(0, len(ok_idx), _JW_CHUNK):
        chunk = ok_idx[lo : lo + _JW_CHUNK]
        out[chunk] = _jw_batch_numpy([sa[i] for i in chunk], [sb[i] for i in chunk])
    ok = set(ok_idx)
    for i in range(n):
        if i not in ok:
            out[i] = jaro_winkler(sa[i], sb[i])
    return out.tolist()


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """F11 as an Arrow-batched column function: null masking here, memory
    policy (chunking + long-string fallback) in jw_batch_safe — ONE copy of
    that policy for both this UDF and the fuzzy batch matchers."""
    import numpy as np

    out = pd.Series([None] * len(a), dtype="float64")
    av, bv = a.to_numpy(dtype=object), b.to_numpy(dtype=object)
    idx = [i for i in range(len(a)) if av[i] is not None and bv[i] is not None]
    if idx:
        vals = jw_batch_safe([av[i] for i in idx], [bv[i] for i in idx])
        out.iloc[np.asarray(idx)] = vals
    return out


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
