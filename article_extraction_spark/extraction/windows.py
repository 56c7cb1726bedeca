"""E5: windowing with stride — token windows (reference models/llm.py:155-185)
and char windows (reference models/qa_squad.py:27-37), fanned out as rows via
posexplode so window-level inference parallelizes across the cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def iter_token_windows(tokens: list, window: int, stride: int) -> Iterator[list]:
    """Reference semantics (models/llm.py:155-185): whole list if window<=0 or
    window>=len; else slide by stride (stride<=0 ⇒ stride=window); final
    window may be short; stop once a window reaches the end."""
    if not tokens:
        yield []
        return
    if window <= 0 or window >= len(tokens):
        yield tokens
        return
    step = stride if stride > 0 else window
    start, total = 0, len(tokens)
    while start < total:
        end = min(start + window, total)
        yield tokens[start:end]
        if end >= total:
            break
        start += step


def char_windows_col(text: Column, window: int, stride: int) -> Column:
    """Char windows as a NATIVE array expression (reference qa_squad.py:27-37:
    yield text[i:i+window], i += stride, stop when i+window >= n).

    n_windows = 1 if n <= window else 1 + ceil((n-window)/stride)
    (reference _estimate_num_windows qa_squad.py:51-56). posexplode the
    result to fan windows out as rows.
    """
    if window <= 0 or stride <= 0:
        return F.array(F.coalesce(text, F.lit("")))
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    n_win = F.when(n <= window, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(window)).cast("double") / F.lit(stride)).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.substring(t, i * stride + 1, window),
    )


def array_windows_col(arr: Column, window: int, stride: int) -> Column:
    """Token windows over a precomputed token-id ARRAY as one native
    expression — `iter_token_windows` semantics (whole array if window<=0
    or >= len; else slide by stride, short final window, stop once a
    window reaches the end). Round 5: pairs with the real BPE encoder
    (extraction/bpe.py) so E5 windowing runs on real token ids without a
    second Python pass; posexplode the result to fan out windows."""
    if window <= 0:
        return F.array(arr)
    step = stride if stride > 0 else window
    n = F.size(arr)
    n_win = F.when(n <= window, F.lit(1)).otherwise(
        F.lit(1)
        + F.ceil((n - F.lit(window)).cast("double") / F.lit(step)).cast("int")
    )
    return F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.slice(arr, i * step + 1, window),
    )


_WINDOWS_TYPE = T.ArrayType(T.StringType())


def token_windows_udf(window: int, stride: int):
    """E5 as an Arrow-batched UDF over a whitespace tokenizer.

    The tokenizer stands in for the HF tokenizer (absent in this container);
    it is cached at module scope per python worker — the executor-side analog
    of the reference's lru_cache model caching (llm.py:43-44). Window/stride
    semantics are exactly iter_token_windows.
    """

    @F.pandas_udf(_WINDOWS_TYPE)
    def _udf(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            tokens = (text or "").split()
            wins = [" ".join(w) for w in iter_token_windows(tokens, window, stride)]
            out.append(wins)
        return pd.Series(out)

    return _udf


def explode_windows(df, text_col: str, window: int, stride: int, by_chars: bool = True):
    """Fan out windows as rows: (…, window_idx, window_text)."""
    arr = (
        char_windows_col(F.col(text_col), window, stride)
        if by_chars
        else token_windows_udf(window, stride)(F.col(text_col))
    )
    return df.select(
        "*", F.posexplode(arr).alias("window_idx", "window_text")
    ).drop(text_col)
