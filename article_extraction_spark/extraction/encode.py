"""E10/E11: embedding encode with dedupe-before-encode, token counting with a
worker-cached tokenizer.

The reference memoizes embeddings in a dict (scores.py:61, 105-123) — at
cluster scale the cache becomes a JOIN: distinct texts → encode once → join
back. The encoder here is a deterministic fake (no model libs in this
container): digest-derived unit vector, mean-pool + L2-normalize shape
(reference scores.py:142-154). Swap the kernel for a real model per worker;
the plan is unchanged.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fake_encoder_udf(dim: int = 16):
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _encode(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            digest = hashlib.sha256((text or "").encode("utf-8")).digest()
            need = dim * 4
            buf = (digest * (need // len(digest) + 1))[:need]
            vals = [int.from_bytes(buf[4 * i : 4 * i + 4], "big") / 2**31 - 1.0 for i in range(dim)]
            norm = sum(v * v for v in vals) ** 0.5 or 1.0
            out.append([float(v / norm) for v in vals])
        return pd.Series(out)

    return _encode


def encode_texts_deduped(
    df: DataFrame, text_col: str, encoder=None, out_col: str = "embedding"
) -> DataFrame:
    """Dedupe-before-encode (E10): encode each DISTINCT text once, join back.
    The join is a hash join on the text value — for long texts, swap the key
    to md5(text) to shrink shuffle keys (done here)."""
    encoder = encoder or fake_encoder_udf()
    key = F.md5(F.coalesce(F.col(text_col), F.lit("")).cast("binary")).alias("_tkey")
    keyed = df.withColumn("_tkey", key)
    uniq = keyed.select("_tkey", F.col(text_col)).dropDuplicates(["_tkey"])
    encoded = uniq.select("_tkey", encoder(F.col(text_col)).alias(out_col))
    return keyed.join(encoded, "_tkey", "left").drop("_tkey")


# E11: token counting with a worker-cached tokenizer (reference
# diagnosis/nb_token_papers.py:42-60). The "tokenizer" is the BPE-ish regex
# splitter cached at module scope (one compile per python worker).
_TOKENIZER_CACHE: dict[str, object] = {}


def _get_tokenizer(name: str):
    if name not in _TOKENIZER_CACHE:
        import re

        _TOKENIZER_CACHE[name] = re.compile(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]")
    return _TOKENIZER_CACHE[name]


def token_count_udf(tokenizer_name: str = "bpe-ish"):
    @F.pandas_udf(T.IntegerType())
    def _count(texts: pd.Series) -> pd.Series:
        tok = _get_tokenizer(tokenizer_name)
        return pd.Series(
            [len(tok.findall(t)) if t else 0 for t in texts], dtype="int32"
        )

    return _count
