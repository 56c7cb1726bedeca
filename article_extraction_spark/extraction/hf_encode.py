"""E10: model-backed embedding encoder (reference results/020925/scores.py:
59-157 — Embedder.encode/_compute_embeddings).

Semantics mirrored exactly:

  * ``pooler_output`` when the model provides one, else attention-masked
    mean-pooling over ``last_hidden_state`` with an EPSILON-clamped count
    (scores.py:141-151),
  * L2 normalization of the pooled vector (scores.py:153),
  * text → vector memoization (scores.py:105-123) — here a BOUNDED LRU
    (10k entries) since the backend lives for the worker's lifetime; ACROSS
    the cluster the memo is the dedupe-before-encode join in
    ``encode.encode_texts_deduped`` — encode each distinct text once, join
    back.

The pooling/normalization math is pure numpy (``pool_and_normalize``) so it
is testable without torch; the torch backend converts its forward outputs to
numpy and calls the same function. torch/transformers import lazily; real
path is skip-marked in tests (requirements-optional.txt pins the stack).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

EPSILON = 1e-12  # scores.py:25 EPSILON, exact (clamp for empty masks/zero norms)
DEFAULT_BATCH_SIZE = 16  # scores.py:23
DEFAULT_MAX_LENGTH = 512  # scores.py:24


def pool_and_normalize(last_hidden, attention_mask, pooler_output=None):
    """(B, T, H) hidden states + (B, T) mask → (B, H) unit vectors.

    Mirrors scores.py:141-153: prefer pooler_output; else masked mean-pool
    with clamped counts; always L2-normalize."""
    import numpy as np

    if pooler_output is not None:
        pooled = np.asarray(pooler_output, dtype="float64")
    else:
        h = np.asarray(last_hidden, dtype="float64")
        mask = np.asarray(attention_mask, dtype="float64")[:, :, None]
        summed = (h * mask).sum(axis=1)
        counts = np.maximum(mask.sum(axis=1), EPSILON)
        pooled = summed / counts
    norms = np.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / np.maximum(norms, EPSILON)


class EncoderBackend:
    """What the Spark encoder UDF needs: texts → (B, dim) pooled unit
    vectors (numpy)."""

    def encode_batch(self, texts: list[str]):
        raise NotImplementedError


class TorchEncoderBackend(EncoderBackend):
    """Real HF runtime (scores.py:66-93 __init__ + 125-155 compute)."""

    def __init__(
        self,
        model_id: str,
        batch_size: int = DEFAULT_BATCH_SIZE,
        max_length: int = DEFAULT_MAX_LENGTH,
    ):
        try:
            import torch  # noqa: F401
            from transformers import AutoModel, AutoTokenizer
        except Exception as exc:  # pragma: no cover - env-dependent
            raise RuntimeError("torch+transformers required for the encoder backend") from exc

        import torch

        self.tokenizer = AutoTokenizer.from_pretrained(model_id, use_fast=True)
        self.model = AutoModel.from_pretrained(model_id)
        self.device = "cuda" if torch.cuda.is_available() else "cpu"
        self.model.to(self.device)
        self.model.eval()
        self.batch_size = batch_size
        limit = getattr(self.tokenizer, "model_max_length", None)
        self.max_length = (
            min(max_length, limit) if isinstance(limit, int) and limit > 0 else max_length
        )
        # BOUNDED text → vector memo: the backend instance lives for the
        # worker's lifetime (lru_cached), and the cluster-scale memo is the
        # dedupe-before-encode join anyway — an unbounded dict here would be
        # O(distinct texts × hidden_dim) per worker
        from collections import OrderedDict

        self._cache: "OrderedDict[str, object]" = OrderedDict()
        self._cache_max = 10_000

    def encode_batch(self, texts: list[str]):
        import numpy as np
        import torch

        out: list = [None] * len(texts)
        missing: list[str] = []
        missing_idx: list[int] = []
        for i, t in enumerate(texts):
            hit = self._cache.get(t)
            if hit is not None:
                self._cache.move_to_end(t)
                out[i] = hit
            else:
                missing.append(t)
                missing_idx.append(i)
        for lo in range(0, len(missing), self.batch_size):
            batch = missing[lo : lo + self.batch_size]
            tokens = self.tokenizer(
                batch,
                padding=True,
                truncation=True,
                max_length=self.max_length,
                return_tensors="pt",
            )
            tokens = {k: v.to(self.device) for k, v in tokens.items()}
            with torch.no_grad():
                outputs = self.model(**tokens)
            pooler = getattr(outputs, "pooler_output", None)
            vecs = pool_and_normalize(
                outputs.last_hidden_state.cpu().numpy(),
                tokens["attention_mask"].cpu().numpy(),
                pooler_output=None if pooler is None else pooler.cpu().numpy(),
            )
            for j, v in enumerate(vecs):
                text = batch[j]
                self._cache[text] = v
                self._cache.move_to_end(text)
                while len(self._cache) > self._cache_max:
                    self._cache.popitem(last=False)  # evict least-recent
                out[missing_idx[lo + j]] = v
        return np.vstack(out) if out else np.empty((0, 0))


@lru_cache(maxsize=2)
def torch_encoder_backend(model_id: str) -> TorchEncoderBackend:
    """Executor-scoped encoder cache (one model load per python worker)."""
    return TorchEncoderBackend(model_id)


def hf_encoder_udf(model_id: str, backend: EncoderBackend | None = None):
    """Drop-in replacement for encode.fake_encoder_udf: pass it to
    ``encode_texts_deduped(df, text_col, encoder=hf_encoder_udf(mid))`` and
    the dedupe-before-encode plan is unchanged — only the kernel is real."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _encode(texts: pd.Series) -> pd.Series:
        be = backend if backend is not None else torch_encoder_backend(model_id)
        vecs = be.encode_batch([t or "" for t in texts])
        return pd.Series([[float(x) for x in row] for row in vecs])

    return _encode
