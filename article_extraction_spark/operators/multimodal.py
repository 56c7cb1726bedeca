"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the decode
kernels are deterministic fakes behind ``_HAVE_CODECS`` (clearly marked) —
the Spark-side contract (schema, Arrow batch shape, partitioning, UDF
signatures) is real and tested. Swapping in PIL/ffmpeg later changes only
the kernel bodies.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HAVE_CODECS = False  # PIL / soundfile / av absent in this container

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """DETERMINISTIC FAKE decode/feature-extract (real codec libs absent):
    derives a stable unit-norm vector from the payload digest. Replace with
    a real decode (PIL resize → pooled pixels, etc.) when codecs exist."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.sha256(bytes(payload)).digest()
    vals = [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [float(v / norm) for v in vals]


def extract_media_features(media: DataFrame, batch_note_col: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real plumbing: Arrow-batched binary transport, per-batch kernel calls,
    stable output schema. Kernel body is the deterministic fake above.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _HAVE_CODECS:  # pragma: no cover
            raise NotImplementedError("real codecs not wired yet")
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [_fake_feature(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp —
    posexplode of a native sequence (the decode itself would fill `frame`).
    Partitioning: rows fan out ~duration/every_ms, so repartition by
    byte-volume upstream for balance."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_idx", "ts_ms"),
    )
