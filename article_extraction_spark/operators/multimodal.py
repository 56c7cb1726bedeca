"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode coverage (round 4): raw-rgb8 / pcm16 AND compressed PNG / baseline
JPEG / WAV are REAL decodes. Backend order is NATIVE-FIRST: when PIL /
soundfile import successfully they are preferred even for in-scope
formats (libjpeg/libpng/libsndfile are 10²–10³× faster than the
pure-Python entropy loops at corpus scale); the stdlib spec codecs in
functions/codecs.py (zlib+filters PNG, from-spec huffman+IDCT JPEG,
``wave`` WAV) are the zero-dependency fallback that keeps decode real in
this container. Out-of-scope variants for the stdlib path (progressive
JPEG, 16-bit/Adam7 PNG, FLAC, ...) also route to the native backend,
surfacing a per-row decode_error when it is absent. The generic
extract_media_features kernel is still the deterministic digest fake
(clearly marked) — its Spark-side contract (schema, Arrow batch shape,
partitioning, UDF signatures) is the tested part.
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


def _feature_kernel(payloads):
    """ONE shared per-payload kernel for the pandas and Arrow twins
    (review r4: two hand-copied loops let the 'byte-identical' twins
    drift — including the _HAVE_CODECS guard one of them lacked).
    Returns (n_bytes, content_hashes, features) lists."""
    if _HAVE_CODECS:  # pragma: no cover
        raise NotImplementedError("real codecs not wired yet")
    n_bytes, hashes, feats = [], [], []
    for p in payloads:
        n_bytes.append(len(p) if p is not None else 0)
        hashes.append(hashlib.sha256(bytes(p)).hexdigest() if p is not None else None)
        feats.append(_fake_feature(p))
    return n_bytes, hashes, feats


def extract_media_features(media: DataFrame, batch_note_col: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real plumbing: Arrow-batched binary transport, per-batch kernel calls,
    stable output schema. Kernel body is the deterministic fake above.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, hashes, feats = _feature_kernel(list(pdf["payload"]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "content_hash": hashes,
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def extract_media_features_arrow(media: DataFrame) -> DataFrame:
    """Arrow-native twin of `extract_media_features` via ``mapInArrow``
    (round 4): the binary payloads travel as Arrow buffers end-to-end —
    no pandas Series-of-python-bytes materialization between the JVM and
    the kernel, which matters when payloads are megabytes each. Output
    is identical to the pandas twin (parity-tested); the kernel body is
    the same clearly-marked deterministic digest fake."""

    def op(batches):
        import pyarrow as pa

        target = pa.schema(
            [
                ("media_id", pa.int64()),
                ("kind", pa.string()),
                ("n_bytes", pa.int64()),
                ("content_hash", pa.string()),
                ("feature", pa.list_(pa.float32())),
            ]
        )
        for batch in batches:
            payloads = batch.column(batch.schema.get_field_index("payload"))
            n_bytes, hashes, feats = _feature_kernel(
                [p.as_py() for p in payloads]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("media_id")).cast(pa.int64()),
                    batch.column(batch.schema.get_field_index("kind")).cast(pa.string()),
                    pa.array(n_bytes, pa.int64()),
                    pa.array(hashes, pa.string()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                schema=target,
            )

    return media.mapInArrow(op, schema=FEATURES_SCHEMA)


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


# ---------------------------------------------------------------------------
# REAL decode kernels (rounds 2-3): raw payloads (mime="image/raw-rgb8" =
# uint8 RGB width*height*3 bytes; "audio/pcm16" = mono int16 LE) plus
# compressed PNG/baseline-JPEG/WAV via the stdlib codecs in
# functions/codecs.py. Formats beyond those (progressive JPEG, FLAC, ...)
# need PIL/soundfile (requirements-optional.txt) and surface a clearly
# marked per-row error rather than failing the task.
# ---------------------------------------------------------------------------

RAW_RGB8 = "image/raw-rgb8"
PCM16 = "audio/pcm16"
PNG = "image/png"
JPEG = "image/jpeg"
WAV = "audio/wav"

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channel_mean", T.ArrayType(T.DoubleType()), True),
        T.StructField("channel_std", T.ArrayType(T.DoubleType()), True),
        T.StructField("thumb", T.ArrayType(T.FloatType()), True),  # out_h*out_w*3 in [0,1]
        T.StructField("decode_error", T.StringType(), True),
    ]
)

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def decode_raw_rgb8(payload: bytes, width: int, height: int):
    """Raw uint8 RGB bytes → (height, width, 3) array; validates length."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size != width * height * 3:
        raise ValueError(f"raw-rgb8 size mismatch: {arr.size} != {width}x{height}x3")
    return arr.reshape(height, width, 3)


def resize_nearest(img, out_w: int, out_h: int):
    """Nearest-neighbor resize by index striding — the real resize math."""
    import numpy as np

    h, w = img.shape[:2]
    ys = (np.arange(out_h) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(out_w) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def _pil_available() -> bool:
    """Probe the native image backend once per process (executor-side
    module state; each Python worker re-imports this module)."""
    global _PIL_OK
    if _PIL_OK is None:
        try:
            import PIL.Image  # noqa: F401

            _PIL_OK = True
        except Exception:  # noqa: BLE001
            _PIL_OK = False
    return _PIL_OK


_PIL_OK: bool | None = None


def _soundfile_available() -> bool:
    global _SF_OK
    if _SF_OK is None:
        try:
            import soundfile  # noqa: F401

            _SF_OK = True
        except Exception:  # noqa: BLE001
            _SF_OK = False
    return _SF_OK


_SF_OK: bool | None = None


def _pil_decode(mime, payload):
    """Native (PIL) image backend — preferred when importable, and the only
    path for mimes/variants beyond the stdlib codecs' scope."""
    import numpy as np

    try:
        import io

        from PIL import Image
    except Exception as exc:  # noqa: BLE001
        raise NotImplementedError(
            f"compressed mime {mime!r} variant needs PIL (requirements-optional.txt)"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(bytes(payload))).convert("RGB"))


def _decode_image(mime, payload, width, height):
    """Image decode dispatch, native-first:

    - raw-rgb8 → direct buffer reshape (no codec involved);
    - PNG/JPEG with PIL importable → PIL (libpng/libjpeg-turbo; the plan
      you want on an image-heavy corpus at 100×), stdlib spec codec as
      fallback if PIL rejects the file;
    - PNG/JPEG without PIL → stdlib spec codec (functions/codecs.py);
      out-of-scope variants (progressive/CMYK JPEG, 16-bit/Adam7 PNG)
      raise ValueError and fall through to `_pil_decode`, whose
      NotImplementedError becomes the row's decode_error;
    - anything else → PIL only.

    Lossless formats (PNG) and the DC-exact oracle fixtures (solid-color
    JPEG) decode identically on both backends — asserted by the
    cross-backend parity test (tests/test_multimodal.py)."""
    if payload is None:
        raise ValueError("null payload")
    if mime == RAW_RGB8:
        return decode_raw_rgb8(bytes(payload), int(width), int(height))
    if mime == PNG:
        from ..functions.codecs import decode_png

        if _pil_available():
            try:
                return _pil_decode(mime, payload)
            except NotImplementedError:
                raise
            except Exception:  # noqa: BLE001 — corrupt-for-PIL: let stdlib try
                return decode_png(bytes(payload))
        try:
            return decode_png(bytes(payload))
        except ValueError:
            return _pil_decode(mime, payload)  # 16-bit / Adam7 variants
    if mime == JPEG:
        from ..functions.codecs import decode_jpeg

        if _pil_available():
            try:
                return _pil_decode(mime, payload)
            except NotImplementedError:
                raise
            except Exception:  # noqa: BLE001
                return decode_jpeg(bytes(payload))
        try:
            return decode_jpeg(bytes(payload))
        except ValueError:
            return _pil_decode(mime, payload)  # progressive / CMYK variants
    return _pil_decode(mime, payload)


def image_pixel_features(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Per-image channel stats + a nearest-neighbor thumbnail over REAL
    decoded pixels (`_decode_image`: native-first, stdlib-codec fallback;
    undecodable rows get decode_error, the task never fails)."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, payload, w, h in zip(
                pdf["media_id"], pdf["mime"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                try:
                    img = _decode_image(mime, payload, w, h)
                    thumb = resize_nearest(img, out_w, out_h).astype(np.float64) / 255.0
                    rows.append(
                        (
                            mid,
                            [float(x) for x in img.reshape(-1, 3).mean(axis=0) / 255.0],
                            [float(x) for x in img.reshape(-1, 3).std(axis=0) / 255.0],
                            [float(x) for x in thumb.ravel()],
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append((mid, None, None, None, f"{type(exc).__name__}: {exc}"[:300]))
            yield pd.DataFrame(
                rows, columns=["media_id", "channel_mean", "channel_std", "thumb", "decode_error"]
            )

    return media.where(F.col("kind") == "image").mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


def _soundfile_decode(mime, payload):
    """Native (libsndfile) audio backend — preferred when importable, and
    the only path for mimes beyond PCM16/WAV (FLAC/OGG/...)."""
    try:
        import io

        import soundfile as sf
    except Exception as exc:  # noqa: BLE001
        raise NotImplementedError(
            f"audio mime {mime!r} needs soundfile (requirements-optional.txt)"
        ) from exc
    return sf.read(io.BytesIO(bytes(payload)), dtype="float64")[0].ravel()


def _decode_audio(mime, payload):
    """Audio decode dispatch, native-first (mirror of `_decode_image`):
    pcm16 is a direct buffer read; WAV prefers soundfile when importable
    with the stdlib ``wave`` decoder as fallback (and stdlib-rejected
    variants, e.g. float WAV, route to soundfile); other mimes are
    soundfile-only. Returns float64 samples in [-1, 1]."""
    import numpy as np

    if payload is None:
        raise ValueError("null payload")
    if mime == PCM16:
        return np.frombuffer(bytes(payload), dtype="<i2").astype(np.float64) / 32768.0
    if mime == WAV:
        from ..functions.codecs import decode_wav

        if _soundfile_available():
            try:
                return _soundfile_decode(mime, payload)
            except NotImplementedError:
                raise
            except Exception:  # noqa: BLE001
                return decode_wav(bytes(payload))[0].ravel()
        try:
            return decode_wav(bytes(payload))[0].ravel()
        except NotImplementedError:
            raise
        except Exception:  # noqa: BLE001 — float WAV / wave.Error variants
            return _soundfile_decode(mime, payload)
    return _soundfile_decode(mime, payload)


def audio_pcm_stats(media: DataFrame) -> DataFrame:
    """RMS/peak over decoded samples (`_decode_audio`: native-first,
    stdlib-``wave`` fallback) — real sample math."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, payload in zip(pdf["media_id"], pdf["mime"], pdf["payload"]):
                try:
                    pcm = _decode_audio(mime, payload)
                    rows.append(
                        (
                            mid,
                            int(pcm.size),
                            float(np.sqrt((pcm**2).mean())) if pcm.size else 0.0,
                            float(np.abs(pcm).max()) if pcm.size else 0.0,
                            None,
                        )
                    )
                except Exception as exc:  # noqa: BLE001
                    rows.append((mid, None, None, None, f"{type(exc).__name__}: {exc}"[:300]))
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "rms", "peak", "decode_error"])

    return media.where(F.col("kind") == "audio").mapInPandas(op, schema=AUDIO_STATS_SCHEMA)
