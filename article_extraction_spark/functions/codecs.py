"""Pure-stdlib media codecs: PNG (zlib + RFC 2083 filter reconstruction)
and WAV (stdlib ``wave``).

The sandbox has no PIL/soundfile, but these two formats don't need them —
PNG is DEFLATE (stdlib ``zlib``) plus five per-row byte filters, WAV is a
RIFF header around raw PCM (stdlib ``wave``). Implemented from the public
specs so compressed-media decode in operators/multimodal.py is REAL, with
PIL/soundfile remaining the optional backends for every other format
(JPEG, FLAC, ...).

Scope (documented, checked, errors surface per-row upstream):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA), non-interlaced. Alpha is dropped (not composited). Palette
  (type 3), 16-bit, and Adam7 raise ValueError.
- WAV: integer PCM 8/16/32-bit, any channel count (channels preserved).
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _unfilter_avg_row(cur: list, prev: list, stride: int, bpp: int) -> list:
    """Average filter reconstruction — plain-Python ints (the x-recurrence
    is sequential; numpy SCALAR ops per byte are ~20× slower than int math,
    review r3)."""
    for x in range(stride):
        left = cur[x - bpp] if x >= bpp else 0
        cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
    return cur


def _unfilter_paeth_row(cur: list, prev: list, stride: int, bpp: int) -> list:
    """Paeth predictor reconstruction (PNG spec §6.6) — plain-Python ints."""
    for x in range(stride):
        a = cur[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        p = a + b - c
        pa = p - a if p >= a else a - p
        pb = p - b if p >= b else b - p
        pc = p - c if p >= c else c - p
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = c
        cur[x] = (cur[x] + pred) & 0xFF
    return cur


def decode_png(payload: bytes):
    """PNG bytes → (height, width, 3) uint8 RGB array. stdlib-only.

    Chunk walk → concatenated IDAT inflate → per-row unfilter (None/Sub/Up/
    Average/Paeth) → channel normalization to RGB (gray broadcast, alpha
    dropped)."""
    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    ihdr = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if interlace:
        raise ValueError("Adam7 interlaced PNG unsupported")
    if comp or filt:
        raise ValueError("nonstandard PNG compression/filter method")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color} (palette?)")

    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int16)  # headroom for filter arithmetic

    out = np.empty((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        cur = rows[y].copy()
        ft = ftypes[y]
        if ft == 0:
            pass
        elif ft == 1:  # Sub: out[x] = raw[x] + out[x-bpp] ⇒ per-lane
            # cumulative sum with natural uint8 wraparound
            cur = (
                np.cumsum(cur.astype(np.uint8).reshape(width, bpp), axis=0, dtype=np.uint8)
                .reshape(stride)
                .astype(np.int16)
            )
        elif ft == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ft == 3:  # Average — sequential x-recurrence, python-int loop
            cur = np.asarray(
                _unfilter_avg_row(cur.tolist(), prev.tolist(), stride, bpp),
                dtype=np.int16,
            )
        elif ft == 4:  # Paeth — sequential x-recurrence, python-int loop
            cur = np.asarray(
                _unfilter_paeth_row(cur.tolist(), prev.tolist(), stride, bpp),
                dtype=np.int16,
            )
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur
        prev = cur.astype(np.int16)

    img = out.reshape(height, width, channels)
    if color == 0:
        return np.repeat(img, 3, axis=2)
    if color == 2:
        return img
    if color == 4:
        return np.repeat(img[:, :, :1], 3, axis=2)  # drop alpha
    return np.ascontiguousarray(img[:, :, :3])  # RGBA → drop alpha


def encode_png(img) -> bytes:
    """(h, w, 3) uint8 RGB array → PNG bytes (filter 0 rows, stdlib zlib).
    Fixture/writer twin of decode_png; valid per the spec (CRCs included)."""
    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes):
    """WAV bytes → (samples float64 in [-1, 1] shaped (n_frames, channels),
    sample_rate). Integer PCM only (stdlib ``wave`` limitation)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        nch = wf.getnchannels()
        sampwidth = wf.getsampwidth()
        rate = wf.getframerate()
        nframes = wf.getnframes()
        frames = wf.readframes(nframes)
    if sampwidth == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sampwidth == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    return arr.reshape(-1, nch), rate


def encode_wav(samples, rate: int = 16000) -> bytes:
    """(n, channels) or (n,) float in [-1, 1] → 16-bit PCM WAV bytes."""
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()
