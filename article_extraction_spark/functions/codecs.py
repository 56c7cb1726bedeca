"""Pure-stdlib media codecs: PNG (zlib + RFC 2083 filter reconstruction),
baseline + progressive JPEG (ITU-T T.81 huffman + IDCT), and WAV (stdlib
``wave``).

The sandbox has no PIL/soundfile, but these formats don't need them — PNG
is DEFLATE plus five per-row byte filters, JPEG is huffman entropy coding
+ dequant + 8×8 IDCT, WAV is a RIFF header around raw PCM. Implemented
from the public specs so compressed-media decode in operators/
multimodal.py is REAL, with PIL/soundfile remaining optional backends
only for formats outside the scope below (CMYK JPEG, FLAC, ...).

Scope (documented, checked, errors surface per-row upstream):
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette via PLTE),
  4 (gray+alpha), 6 (RGBA), non-interlaced. Alpha is dropped (not
  composited). 16-bit and Adam7 raise ValueError.
- JPEG: baseline sequential (SOF0) AND progressive (SOF2, round 5 —
  spectral selection + successive approximation per T.81 §G.2, the
  majority variant in real web corpora), 8-bit, grayscale/YCbCr,
  4:4:4/4:2:2/4:2:0 sampling, restart markers; a single-component scan
  is decoded non-interleaved per T.81 §A.2.2 regardless of declared
  factors. Arithmetic/12-bit/CMYK/multi-scan-baseline raise ValueError;
  the media operator falls back to PIL (when importable) for those.
  Entropy decode is LUT-based (16-bit prefix table — the per-bit variant
  measured ~45× slower). Decode pinned by HAND-assembled fixtures (spec
  math) plus encoder round-trips at near-lossless quant: baseline
  (4:4:4/4:2:2/4:2:0, DRI) and a progressive encoder twin whose
  full-refinement output must decode pixel-identical to baseline.
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
    plte = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
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
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color}")
    if color == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/invalid PLTE chunk")

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
    if color == 3:  # palette lookup (depth-8 indices)
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette PNG index out of range")
        return pal[idx]
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


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81 / JFIF), pure stdlib + numpy — baseline round 3,
# progressive round 5.
#
# Scope: baseline sequential DCT (SOF0) and progressive DCT (SOF2,
# huffman), 8-bit, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0
# sampling, restart markers; arithmetic coding and 12-bit raise
# ValueError. The encoder twins emit 4:4:4 with Annex-K (baseline) /
# flat (progressive AC, includes the EOBn symbols Annex K lacks) huffman
# tables and a configurable flat quant table (quality=lossless-ish with
# all-1s) — used by the round-trip tests; decode correctness is
# additionally pinned by HAND-assembled DC-only fixtures whose expected
# pixels come from spec math, not from the encoder.
# ---------------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical huffman tables: (bits[1..16], huffval)
_STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _build_huff_decode(bits, vals):
    """(code-length table per Annex C) → dict[(length, code)] = symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huff_lut(dec_table):
    """16-bit prefix lookup: lut[p] = (symbol, code_length) for every
    16-bit window whose prefix is a code — one probe per symbol instead of
    one dict probe per BIT (the per-bit loop measured ~5 s for a 128×128
    image; review r3)."""
    lut = [None] * (1 << 16)
    for (length, code), sym in dec_table.items():
        base = code << (16 - length)
        for fill in range(1 << (16 - length)):
            lut[base | fill] = (sym, length)
    return lut


def _build_huff_encode(bits, vals):
    dec = _build_huff_decode(bits, vals)
    return {sym: (length, code) for (length, code), sym in dec.items()}


def _destuff_scan(payload: bytes, pos: int):
    """Entropy-coded scan region → (list of destuffed byte segments — one
    per restart interval, absolute offset of the terminating marker's
    0xFF). One vectorized pass finds every 0xFF: stuffed 0x00s are
    dropped, RSTn markers split segments, the first real marker (EOI /
    next segment) terminates the scan. Replaces the per-byte marker
    inspection the old bit reader did on every refill (round 4 — the
    entropy loop then reads bits with zero marker checks). The end offset
    lets the progressive decoder resume marker parsing after each scan
    (round 5)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)[pos:]
    ff = np.flatnonzero(arr[:-1] == 0xFF)
    if ff.size:
        nxt = arr[ff + 1]
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
        # bytes — an FF whose next byte is another FF is padding, not a
        # scan terminator (review r5; classification belongs to the LAST
        # FF of the run, whose next byte is the real discriminator)
        is_fill = nxt == 0xFF
        is_stuff = nxt == 0x00
        is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
        is_term = ~(is_stuff | is_rst | is_fill)
        end_i = int(ff[is_term][0]) if is_term.any() else len(arr)
        in_scan = ff < end_i
        drop_pos = np.sort(
            np.concatenate(
                [
                    ff[is_stuff & in_scan] + 1,  # the 0x00 escape bytes
                    ff[is_fill & in_scan],  # the fill FFs themselves
                ]
            )
        )
        rst_pos = [int(x) for x in ff[is_rst & in_scan]]
    else:
        end_i, drop_pos, rst_pos = len(arr), np.empty(0, np.int64), []
    segs = []
    start = 0
    for r in rst_pos + [end_i]:
        seg = arr[start:r]
        drop = drop_pos[(drop_pos >= start) & (drop_pos < r)] - start
        segs.append((np.delete(seg, drop) if drop.size else seg).tobytes())
        start = r + 2  # skip the 0xFF D0-D7 pair
    return segs, pos + end_i


def _idct_matrix():
    """M[u, x] = 0.5 · c(u) · cos((2x+1)uπ/16) — forward DCT is
    M @ block @ M.T, inverse is M.T @ coefs @ M (orthonormal)."""
    import numpy as np

    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    return 0.5 * np.where(u == 0, 1 / np.sqrt(2.0), 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)


def decode_jpeg(payload: bytes):
    """Baseline (SOF0) or progressive (SOF2) huffman JPEG bytes →
    (h, w, 3) uint8 RGB (grayscale broadcast). Progressive support is
    round 5: spectral selection + successive approximation per T.81 §G.2,
    restart markers, inter-scan DHT redefinition."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    lut_cache: dict[tuple[int, int], list] = {}
    frame = None
    progressive = False
    prog_state = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq:  # 16-bit entries
                    vals = [int.from_bytes(seg[i + 2 * j : i + 2 * j + 2], "big") for j in range(64)]
                    i += 128
                else:
                    vals = list(seg[i : i + 64])
                    i += 64
                q = np.zeros(64)
                for j, z in enumerate(_ZIGZAG):
                    q[z] = vals[j]
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = [0] + list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_huff_decode(bits, vals)
                lut_cache.pop((tc, th), None)  # progressive scans may redefine DHT
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = seg[0], int.from_bytes(seg[1:3], "big"), int.from_bytes(seg[3:5], "big"), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci], seg[7 + 3 * ci], seg[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only SOF0 baseline and SOF2 progressive huffman JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            data_start = pos + 2 + seglen
            if not progressive:
                scan = {}
                for si in range(ns):
                    cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                    scan[cs] = (tdta >> 4, tdta & 0xF)
                return _decode_scan(payload, data_start, frame, scan, qt, huff, restart_interval)
            # progressive (round 5): each scan refines the persistent
            # per-component coefficient grids; reconstruction happens once
            # at EOI. Scan header carries the spectral band Ss..Se and the
            # successive-approximation bit positions Ah (prior) / Al (this).
            scan_list = [(seg[1 + 2 * si], seg[2 + 2 * si] >> 4, seg[2 + 2 * si] & 0xF) for si in range(ns)]
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if prog_state is None:
                prog_state = _alloc_progressive(frame)
            pos = _decode_scan_progressive(
                payload, data_start, frame, scan_list, ss, se, ahal >> 4, ahal & 0xF,
                huff, lut_cache, restart_interval, prog_state,
            )
            continue
        pos += 2 + seglen
    if prog_state is not None:
        return _reconstruct_progressive(frame, qt, prog_state)
    raise ValueError("JPEG has no scan data")


def _decode_scan(payload, pos, frame, scan, qt, huff, restart_interval):
    """Entropy decode + reconstruction, batched (round 4):

    1. `_destuff_scan` — one numpy pass strips byte stuffing and splits at
       restart markers; the entropy loop below never inspects markers.
    2. Huffman/EXTEND — inherently sequential, so it stays Python, but as
       an all-LOCALS tight loop (no attribute access, no per-block numpy
       allocation) emitting sparse (flat-index, value) pairs; bits refill
       from the destuffed bytes six at a time via ``int.from_bytes``.
    3. Everything per-block numpy used to do one 8×8 at a time now runs
       once over ALL blocks: scatter the sparse coefficients, dequantize
       (zigzag-order tables), de-zigzag by fancy index, batched IDCT via
       broadcast matmul (same float64 op order as the per-block version),
       and a transpose/reshape scatter into each component plane.

    Measured ≥2× on the jpeg_decode fixture set vs the round-3 per-block
    loop (see BASELINE.md)."""
    import numpy as np

    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise ValueError(
            f"unsupported JPEG component count {len(comps)} (grayscale/YCbCr only — CMYK?)"
        )
    if len(scan) != len(comps):
        raise ValueError("multi-scan baseline JPEG unsupported (one interleaved scan only)")
    if len(comps) == 1:
        # a single-component scan is NON-interleaved per T.81 §A.2.2:
        # blocks are raster-ordered 8×8 regardless of declared sampling
        # factors (review r3: honoring h/v>1 here tiled blocks in MCU order)
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    luts = {k: _build_huff_lut(v) for k, v in huff.items()}

    # block schedule within one MCU, scan order: component-major, (by, bx)
    sched = []
    for ci, c in enumerate(comps):
        dc_lut = luts[(0, scan[c["id"]][0])]
        ac_lut = luts[(1, scan[c["id"]][1])]
        sched.extend([(ci, dc_lut, ac_lut)] * (c["v"] * c["h"]))
    bpm = len(sched)
    total_mcus = mcus_x * mcus_y
    total_blocks = total_mcus * bpm
    ncomp = len(comps)

    segs, _scan_end = _destuff_scan(payload, pos)
    interval = restart_interval if restart_interval else total_mcus
    # typed arrays, not python lists: 8 B/entry instead of ~50 (a dense
    # 24-MP image has ~10^7 coefficients — review r4); append speed is
    # comparable and np.frombuffer reads them without copying
    from array import array

    idxs = array("q")
    vals = array("q")
    idx_app, val_app = idxs.append, vals.append  # locals: hot-loop bound
    mcu = 0
    for seg in segs:
        if mcu >= total_mcus:
            break
        n_seg = min(interval, total_mcus - mcu)
        pred = [0] * ncomp  # DC predictors reset at every restart
        data, p, buf, nbits = seg, 0, 0, 0
        base = mcu * bpm * 64
        for _ in range(n_seg):
            for ci, dc_lut, ac_lut in sched:
                # keep ≥32 buffered bits: one huffman code (≤16) plus one
                # magnitude field (≤16) never needs a mid-symbol refill
                while nbits < 32:
                    chunk = data[p : p + 6]
                    if chunk:
                        p += len(chunk)
                        buf = ((buf & ((1 << nbits) - 1)) << (8 * len(chunk))) | int.from_bytes(
                            chunk, "big"
                        )
                        nbits += 8 * len(chunk)
                    else:  # stream exhausted: zero-pad, as the r3 reader did
                        buf = (buf & ((1 << nbits) - 1)) << 32
                        nbits += 32
                hit = dc_lut[(buf >> (nbits - 16)) & 0xFFFF]
                if hit is None:
                    raise ValueError("invalid JPEG huffman code")
                t, ln = hit
                nbits -= ln
                if t:
                    v = (buf >> (nbits - t)) & ((1 << t) - 1)
                    nbits -= t
                    pred[ci] += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                idx_app(base)
                val_app(pred[ci])
                k = 1
                while k < 64:
                    # WHILE, not if: a short tail chunk (stream end) can
                    # leave nbits below even the 16-bit peek — the single-
                    # refill variant crashed on negative shift (review r4)
                    while nbits < 32:
                        chunk = data[p : p + 6]
                        if chunk:
                            p += len(chunk)
                            buf = ((buf & ((1 << nbits) - 1)) << (8 * len(chunk))) | int.from_bytes(
                                chunk, "big"
                            )
                            nbits += 8 * len(chunk)
                        else:
                            buf = (buf & ((1 << nbits) - 1)) << 32
                            nbits += 32
                    hit = ac_lut[(buf >> (nbits - 16)) & 0xFFFF]
                    if hit is None:
                        raise ValueError("invalid JPEG huffman code")
                    rs, ln = hit
                    nbits -= ln
                    s = rs & 0xF
                    if s == 0:
                        if rs == 0xF0:  # ZRL: 16 zeros
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("JPEG AC run overflow")
                    v = (buf >> (nbits - s)) & ((1 << s) - 1)
                    nbits -= s
                    idx_app(base + k)
                    val_app(v if v >= (1 << (s - 1)) else v - (1 << s) + 1)
                    k += 1
                base += 64
        mcu += n_seg

    # ---- batched reconstruction, CHUNKED over block ranges ----
    # Bounded transients (review r4): an all-blocks-at-once coefs/
    # natural/spatial trio is ~3×290 MB on a 24-MP 4:2:0 image. Blocks
    # are processed in fixed-size ranges (the sparse idx stream is
    # block-ordered by construction, so each range is a contiguous slice
    # via searchsorted) and scattered straight into per-component
    # (rows, cols, 8, 8) grids — the grids are the planes' own storage,
    # so peak memory is planes + O(CHUNK) temporaries, like the r3
    # per-block loop. The per-chunk matmul keeps the batched-IDCT win.
    zig = np.asarray(_ZIGZAG)
    idx_arr = np.frombuffer(idxs, dtype=np.int64) if idxs else np.empty(0, np.int64)
    val_arr = np.frombuffer(vals, dtype=np.int64) if vals else np.empty(0, np.int64)
    sched_ci = np.asarray([e[0] for e in sched], dtype=np.int64)
    # quant tables in zigzag order so dequant happens before de-zigzag
    qz = np.stack([qt[c["tq"]].reshape(64)[zig] for c in comps])
    idct = _idct_matrix()

    # per-component scatter geometry: for each block of comp ci in scan
    # order, its global block index and (block-row, block-col) in the
    # component grid — vectorized over MCUs
    m = np.arange(total_mcus, dtype=np.int64)
    geom = []
    pos_in_mcu = 0
    parts: list[list] = [[] for _ in comps]
    for ci, c in enumerate(comps):
        for by in range(c["v"]):
            for bx in range(c["h"]):
                parts[ci].append(
                    (
                        m * bpm + pos_in_mcu,
                        (m // mcus_x) * c["v"] + by,
                        (m % mcus_x) * c["h"] + bx,
                    )
                )
                pos_in_mcu += 1
    for ci in range(ncomp):
        geom.append(tuple(np.concatenate(a) for a in zip(*parts[ci])))
    grids = [
        np.empty((mcus_y * c["v"], mcus_x * c["h"], 8, 8)) for c in comps
    ]

    CHUNK = 1 << 16  # 64k blocks ≈ 32 MB per float64 temp
    for start in range(0, total_blocks, CHUNK):
        end = min(start + CHUNK, total_blocks)
        nb = end - start
        lo = np.searchsorted(idx_arr, start * 64)
        hi = np.searchsorted(idx_arr, end * 64)
        coefs = np.zeros((nb, 64))
        coefs.reshape(-1)[idx_arr[lo:hi] - start * 64] = val_arr[lo:hi]
        ci_of = sched_ci[(start + np.arange(nb, dtype=np.int64)) % bpm]
        coefs *= qz[ci_of]
        natural = np.empty_like(coefs)
        natural[:, zig] = coefs
        spatial = idct.T @ natural.reshape(-1, 8, 8) @ idct + 128.0
        for ci in range(ncomp):
            g_all, rb_all, cb_all = geom[ci]
            sel = (g_all >= start) & (g_all < end)
            if sel.any():
                grids[ci][rb_all[sel], cb_all[sel]] = spatial[g_all[sel] - start]

    # grids → planes, then the shared upsample/crop/colorspace tail
    planes = [
        grids[ci].transpose(0, 2, 1, 3).reshape(mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)
        for ci, c in enumerate(comps)
    ]
    return _planes_to_rgb(planes, comps, hmax, vmax, h, w)


def _planes_to_rgb(planes, comps, hmax, vmax, h, w):
    """Per-component sample planes (block-padded resolution) → (h, w, 3)
    uint8 RGB: nearest-neighbor chroma upsample, crop to the frame size,
    BT.601 YCbCr→RGB. Shared by the baseline and progressive decoders."""
    import numpy as np

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _Bits:
    """MSB-first bit reader over one destuffed entropy segment. Keeps a
    ≥16-bit buffer so a huffman LUT probe is a single peek; zero-pads at
    stream end like the baseline reader (T.81 allows the final entropy
    bits to be 1-padded — over-reads decode to garbage the block loop
    never uses)."""

    __slots__ = ("d", "p", "buf", "n")

    def __init__(self, d):
        self.d = d
        self.p = 0
        self.buf = 0
        self.n = 0

    def _fill(self):
        c = self.d[self.p : self.p + 6]
        if c:
            self.p += len(c)
            self.buf = ((self.buf & ((1 << self.n) - 1)) << (8 * len(c))) | int.from_bytes(c, "big")
            self.n += 8 * len(c)
        else:
            self.buf = (self.buf & ((1 << self.n) - 1)) << 32
            self.n += 32

    def get(self, k):
        while self.n < k:
            self._fill()
        self.n -= k
        return (self.buf >> self.n) & ((1 << k) - 1)

    def huff(self, lut):
        while self.n < 16:
            self._fill()
        hit = lut[(self.buf >> (self.n - 16)) & 0xFFFF]
        if hit is None:
            raise ValueError("invalid JPEG huffman code")
        sym, ln = hit
        self.n -= ln
        return sym

    def recv_extend(self, t):
        """RECEIVE + EXTEND (T.81 F.2.2.1): t magnitude bits → signed."""
        if t == 0:
            return 0
        v = self.get(t)
        return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _alloc_progressive(frame):
    """Persistent per-component DCT coefficient grids for a progressive
    frame, flat (n_blocks, 64) int32 in zigzag coefficient order, MCU-
    padded so interleaved DC scans and non-interleaved AC scans address
    the same storage. dims[ci] = (block_rows, block_cols, padded_cols):
    non-interleaved scans cover only the component's true sample region
    (T.81 §A.2.2), which can be narrower than the MCU-padded grid."""
    import numpy as np

    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise ValueError(
            f"unsupported JPEG component count {len(comps)} (grayscale/YCbCr only — CMYK?)"
        )
    if len(comps) == 1:
        # single-component frames are non-interleaved everywhere: sampling
        # factors do not tile blocks (same rule as the baseline decoder)
        comps = [dict(comps[0], h=1, v=1)]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids, dims = [], []
    for c in comps:
        rows, cols = mcus_y * c["v"], mcus_x * c["h"]
        grids.append(np.zeros((rows * cols, 64), dtype=np.int32))
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        dims.append((-(-ch // 8), -(-cw // 8), cols))
    return {
        "comps": comps,
        "hmax": hmax,
        "vmax": vmax,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "grids": grids,
        "dims": dims,
    }


def _decode_scan_progressive(
    payload, pos, frame, scan_list, ss, se, ah, al, huff, lut_cache, restart_interval, state
):
    """One progressive scan (T.81 §G.2): updates the coefficient grids in
    place and returns the absolute payload offset of the terminating
    marker so decode_jpeg's marker loop can resume. The four scan kinds
    (DC/AC × first/refinement) follow the spec's figures G.2/G.7 — the AC
    refinement control flow mirrors the well-known libjpeg structure
    (skip r ZERO-HISTORY coefficients, emitting one correction bit at
    every nonzero-history coefficient passed). scan_list is the ordered
    [(component-id, dc-table, ac-table)] from the SOS header."""
    comps = state["comps"]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    grids = state["grids"]
    segs, scan_end = _destuff_scan(payload, pos)

    def lut(tc, th):
        key = (tc, th)
        if key not in lut_cache:
            if key not in huff:
                raise ValueError("JPEG scan references undefined huffman table")
            lut_cache[key] = _build_huff_lut(huff[key])
        return lut_cache[key]

    # decode-order schedule: (component index, flat block index)
    if len(scan_list) > 1:
        if ss != 0:
            raise ValueError("progressive AC scans must be single-component (T.81 §G.1.1.1.1)")
        mcus_x, mcus_y = state["mcus_x"], state["mcus_y"]
        order = []
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for cs, _td, _ta in scan_list:
                ci = by_id[cs]
                c = comps[ci]
                cols = mcus_x * c["h"]
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        order.append((ci, (my * c["v"] + byy) * cols + mx * c["h"] + bxx))
        bpm = len(order) // (mcus_x * mcus_y)
        per_seg = restart_interval * bpm if restart_interval else len(order)
    else:
        ci = by_id[scan_list[0][0]]
        bh, bw, cols = state["dims"][ci]
        order = [(ci, byy * cols + bxx) for byy in range(bh) for bxx in range(bw)]
        per_seg = restart_interval if restart_interval else len(order)
    per_seg = max(per_seg, 1)

    if ss == 0 and ah == 0:
        # ---- DC first scan: diff-coded (DC >> Al), stored << Al ----
        dlut = {}
        for cs, td, _ta in scan_list:
            dlut[by_id[cs]] = lut(0, td)
        for s0 in range(0, len(order), per_seg):
            b = _Bits(segs[s0 // per_seg] if s0 // per_seg < len(segs) else b"")
            preds = [0] * len(comps)
            for ci2, blk in order[s0 : s0 + per_seg]:
                preds[ci2] += b.recv_extend(b.huff(dlut[ci2]))
                grids[ci2][blk, 0] = preds[ci2] << al
    elif ss == 0:
        # ---- DC refinement: one raw bit per block, ORed at Al ----
        bit = 1 << al
        for s0 in range(0, len(order), per_seg):
            b = _Bits(segs[s0 // per_seg] if s0 // per_seg < len(segs) else b"")
            for ci2, blk in order[s0 : s0 + per_seg]:
                if b.get(1):
                    grids[ci2][blk, 0] |= bit
    elif ah == 0:
        # ---- AC first scan over band Ss..Se, EOBn run skipping ----
        aclut = lut(1, scan_list[0][2])
        fb = grids[order[0][0]]
        for s0 in range(0, len(order), per_seg):
            b = _Bits(segs[s0 // per_seg] if s0 // per_seg < len(segs) else b"")
            eobrun = 0
            for _ci2, blk in order[s0 : s0 + per_seg]:
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = b.huff(aclut)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += b.get(r)
                            break
                        k += 16  # ZRL
                    else:
                        k += r
                        if k > se:
                            raise ValueError("JPEG AC run overflow")
                        fb[blk, k] = b.recv_extend(s) << al
                        k += 1
    else:
        # ---- AC refinement: append one magnitude bit at Al ----
        aclut = lut(1, scan_list[0][2])
        fb = grids[order[0][0]]
        p1, m1 = 1 << al, -(1 << al)
        for s0 in range(0, len(order), per_seg):
            b = _Bits(segs[s0 // per_seg] if s0 // per_seg < len(segs) else b"")
            eobrun = 0
            for _ci2, blk in order[s0 : s0 + per_seg]:
                row = fb[blk].tolist()
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = b.huff(aclut)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += b.get(r)
                                break
                            sval = 0  # ZRL: 16 zero-history coefficients
                        else:
                            sval = p1 if b.get(1) else m1
                        while k <= se:
                            c0 = row[k]
                            if c0:
                                # nonzero history → correction bit ("1 if
                                # the magnitude grows at this bit plane")
                                if b.get(1) and not (c0 & p1):
                                    row[k] = c0 + (p1 if c0 >= 0 else m1)
                            else:
                                if r == 0:
                                    break  # the (r+1)-th zero-history slot
                                r -= 1
                            k += 1
                        if sval and k <= se:
                            row[k] = sval  # newly-nonzero placement
                        k += 1
                if eobrun:
                    # EOB-covered remainder: correction bits only
                    while k <= se:
                        c0 = row[k]
                        if c0 and b.get(1) and not (c0 & p1):
                            row[k] = c0 + (p1 if c0 >= 0 else m1)
                        k += 1
                    eobrun -= 1
                fb[blk] = row
    return scan_end


def _reconstruct_progressive(frame, qt, state):
    """Accumulated coefficient grids → RGB: chunked dequant (zigzag-order
    tables) + de-zigzag + batched IDCT per component, then the shared
    plane tail. Chunking bounds float64 transients the same way the
    baseline reconstruction does (the int32 grids themselves are the only
    full-image allocation)."""
    import numpy as np

    comps = state["comps"]
    h, w = frame["h"], frame["w"]
    zig = np.asarray(_ZIGZAG)
    idct = _idct_matrix()
    planes = []
    for ci, c in enumerate(comps):
        rows, cols = state["mcus_y"] * c["v"], state["mcus_x"] * c["h"]
        qz = qt[c["tq"]].reshape(64)[zig]
        g = state["grids"][ci].reshape(rows, cols, 64)
        plane = np.empty((rows * 8, cols * 8))
        chunk_rows = max(1, (1 << 16) // max(cols, 1))
        for r0 in range(0, rows, chunk_rows):
            nr = min(chunk_rows, rows - r0)
            sub = g[r0 : r0 + nr].reshape(-1, 64).astype(np.float64) * qz
            nat = np.empty_like(sub)
            nat[:, zig] = sub
            sp = idct.T @ nat.reshape(-1, 8, 8) @ idct + 128.0
            plane[r0 * 8 : (r0 + nr) * 8] = (
                sp.reshape(nr, cols, 8, 8).transpose(0, 2, 1, 3).reshape(nr * 8, cols * 8)
            )
        planes.append(plane)
    return _planes_to_rgb(planes, comps, state["hmax"], state["vmax"], h, w)


def _pack_entropy(out_bits) -> bytes:
    """(length, code) pairs → entropy bytes: MSB-first packing, 0xFF byte
    stuffing, trailing 1-padding. ``("flush", n)`` sentinels byte-align
    with 1-padding and emit RSTn. Shared by both JPEG encoders."""
    body = bytearray()
    acc, nacc = 0, 0
    for length, code in out_bits:
        if length == "flush":
            if nacc:
                b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
                body.append(b)
                if b == 0xFF:
                    body.append(0x00)
                acc, nacc = 0, 0
            body += bytes([0xFF, 0xD0 + code])
            continue
        acc = (acc << length) | (code & ((1 << length) - 1))
        nacc += length
        while nacc >= 8:
            nacc -= 8
            b = (acc >> nacc) & 0xFF
            body.append(b)
            if b == 0xFF:
                body.append(0x00)
    if nacc:
        b = ((acc << (8 - nacc)) | ((1 << (8 - nacc)) - 1)) & 0xFF
        body.append(b)
        if b == 0xFF:
            body.append(0x00)
    return bytes(body)


def encode_jpeg(img, quant: int = 1, subsample=False, restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 → baseline JFIF bytes: 4:4:4 by default,
    ``subsample=True``/``"420"`` for 4:2:0 (chroma 2×2-averaged, MCU = 4 Y
    + Cb + Cr) or ``"422"`` (chroma averaged horizontally, MCU = 2 Y + Cb
    + Cr) — exercising the decoder's sampling/upsample paths.
    ``restart_interval=N`` emits DRI + RSTn markers every N MCUs (decoder
    resync path). Flat quant table of ``quant`` (1 ≈ near-lossless),
    standard Annex-K luma huffman tables for ALL components. Encoder twin
    for round-trip tests."""
    import numpy as np

    mode = {False: "444", True: "420", "420": "420", "422": "422", "444": "444"}[subsample]
    arr = np.asarray(img, dtype=np.float64)
    h, w = arr.shape[:2]
    y = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    cb = -0.168736 * arr[:, :, 0] - 0.331264 * arr[:, :, 1] + 0.5 * arr[:, :, 2] + 128.0
    cr = 0.5 * arr[:, :, 0] - 0.418688 * arr[:, :, 1] - 0.081312 * arr[:, :, 2] + 128.0

    mcu_h = 16 if mode == "420" else 8
    mcu_w = 16 if mode in ("420", "422") else 8
    ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    y = np.pad(y, ((0, ph - h), (0, pw - w)), mode="edge")
    cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
    crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
    if mode == "420":  # 2x2 block average
        cbp = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    elif mode == "422":  # horizontal-only average
        cbp = cbp.reshape(ph, pw // 2, 2).mean(axis=2)
        crp = crp.reshape(ph, pw // 2, 2).mean(axis=2)

    idct = _idct_matrix()  # forward DCT = M @ block @ M.T
    dc_enc = _build_huff_encode(*_STD_DC_LUMA)
    ac_enc = _build_huff_encode(_STD_AC_LUMA_BITS, _STD_AC_LUMA_VALS)

    out_bits: list[tuple[int, int]] = []

    def emit(length, code):
        out_bits.append((length, code))

    def emit_coef(v):
        t = 0 if v == 0 else max(v.bit_length(), (-v).bit_length())
        return t, (v if v >= 0 else v + (1 << t) - 1)

    pred = [0, 0, 0]

    def encode_block(p, by, bx, ci):
        block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coefs = idct @ block @ idct.T
        qz = np.round(coefs / quant).astype(int)
        zz = [int(qz[z // 8][z % 8]) for z in _ZIGZAG]
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        t, bitsv = emit_coef(diff)
        L, C = dc_enc[t]
        emit(L, C)
        if t:
            emit(t, bitsv)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                L, C = ac_enc[0xF0]
                emit(L, C)
                run -= 16
            t, bitsv = emit_coef(zz[k])
            L, C = ac_enc[(run << 4) | t]
            emit(L, C)
            emit(t, bitsv)
            run = 0
        if last_nz < 63:
            L, C = ac_enc[0x00]
            emit(L, C)

    def flush_and_restart(n):
        """Byte-align with 1-padding, emit RSTn, reset DC predictors."""
        nonlocal pred
        out_bits.append(("flush", n % 8))
        pred = [0, 0, 0]

    mcu_idx = 0
    rst = 0
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                flush_and_restart(rst)
                rst += 1
            if mode == "420":
                for by in range(2):          # 4 luma blocks per MCU
                    for bx in range(2):
                        encode_block(y, my * 2 + by, mx * 2 + bx, 0)
                encode_block(cbp, my, mx, 1)
                encode_block(crp, my, mx, 2)
            elif mode == "422":
                for bx in range(2):          # 2 luma blocks per MCU
                    encode_block(y, my, mx * 2 + bx, 0)
                encode_block(cbp, my, mx, 1)
                encode_block(crp, my, mx, 2)
            else:
                for ci, p in enumerate((y, cbp, crp)):
                    encode_block(p, my, mx, ci)
            mcu_idx += 1

    body = _pack_entropy(out_bits)

    def seg(marker, payload_):
        return bytes([0xFF, marker]) + (len(payload_) + 2).to_bytes(2, "big") + payload_

    qtab = bytes([0]) + bytes([quant] * 64)
    dqt = seg(0xDB, qtab)
    ysamp = {"420": 0x22, "422": 0x21, "444": 0x11}[mode]
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
            [3, 1, ysamp, 0, 2, 0x11, 0, 3, 0x11, 0]
        ),
    )
    dbits, dvals = _STD_DC_LUMA
    dht_dc = seg(0xC4, bytes([0x00] + dbits[1:]) + bytes(dvals))
    dht_ac = seg(0xC4, bytes([0x10] + _STD_AC_LUMA_BITS[1:]) + bytes(_STD_AC_LUMA_VALS))
    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos + bytes(body) + b"\xff\xd9"


# progressive AC scans emit EOBn run-length symbols (0x10..0xE0) that the
# Annex-K baseline tables lack, so the progressive encoder carries a flat
# canonical table: all 256 run/size symbols, 128 at 8 bits + 128 at 9
# bits (DHT stores one count byte per length, so a single 256-wide length
# is unrepresentable; Kraft sum 0.75, all-ones codewords unassigned)
_PROG_AC_BITS = [0] * 8 + [128, 128] + [0] * 7
_PROG_AC_VALS = list(range(256))


def encode_jpeg_progressive(img, quant: int = 1, restart_interval: int = 0, band_split: int = 6) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 → progressive JFIF (SOF2)
    bytes, 4:4:4. Encoder twin for the progressive decoder's round-trip
    tests — the scan script exercises every T.81 §G scan kind:

      1. DC first (interleaved for color), Ah=0 → Al=1
      2. AC first, luma band 1..band_split-1, Al=1
      3. AC first, luma band band_split..63, Al=1  (spectral selection)
      4-5. AC first, chroma 1..63, Al=1
      6. DC refinement, Ah=1 → Al=0 (raw bits)
      7-10. AC refinement of the same bands, Ah=1 → Al=0

    Coefficients are identical to the baseline encoder's (same forward
    DCT, same flat quant table), so after the refinement scans the decode
    must reproduce the baseline decode exactly. ``restart_interval=N``
    emits RSTn every N MCUs (interleaved scan) / N blocks (single-
    component scans), resetting DC predictors and EOB runs."""
    import numpy as np

    arr = np.asarray(img, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr]
    else:
        planes = [
            0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2],
            -0.168736 * arr[:, :, 0] - 0.331264 * arr[:, :, 1] + 0.5 * arr[:, :, 2] + 128.0,
            0.5 * arr[:, :, 0] - 0.418688 * arr[:, :, 1] - 0.081312 * arr[:, :, 2] + 128.0,
        ]
    ncomp = len(planes)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    bh, bw = ph // 8, pw // 8
    nblocks = bh * bw
    fdct = _idct_matrix()  # forward DCT = M @ block @ M.T
    coefs = []
    for p in planes:
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
        cz = np.round((fdct @ blocks @ fdct.T) / quant).astype(np.int64).reshape(-1, 64)
        coefs.append(cz[:, _ZIGZAG])  # zigzag coefficient order

    dc_enc = _build_huff_encode(*_STD_DC_LUMA)
    ac_enc = _build_huff_encode(_PROG_AC_BITS, _PROG_AC_VALS)

    def scan_dc_first(al):
        out = []
        pred = [0] * ncomp
        rst = 0
        for m in range(nblocks):
            if restart_interval and m and m % restart_interval == 0:
                out.append(("flush", rst % 8))
                rst += 1
                pred = [0] * ncomp
            for ci in range(ncomp):
                v = int(coefs[ci][m, 0]) >> al  # arithmetic shift (G.1.2.1)
                diff = v - pred[ci]
                pred[ci] = v
                t = diff.bit_length() if diff >= 0 else (-diff).bit_length()
                out.append(dc_enc[t])
                if t:
                    out.append((t, diff if diff >= 0 else diff + (1 << t) - 1))
        return out

    def scan_dc_refine(al):
        out = []
        rst = 0
        for m in range(nblocks):
            if restart_interval and m and m % restart_interval == 0:
                out.append(("flush", rst % 8))
                rst += 1
            for ci in range(ncomp):
                out.append((1, (int(coefs[ci][m, 0]) >> al) & 1))
        return out

    def scan_ac_first(ci, ss, se, al):
        out = []
        eobrun = 0
        rst = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                out.append(ac_enc[r << 4])
                if r:
                    out.append((r, eobrun - (1 << r)))
                eobrun = 0

        for m in range(nblocks):
            if restart_interval and m and m % restart_interval == 0:
                flush_eob()
                out.append(("flush", rst % 8))
                rst += 1
            row = coefs[ci][m]
            # successive-approximation point transform: magnitude shift,
            # truncation toward zero (G.1.2.2)
            sv = [
                (abs(int(row[k])) >> al) * (1 if row[k] >= 0 else -1) for k in range(ss, se + 1)
            ]
            last = -1
            for j in range(len(sv) - 1, -1, -1):
                if sv[j]:
                    last = j
                    break
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            for j in range(last + 1):
                v = sv[j]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    out.append(ac_enc[0xF0])  # ZRL
                    run -= 16
                t = abs(v).bit_length()
                out.append(ac_enc[(run << 4) | t])
                out.append((t, v if v >= 0 else v + (1 << t) - 1))
                run = 0
            if last < se - ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return out

    def scan_ac_refine(ci, ss, se, al):
        # libjpeg's encode_mcu_AC_refine structure: correction bits for
        # nonzero-history coefficients ride buffered behind the next
        # symbol (BR) or the next EOBn (BE)
        out = []
        eobrun = 0
        be: list[int] = []
        rst = 0

        def flush_eob():
            nonlocal eobrun, be
            if eobrun:
                r = eobrun.bit_length() - 1
                out.append(ac_enc[r << 4])
                if r:
                    out.append((r, eobrun - (1 << r)))
                out.extend((1, bb) for bb in be)
                be = []
                eobrun = 0

        for m in range(nblocks):
            if restart_interval and m and m % restart_interval == 0:
                flush_eob()
                out.append(("flush", rst % 8))
                rst += 1
            row = coefs[ci][m]
            absv = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
            eobpos = -1
            for j, t in enumerate(absv):
                if t == 1:
                    eobpos = j
            r = 0
            br: list[int] = []
            for j, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and j <= eobpos:  # ZRLs not foldable into EOB
                    flush_eob()
                    out.append(ac_enc[0xF0])
                    r -= 16
                    out.extend((1, bb) for bb in br)
                    br = []
                if t > 1:
                    br.append(t & 1)  # already nonzero: correction bit only
                    continue
                flush_eob()
                out.append(ac_enc[(r << 4) | 1])
                out.append((1, 1 if row[ss + j] >= 0 else 0))
                out.extend((1, bb) for bb in br)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF or len(be) > 900:
                    flush_eob()
        flush_eob()
        return out

    def seg(marker, payload_):
        return bytes([0xFF, marker]) + (len(payload_) + 2).to_bytes(2, "big") + payload_

    def sos(comp_ids, ss, se, ah, al, ac):
        b = bytes([len(comp_ids)])
        for cid in comp_ids:
            b += bytes([cid, 0x01 if ac else 0x00])  # DC table 0, AC table 1
        return seg(0xDA, b + bytes([ss, se, (ah << 4) | al]))

    all_ids = list(range(1, ncomp + 1))
    pieces = []
    pieces.append(sos(all_ids, 0, 0, 0, 1, ac=False) + _pack_entropy(scan_dc_first(1)))
    bands = [(0, 1, band_split - 1), (0, band_split, 63)] + [(ci, 1, 63) for ci in range(1, ncomp)]
    for ci, ss, se in bands:
        pieces.append(sos([ci + 1], ss, se, 0, 1, ac=True) + _pack_entropy(scan_ac_first(ci, ss, se, 1)))
    pieces.append(sos(all_ids, 0, 0, 1, 0, ac=False) + _pack_entropy(scan_dc_refine(0)))
    for ci, ss, se in bands:
        pieces.append(sos([ci + 1], ss, se, 1, 0, ac=True) + _pack_entropy(scan_ac_refine(ci, ss, se, 0)))

    qtab = bytes([0]) + bytes([quant] * 64)
    sof_comps = bytes([ncomp]) + b"".join(bytes([cid, 0x11, 0]) for cid in all_ids)
    sof = seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + sof_comps)
    dbits, dvals = _STD_DC_LUMA
    dht_dc = seg(0xC4, bytes([0x00] + dbits[1:]) + bytes(dvals))
    dht_ac = seg(0xC4, bytes([0x11] + _PROG_AC_BITS[1:]) + bytes(_PROG_AC_VALS))
    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    return (
        b"\xff\xd8" + seg(0xDB, qtab) + sof + dht_dc + dht_ac + dri + b"".join(pieces) + b"\xff\xd9"
    )
