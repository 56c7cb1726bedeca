"""Charset detection ladder (extract/charset.py, round 5)."""

from __future__ import annotations

import codecs

from article_extraction_spark.extract.charset import (
    detect_decode,
    sniff_declared_charset,
)


def test_bom_detection_all_variants():
    s = "héllo — €"
    assert detect_decode(codecs.BOM_UTF8 + s.encode("utf-8")) == (s, "utf-8", 1.0)
    for enc in ["utf-16-le", "utf-16-be", "utf-32-le", "utf-32-be"]:
        bom = {
            "utf-16-le": codecs.BOM_UTF16_LE,
            "utf-16-be": codecs.BOM_UTF16_BE,
            "utf-32-le": codecs.BOM_UTF32_LE,
            "utf-32-be": codecs.BOM_UTF32_BE,
        }[enc]
        assert detect_decode(bom + s.encode(enc)) == (s, enc, 1.0)


def test_utf32_bom_beats_utf16_prefix():
    # BOM_UTF32_LE starts with BOM_UTF16_LE — order matters
    s = "abc"
    text, enc, conf = detect_decode(codecs.BOM_UTF32_LE + s.encode("utf-32-le"))
    assert (text, enc, conf) == (s, "utf-32-le", 1.0)


def test_strict_utf8_and_ascii():
    assert detect_decode("héllo €".encode("utf-8")) == ("héllo €", "utf-8", 0.99)
    assert detect_decode(b"plain ascii") == ("plain ascii", "utf-8", 0.99)


def test_declared_charset_honored_and_lying_label_falls_through():
    body = '<meta charset="windows-1252"><p>café €</p>'
    assert detect_decode(body.encode("windows-1252")) == (body, "windows-1252", 0.9)
    # http-equiv style
    b2 = '<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">é'
    text, enc, conf = detect_decode(b2.encode("latin-1"))
    assert (enc, conf) == ("iso-8859-1", 0.9) and text == b2
    # label that cannot decode the bytes → heuristic takes over
    lying = '<meta charset="utf-666">caf\xe9 €'.encode("windows-1252")
    text, enc, conf = detect_decode(lying)
    assert (enc, conf) == ("windows-1252", 0.6) and text.endswith("café €")


def test_high_byte_heuristic_cp1252_vs_latin1():
    # € = 0x80 only exists in cp1252's 0x80-0x9F block
    t, e, c = detect_decode("café €".encode("windows-1252"))
    assert (t, e, c) == ("café €", "windows-1252", 0.6)
    # é = 0xE9, no 0x80-0x9F bytes → latin-1 (decodes identically here)
    t, e, c = detect_decode("café".encode("latin-1"))
    assert (t, e, c) == ("café", "latin-1", 0.6)
    # unmapped cp1252 byte 0x81 must not raise
    t, e, c = detect_decode(b"x \x81 \x80 y")
    assert e == "windows-1252" and "�" in t


def test_empty_and_none():
    assert detect_decode(None) == ("", "none", 0.0)
    assert detect_decode(b"") == ("", "empty", 1.0)


def test_sniff_window_is_bounded():
    # declaration past the 1024-byte HTML5 window is ignored
    late = (b"x" * 1100) + b'<meta charset="windows-1252">' + "é".encode("windows-1252")
    assert sniff_declared_charset(late) is None
    t, e, c = detect_decode(late)
    assert e == "latin-1"  # 0xE9 only, no 0x80-0x9F → latin-1 heuristic


def test_ladder_is_total_never_drops_bytes():
    """Every byte string decodes through SOME rung — unlike the
    reference's errors='ignore', no byte is ever silently dropped (the
    parity-mode default lives in extract.core.decode_utf8_ignore)."""
    import itertools
    import random

    rng = random.Random(5)
    for _ in range(200):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        t, e, c = detect_decode(blob)
        assert isinstance(t, str) and c > 0
    # an unknown declared label on non-utf8 bytes falls to the heuristic
    b = '<meta charset="x-nonsense">café'.encode("latin-1")
    t, e, c = detect_decode(b)
    assert (e, c) == ("latin-1", 0.6) and t.endswith("café")
