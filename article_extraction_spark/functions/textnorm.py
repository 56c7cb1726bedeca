"""Text normalizers & tokenizers (F4, F9, F10, F13) — native expressions
except where order-preserving semantics force a higher-order function.

Reference semantics: tables/paper_information_table.py:434-461, 553-582;
results/020925/scores.py:175-187.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_alnum_col(c: Column) -> Column:
    """F9: lower; non-alphanumeric → space; collapse whitespace; trim
    (reference _normalize_country/_normalize_hardware :434-443, 553-562)."""
    lowered = F.lower(F.trim(c.cast("string")))
    spaced = F.regexp_replace(lowered, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(spaced, r"\s+", " "))


def split_tokens_col(c: Column, extra_separators: bool = False) -> Column:
    """F10: split on ,;/ (hardware adds '+', '&', ' and '), trim fragments,
    drop empties, dedupe case-insensitively KEEPING FIRST-SEEN ORDER
    (reference _split_country_tokens :446-461, _split_hardware_tokens
    :565-582). Order-preserving dedup via aggregate() — no Python.
    """
    s = c.cast("string")
    if extra_separators:
        s = F.regexp_replace(s, r"(?i)\s+and\s+", ",")
        s = F.regexp_replace(s, r"[+&]", ",")
    s = F.regexp_replace(s, r"[;/]", ",")
    fragments = F.filter(
        F.transform(F.split(s, ","), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    # order-preserving case-insensitive dedup: fold left, append if unseen
    return F.aggregate(
        fragments,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            F.exists(acc, lambda y: F.lower(y) == F.lower(x)), acc
        ).otherwise(F.concat(acc, F.array(x))),
    )


def split_tokens(value: str | None, extra_separators: bool = False) -> list[str]:
    """Python twin of split_tokens_col (used inside fuzzy-join UDFs)."""
    if value is None:
        return []
    s = value
    if extra_separators:
        import re

        s = re.sub(r"(?i)\s+and\s+", ",", s)
        s = s.replace("+", ",").replace("&", ",")
    s = s.replace(";", ",").replace("/", ",")
    out: list[str] = []
    seen: set[str] = set()
    for frag in s.split(","):
        frag = frag.strip()
        if not frag or frag.lower() in seen:
            continue
        seen.add(frag.lower())
        out.append(frag)
    return out


def normalise_cell_col(c: Column) -> Column:
    """F13: str(value); collapse whitespace; {'nan','none','null',''} → ''
    (reference scores.py:175-187)."""
    collapsed = F.trim(F.regexp_replace(c.cast("string"), r"\s+", " "))
    return F.when(
        collapsed.isNull() | F.lower(collapsed).isin("nan", "none", "null", ""),
        F.lit(""),
    ).otherwise(collapsed)


def alnum_tokens_col(c):
    """THE shared vocabulary definition: lower → split on non-alnum → drop
    empties. Shingling (dedup/contamination), top_terms, and
    repetition_stats must tokenize identically — their DuckDB oracles
    replicate this exact expression — so there is exactly ONE copy of it."""
    from pyspark.sql import functions as F

    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(c, F.lit("")))), r"[^a-z0-9]+"),
        lambda w: F.length(w) > 0,
    )


def unicode_normalize_udf(form: str = "NFC"):
    """Arrow-batched Unicode normalization (round 5): text → the given
    normal form via python's ``unicodedata`` (the stdlib binding of the
    Unicode standard's normalization algorithm). Spark has no native
    NFC/NFKC, so this is a pandas UDF — but it is pure per-row string
    work over Arrow batches, the cheapest possible python boundary.

    Why a curation engine needs it: visually-identical strings with
    different codepoint sequences (e+combining-acute vs é) break exact
    dedup fingerprints, BM25 term matching, and BPE merge statistics;
    normalizing FIRST makes every downstream text operator see one
    canonical form. NFKC additionally folds compatibility characters
    (ﬁ → fi, fullwidth → ASCII) — the aggressive form most LM pipelines
    run. The oracle for this op is unusually strong: DuckDB's
    nfc_normalize is an INDEPENDENT implementation (utf8proc), so a
    value match certifies both ends against the Unicode spec."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normal form {form!r}")
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: None if t is None else unicodedata.normalize(form, t)
        )

    return _udf
