"""Fuzzy broadcast theta-joins J3/J4 (reference
tables/paper_information_table.py:524-549, 617-647).

Shape: tokenize the free-text column, normalize, then argmin-distance /
argmax-similarity against a *tiny* dimension catalog. The catalog is a Spark
broadcast variable consumed inside an Arrow-batched pandas UDF — one pass
over the fact table, zero shuffle, no row explosion (the crossJoin+window
formulation would multiply 10^12 rows by |dim|). This is the reference's
preloaded-catalog nested loop re-expressed as broadcast + vectorized batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.similarity import jaro_winkler
from ..functions.textnorm import split_tokens

# reference paper_information_table.py:416-431
IGNORED_COUNTRY_TOKENS = frozenset(
    {"multinational", "multiple countries", "various", "global", "unspecified", "unknown", "n a"}
)
COUNTRY_ALIASES = {
    "korea republic of": "korea republic of",
    "republic of korea": "korea republic of",
    "south korea": "korea republic of",
    "korea": "korea republic of",
}

HARDWARE_MATCH_THRESHOLD = 0.90  # reference config.py:7


def normalize_alnum(value: str) -> str:
    """Python twin of functions.textnorm.normalize_alnum_col (F9)."""
    lowered = value.strip().lower()
    spaced = "".join(ch if (ch.isalnum() or ch.isspace()) else " " for ch in lowered)
    return " ".join(spaced.split())


def match_country(raw: str | None, catalog: list[tuple[int, str]]) -> int | None:
    """J3: containment ⇒ distance 0, else Jaro-Winkler distance; argmin over
    the catalog across all tokens (reference :524-549)."""
    best_id, best_dist = None, float("inf")
    for token in split_tokens(raw):
        norm = normalize_alnum(token)
        if not norm:
            continue
        norm = COUNTRY_ALIASES.get(norm, norm)
        if norm in IGNORED_COUNTRY_TOKENS:
            continue
        for cid, cname in catalog:
            if norm in cname or cname in norm:
                dist = 0.0
            else:
                dist = 1.0 - jaro_winkler(norm, cname)
            if dist < best_dist:
                best_dist, best_id = dist, cid
    return best_id


def match_hardware(
    raw: str | None, catalog: list[tuple[int, str, float | None, float | None]]
) -> tuple[int | None, float | None, float | None, float | None]:
    """J4: containment ⇒ similarity 1.0, else Jaro-Winkler; argmax
    (reference :617-647). Threshold (0.90) is applied by the caller."""
    best = (None, None, None, None)
    best_sim = 0.0
    for token in split_tokens(raw, extra_separators=True):
        norm = normalize_alnum(token)
        if not norm:
            continue
        for hid, hname, compute, power in catalog:
            if not hname:
                continue
            sim = 1.0 if (norm in hname or hname in norm) else jaro_winkler(norm, hname)
            if sim > best_sim:
                best_sim = sim
                best = (hid, compute, power, sim)
    return best


def _batch_match_country(raws, catalog) -> list[int | None]:
    """Batch twin of match_country: containment checks stay scalar (C-level
    substring, cheap); ALL Jaro-Winkler pairs of the batch are computed in
    one vectorized numpy kernel call. First-wins tie-breaking (strict <) is
    preserved by keeping the (token, catalog) enumeration order."""
    from ..functions.similarity import jw_batch_safe

    per_raw: list[list] = []
    jw_a: list[str] = []
    jw_b: list[str] = []
    jw_slots: list[tuple[int, int]] = []
    for r_idx, raw in enumerate(raws):
        entries: list = []
        for token in split_tokens(raw):
            norm = normalize_alnum(token)
            if not norm:
                continue
            norm = COUNTRY_ALIASES.get(norm, norm)
            if norm in IGNORED_COUNTRY_TOKENS:
                continue
            for cid, cname in catalog:
                if norm in cname or cname in norm:
                    entries.append((0.0, cid))
                else:
                    entries.append((None, cid))
                    jw_a.append(norm)
                    jw_b.append(cname)
                    jw_slots.append((r_idx, len(entries) - 1))
        per_raw.append(entries)
    if jw_a:
        sims = jw_batch_safe(jw_a, jw_b)  # chunked + long-string fallback
        for (r_idx, pos), s in zip(jw_slots, sims):
            per_raw[r_idx][pos] = (1.0 - float(s), per_raw[r_idx][pos][1])
    out: list[int | None] = []
    for entries in per_raw:
        best_id, best = None, float("inf")
        for dist, cid in entries:
            if dist < best:
                best, best_id = dist, cid
        out.append(best_id)
    return out


def fuzzy_match_country(
    df: DataFrame, text_col: str, country_dim: DataFrame, out_col: str = "id_country"
) -> DataFrame:
    """Adds ``out_col``: best-matching country id for the free-text column.

    ``country_dim``: (id_country, country). Collected + broadcast — dims are
    O(100) rows; at any fact scale this stays a map-side operation.
    """
    spark = df.sparkSession
    catalog = [
        (int(r["id_country"]), normalize_alnum(r["country"]))
        for r in country_dim.select("id_country", "country").collect()
    ]
    bc = spark.sparkContext.broadcast(catalog)

    @F.pandas_udf(T.IntegerType())
    def _match(raw: pd.Series) -> pd.Series:
        return pd.Series(_batch_match_country(raw, bc.value), dtype="Int32")

    return df.withColumn(out_col, _match(F.col(text_col)))


def _batch_match_hardware(raws, catalog) -> list[tuple]:
    """Batch twin of match_hardware (same vectorization pattern as
    _batch_match_country; first-max-wins via strict > in enumeration order)."""
    from ..functions.similarity import jw_batch_safe

    per_raw: list[list] = []
    jw_a: list[str] = []
    jw_b: list[str] = []
    jw_slots: list[tuple[int, int]] = []
    for r_idx, raw in enumerate(raws):
        entries: list = []
        for token in split_tokens(raw, extra_separators=True):
            norm = normalize_alnum(token)
            if not norm:
                continue
            for hid, hname, compute, power in catalog:
                if not hname:
                    continue
                if norm in hname or hname in norm:
                    entries.append((1.0, hid, compute, power))
                else:
                    entries.append((None, hid, compute, power))
                    jw_a.append(norm)
                    jw_b.append(hname)
                    jw_slots.append((r_idx, len(entries) - 1))
        per_raw.append(entries)
    if jw_a:
        sims = jw_batch_safe(jw_a, jw_b)  # chunked + long-string fallback
        for (r_idx, pos), s in zip(jw_slots, sims):
            e = per_raw[r_idx][pos]
            per_raw[r_idx][pos] = (float(s), e[1], e[2], e[3])
    out: list[tuple] = []
    for entries in per_raw:
        best = (None, None, None, None)
        best_sim = 0.0
        for sim, hid, compute, power in entries:
            if sim > best_sim:
                best_sim = sim
                best = (hid, compute, power, sim)
        out.append(best)
    return out


_HW_RESULT = T.StructType(
    [
        T.StructField("id_hardware", T.IntegerType(), True),
        T.StructField("h_compute", T.DoubleType(), True),
        T.StructField("h_power", T.DoubleType(), True),
        T.StructField("similarity", T.DoubleType(), True),
    ]
)


def fuzzy_match_hardware(
    df: DataFrame,
    text_col: str,
    hardware_dim: DataFrame,
    threshold: float = HARDWARE_MATCH_THRESHOLD,
    accept_below_threshold: bool = False,
) -> DataFrame:
    """Adds id_hardware/h_compute/h_power/similarity columns; matches below
    ``threshold`` are nulled unless accept_below_threshold (reference
    applies 0.90 at :258)."""
    spark = df.sparkSession
    catalog = []
    for r in hardware_dim.select("id_hardware", "hardware", "compute", "power").collect():
        catalog.append(
            (
                int(r["id_hardware"]),
                normalize_alnum(r["hardware"]),
                None if r["compute"] is None else float(r["compute"]),
                None if r["power"] is None else float(r["power"]),
            )
        )
    bc = spark.sparkContext.broadcast(catalog)

    @F.pandas_udf(_HW_RESULT)
    def _match(raw: pd.Series) -> pd.DataFrame:
        rows = _batch_match_hardware(raw, bc.value)
        return pd.DataFrame(rows, columns=["id_hardware", "h_compute", "h_power", "similarity"])

    out = df.withColumn("_hw", _match(F.col(text_col)))
    accepted = F.lit(True) if accept_below_threshold else (
        F.col("_hw.similarity").isNotNull() & (F.col("_hw.similarity") >= F.lit(threshold))
    )
    return (
        out.withColumn("id_hardware", F.when(accepted, F.col("_hw.id_hardware")))
        .withColumn("h_compute", F.when(accepted, F.col("_hw.h_compute")))
        .withColumn("h_power", F.when(accepted, F.col("_hw.h_power")))
        .withColumn("hw_similarity", F.col("_hw.similarity"))
        .drop("_hw")
    )


def broadcast_dim_join(fact: DataFrame, dim: DataFrame, key: str, how: str = "left") -> DataFrame:
    """J5: FK dimension lookup as an explicit broadcast hash join
    (reference paper_information_table.py:25-37, 84-99)."""
    return fact.join(F.broadcast(dim), key, how)
