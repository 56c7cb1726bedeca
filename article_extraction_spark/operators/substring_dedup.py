"""Substring-level (span) deduplication — repeated passages, not whole
documents.

Whole-document and near-dup operators (operators/dedup.py) miss the most
common real-corpus pathology: the SAME boilerplate paragraph / license
header / quoted passage embedded inside otherwise-distinct documents.
The public remedy (Lee et al. 2021, "Deduplicating Training Data Makes
Language Models Better") is exact substring dedup of all repeats of
length ≥ k. This module is the fully-relational Spark formulation:

1. fingerprint every k-char window — ``explode(sequence(...))`` +
   ``substring`` + ``md5``; NATIVE expressions, no Python;
2. (scale path) thin the positions with WINNOWING (Schleimer-Wilkerson-
   Aiken 2003, the MOSS algorithm): keep, per sliding window of ``w``
   consecutive k-grams, the (hash, position)-minimal one. Every shared
   substring of length ≥ w+k-1 is still detected — inside the shared
   region the content (hence the hash sequence AND the tie-breaking
   relative offsets) is identical in both copies, so both documents
   select the same k-gram. Fingerprint volume drops to ~2/(w+1) of
   stride-1;
3. duplicated fingerprints = groupBy(fp) with an occurrence count
   (``scope="global"``, catches within-document repetition too) or a
   distinct-document count (``scope="cross_doc"``); an optional
   ``df_cap`` drops ultra-hot fingerprints (site boilerplate) before the
   join back, the same hot-key relief valve ngram_jaccard uses;
4. covered positions → maximal spans by the classic ISLAND merge, again
   pure window functions: a position starts a new island iff it lies
   past the running max end of all preceding spans.

100-TB shape: the only wide shuffles are the fp groupBy + the fp join
back (md5 keys, never text — positions carry (doc_id, pos) only) and the
per-document window for islands; nothing is ever all-pairs, and
winnowing divides the shuffled volume by ~(w+1)/2. The reference has no
analog of this operator; it generalizes the corpus-curation surface
(SURVEY §2's dedup family) the way incremental_exact_dedup did in r4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def substring_positions(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_order_hash: bool = False,
) -> DataFrame:
    """Every k-char window of every document: (doc_id, pos, fp[, h]).

    ``pos`` is 1-based (SQL ``substr`` convention, so the DuckDB oracle
    is literally the same arithmetic), ``fp`` the md5 join key, ``h`` an
    xxhash64 emitted only when ``with_order_hash`` (it exists solely for
    winnowing order — exact-mode callers skip a per-position hash).
    Documents shorter than k emit nothing. The guard filter matters:
    Spark's ``sequence(1, n)`` DESCENDS when n < 1 instead of being
    empty."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gram = F.substring(F.col("__text"), F.col("pos"), F.lit(k))
    cols = ["doc_id", "pos", F.md5(gram).alias("fp")]
    if with_order_hash:
        cols.append(F.xxhash64(gram).alias("h"))
    return (
        docs.where(F.length(text_col) >= k)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__text"),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - k + 1)).alias("pos"),
        )
        .select(*cols)
    )


def winnow_positions(pos_df: DataFrame, w: int) -> DataFrame:
    """Winnowing selection: keep positions that are the (h, pos)-minimal
    k-gram of at least one window of ``w`` consecutive positions.

    ``min(struct(h, pos, ...))`` over each forward frame is the
    per-window argmin with a deterministic leftmost tie rule — the fp/h
    payload rides inside the struct (ordering is decided by the (h, pos)
    prefix; pos is unique per doc), so selection needs NO join back to
    the positions table: one window pass + one distinct. A position
    selected by several windows is kept once. Guarantee threshold: any
    duplicate substring of length ≥ w+k-1 survives thinning (module
    docstring)."""
    if w < 1:
        raise ValueError(f"winnow window must be >= 1, got {w}")
    if w == 1:
        return pos_df
    frame = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    win = pos_df.withColumn("__wmin", F.min(F.struct("h", "pos", "fp")).over(frame))
    return win.select(
        "doc_id",
        F.col("__wmin.pos").alias("pos"),
        F.col("__wmin.fp").alias("fp"),
        F.col("__wmin.h").alias("h"),
    ).distinct()


def duplicate_spans(
    docs: DataFrame,
    k: int = 40,
    min_count: int = 2,
    scope: str = "global",
    winnow: int | None = None,
    df_cap: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated spans per document:
    (doc_id, span_start, span_end, span_len), ``span_end`` exclusive,
    touching/overlapping k-windows merged into islands.

    scope="global" counts occurrences (within-doc repetition counts);
    "cross_doc" requires ≥ min_count DISTINCT documents. ``winnow=w``
    switches to sampled fingerprints (detection guaranteed only for
    repeats ≥ w+k-1; reported spans are a subset of stride-1's).
    ``df_cap`` drops fingerprints occurring more than df_cap times
    (boilerplate short-circuit) BEFORE the join back."""
    if scope not in ("global", "cross_doc"):
        raise ValueError(f"scope must be 'global' or 'cross_doc', got {scope!r}")
    pos = substring_positions(
        docs, k, text_col=text_col, id_col=id_col, with_order_hash=bool(winnow and winnow > 1)
    )
    if winnow:
        pos = winnow_positions(pos, winnow)
    counted = pos.groupBy("fp").agg(
        F.count("*").alias("__n"), F.count_distinct("doc_id").alias("__nd")
    )
    hot = counted.where(F.col("__n") >= min_count if scope == "global" else F.col("__nd") >= min_count)
    if df_cap is not None:
        hot = hot.where(F.col("__n") <= df_cap)
    marked = pos.join(hot.select("fp"), "fp").select("doc_id", "pos")

    wo = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + k).over(wo.rowsBetween(Window.unboundedPreceding, -1))
    islanded = (
        marked.withColumn(
            "__new", (F.col("pos") > F.coalesce(prev_max_end, F.lit(-1))).cast("int")
        )
        .withColumn("__island", F.sum("__new").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        islanded.groupBy("doc_id", "__island")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + k).alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
        .withColumnRenamed("doc_id", id_col)  # honor the caller's id name
    )


def substring_dup_stats(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document rollup of duplicate_spans: (doc_id, n_spans,
    dup_chars, doc_len, dup_ratio) — every document present, zero-filled.
    ``dup_ratio`` is the Lee-et-al-style fraction of the document covered
    by ≥k-char repeats; a curation funnel thresholds on it."""
    spans = spans.withColumnRenamed(id_col, "doc_id") if id_col != "doc_id" else spans
    agg = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"), F.sum("span_len").alias("dup_chars")
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.length(text_col).alias("doc_len"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
            "doc_len",
            F.round(
                F.coalesce("dup_chars", F.lit(0)) / F.greatest("doc_len", F.lit(1)), 6
            ).alias("dup_ratio"),
        )
        .withColumnRenamed("doc_id", id_col)
    )


def strip_duplicate_spans(
    docs: DataFrame,
    k: int = 40,
    min_count: int = 2,
    winnow: int | None = None,
    df_cap: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove duplicated spans, keeping each repeat's FIRST occurrence.

    Canonical rule (deterministic, order-free): a k-gram occurrence is a
    *removable duplicate* iff a strictly earlier occurrence of the same
    fingerprint exists under (doc_id, pos) ordering — computed as
    ``min(struct(doc_id, pos))`` per fingerprint, one extra column on the
    groupBy already paid for. Removable positions island-merge exactly
    like duplicate_spans; the cleaned text is rebuilt by cutting the
    merged spans out (aggregate over collected spans — per-doc list is
    small, the heavy lifting stayed relational). Returns (doc_id, text,
    cleaned_text, removed_chars)."""
    pos = substring_positions(
        docs, k, text_col=text_col, id_col=id_col, with_order_hash=bool(winnow and winnow > 1)
    )
    if winnow:
        pos = winnow_positions(pos, winnow)
    counted = pos.groupBy("fp").agg(
        F.count("*").alias("__n"), F.min(F.struct("doc_id", "pos")).alias("__first")
    )
    hot = counted.where(F.col("__n") >= min_count)
    if df_cap is not None:
        hot = hot.where(F.col("__n") <= df_cap)
    removable = (
        pos.join(hot.select("fp", "__first"), "fp")
        .where((F.col("doc_id") != F.col("__first.doc_id")) | (F.col("pos") != F.col("__first.pos")))
        .select("doc_id", "pos")
    )
    wo = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + k).over(wo.rowsBetween(Window.unboundedPreceding, -1))
    spans = (
        removable.withColumn(
            "__new", (F.col("pos") > F.coalesce(prev_max_end, F.lit(-1))).cast("int")
        )
        .withColumn("__island", F.sum("__new").over(wo.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "__island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + k).alias("e"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__spans"))
    )
    # cleaned = the concatenation of the keep-gaps between spans; fold the
    # sorted span list with aggregate(): acc = (cursor, text-so-far)
    rebuild = F.aggregate(
        "__spans",
        F.struct(F.lit(1).alias("cur"), F.lit("").alias("out")),
        lambda acc, sp: F.struct(
            sp["e"].alias("cur"),
            F.concat(
                acc["out"],
                F.substring(
                    F.col(text_col), acc["cur"], F.greatest(sp["s"] - acc["cur"], F.lit(0))
                ),
            ).alias("out"),
        ),
        lambda acc: F.concat(
            acc["out"], F.substring(F.col(text_col), acc["cur"], F.length(text_col))
        ),
    )
    out = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
        .join(spans, "doc_id", "left")
        .withColumn(
            "cleaned_text",
            F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(rebuild),
        )
        .select(
            "doc_id",
            F.col(text_col).alias("text"),
            "cleaned_text",
            (F.length(text_col) - F.length("cleaned_text")).alias("removed_chars"),
        )
        .withColumnRenamed("doc_id", id_col)  # honor the caller's id name
    )
    return out
