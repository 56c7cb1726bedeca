"""Relational full-text retrieval: inverted index + BM25 ranking.

A curation pipeline needs lexical retrieval constantly — retrieval-based
decontamination (find corpus documents that *answer* an eval query even
when no 13-gram collides), near-duplicate triage, and building
retrieval training pairs. This is the classic Robertson/Spärck Jones
BM25 (the Lucene-default ``ln(1 + (N - df + ½)/(df + ½))`` non-negative
idf variant), expressed entirely as DataFrame algebra:

  * ``build_text_index`` — postings (term, doc_id, tf) + doc lengths,
    one explode + two groupBys over the shared ``alnum_tokens_col``
    vocabulary (the same tokenization every other text operator and its
    DuckDB oracle uses);
  * ``bm25_scores`` — query terms (small; broadcast) equi-join the
    postings on term, per-(query, doc) sum of the BM25 term
    contributions; no UDF, whole-stage codegen throughout;
  * ``bm25_topk`` — per-query window with a total order (score desc,
    doc_id asc) so results are deterministic at any partitioning.

100-TB shape: the postings table is the only large relation and it is
built with map-side-combined groupBys; the scoring join broadcasts the
query-term side (queries ≪ corpus), so postings never shuffle at query
time — the join is a broadcast hash join pruned to matching terms.
Persist the index once (e.g. into a ManifestTable partitioned by term
bucket) and amortize it across every downstream search; the index build
is decomposable, so `IncrementalRollup` semantics apply to keeping
(term, doc) counts fresh under append-only ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_text_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, doc_stats): postings = (term, doc_id, tf, dl);
    doc_stats = (doc_id, dl) for every document with ≥1 token. Documents
    tokenizing to nothing carry no postings and no length — they can
    never score, and N/avgdl are defined over scorable docs.

    ``dl`` is DENORMALIZED into the postings (standard search-index
    practice): the doc-length join happens ONCE at build time, so query
    time never shuffles the corpus-wide doc_stats table — scoring reads
    only the pruned postings plus a one-row stats aggregate."""
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    tf = terms.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    doc_stats = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    postings = tf.join(doc_stats, "doc_id").select("term", "doc_id", "tf", "dl")
    return postings, doc_stats


def _tokens(c):
    from ..functions.textnorm import alnum_tokens_col

    return alnum_tokens_col(c)


def bm25_scores(
    postings: DataFrame,
    doc_stats: DataFrame,
    queries: DataFrame,
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score) for every document sharing ≥1 term with
    the query. Query terms are DISTINCT (the simple BM25 form — repeated
    query terms don't re-count). idf uses the non-negative Lucene
    variant, so a term in >half the corpus contributes little instead of
    negatively."""
    qterms = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(_tokens(F.col(qtext_col))).alias("term"),
    ).distinct()
    # prune the postings to query terms FIRST: df over the pruned set is
    # still the full-corpus document frequency of those terms (a posting
    # row exists per (term, doc) regardless of the query), and the
    # vocabulary-wide df shuffle disappears. dl rides inside the pruned
    # postings (denormalized at build), so the only corpus-sized input
    # touched at query time is the one-row n/avgdl aggregate.
    if "dl" not in postings.columns:  # pre-denormalization index layout
        postings = postings.join(doc_stats, "doc_id")
    pruned = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_t = pruned.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    stats = doc_stats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    contrib = (
        pruned.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("contrib"),
        )
    )
    return contrib.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))


def bm25_topk(
    postings: DataFrame,
    doc_stats: DataFrame,
    queries: DataFrame,
    k: int = 10,
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k per query: (query_id, doc_id, score, rank), ranked by
    (score desc, doc_id asc) — a total order, deterministic at any
    partitioning."""
    scored = bm25_scores(postings, doc_stats, queries, qid_col, qtext_col, k1, b)
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """One-shot convenience: build the index and rank. For repeated
    searches, build once with build_text_index and persist."""
    postings, doc_stats = build_text_index(docs, id_col, text_col)
    return bm25_topk(postings, doc_stats, queries, k, qid_col, qtext_col, k1, b)
