"""BM25 retrieval (operators/retrieval.py): textbook-formula python twin
equality, ranking determinism, idf monotonicity, and plan shape."""

from __future__ import annotations

import math
import re

import pytest

from article_extraction_spark.operators.retrieval import (
    bm25_scores,
    bm25_search,
    bm25_topk,
    build_text_index,
)

DOCS = [
    (0, "spark shuffles data between stages during wide transformations"),
    (1, "broadcast joins avoid the shuffle for small dimension tables"),
    (2, "the optimizer reorders joins and pushes filters down to the scan"),
    (3, "shuffle partitions should be sized so spills stay rare"),
    (4, "window functions sort within partitions without a full shuffle"),
    (5, "completely unrelated text about cooking pasta with tomato sauce"),
    (6, ""),  # tokenless: never scores, excluded from N/avgdl
]
QUERIES = [(100, "shuffle partitions"), (200, "broadcast joins"), (300, "pasta")]


def _tok(s):
    return [w for w in re.split(r"[^a-z0-9]+", s.lower().strip()) if w]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    toks = {d: _tok(t) for d, t in docs}
    toks = {d: t for d, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, qtext in queries:
        for d, t in toks.items():
            s = 0.0
            for term in set(_tok(qtext)):
                tf = t.count(term)
                if tf == 0:
                    continue
                idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
            if s > 0:
                out[(qid, d)] = s
    return out


def _spark_docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _spark_queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, qtext string")


def test_scores_match_python_twin(spark):
    postings, stats = build_text_index(_spark_docs(spark))
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(postings, stats, _spark_queries(spark)).collect()
    }
    expect = _py_bm25(DOCS, QUERIES)
    assert set(got) == set(expect)
    for key in expect:
        assert got[key] == pytest.approx(expect[key], rel=1e-12), key


def test_topk_ranking_and_determinism(spark):
    res = bm25_search(_spark_docs(spark), _spark_queries(spark), k=2).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for q in by_q:
        by_q[q].sort()
    # 'shuffle partitions': doc 3 has both terms → must rank first
    assert by_q[100][0][1] == 3
    # 'broadcast joins': doc 1 has both
    assert by_q[200][0][1] == 1
    # 'pasta' appears only in doc 5 → exactly one hit
    assert [d for _, d, _ in by_q[300]] == [5]
    # ranks are 1..k contiguous, scores non-increasing
    for q, rows in by_q.items():
        assert [r for r, _, _ in rows] == list(range(1, len(rows) + 1))
        scores = [s for _, _, s in rows]
        assert scores == sorted(scores, reverse=True)


def test_rare_term_outranks_common_on_equal_tf(spark):
    """idf monotonicity: with tf and dl equal, the rarer term scores
    higher — 'pasta' (df=1) beats 'shuffle' (df=4) for the same doc
    shape."""
    docs = _spark_docs(spark)
    postings, stats = build_text_index(docs)
    q = spark.createDataFrame(
        [(1, "pasta"), (2, "shuffle")], "query_id long, qtext string"
    )
    scored = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(postings, stats, q).collect()
    }
    # doc 5 (pasta, dl=8? whatever it is) vs doc 0 (shuffles→no; doc 3 has
    # 'shuffle' tf=1). Compare the per-term idf directly via two docs with
    # tf=1: pick max score per query; rare-term max must exceed common-term max
    assert max(s for (qq, _), s in scored.items() if qq == 1) > max(
        s for (qq, _), s in scored.items() if qq == 2
    )


def test_empty_and_oov_queries(spark):
    docs = _spark_docs(spark)
    postings, stats = build_text_index(docs)
    q = spark.createDataFrame(
        [(1, "zzzqx notinthecorpus"), (2, "   "), (3, None)],
        "query_id long, qtext string",
    )
    assert bm25_scores(postings, stats, q).count() == 0


def test_plan_broadcasts_query_side(spark):
    """Scale shape: the scoring join must broadcast the query-term side —
    postings never shuffle at query time; no cartesian anywhere; the only
    nested-loop join is the deliberate ONE-ROW broadcast stats join (the
    same n_docs/avgdl pattern tfidf_top_terms uses)."""
    docs = _spark_docs(spark)
    plan = (
        bm25_search(docs, _spark_queries(spark), k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoop") <= 1


def test_bm25_index_maintained_incrementally(spark, tmp_path):
    """Composition: the inverted index IS a pair of decomposable rollups
    — postings tf by (term, doc_id) and dl by doc_id — so
    IncrementalRollup keeps a PERSISTED index fresh under append-only
    ingest, and BM25 over the maintained index equals BM25 over a
    from-scratch index of the full corpus."""
    from pyspark.sql import functions as F

    from article_extraction_spark.catalog import ManifestTable
    from article_extraction_spark.rollup import IncrementalRollup

    docs_all = _spark_docs(spark).where(F.col("text") != "")
    batch1 = docs_all.where(F.col("doc_id") < 3)
    batch2 = docs_all.where(F.col("doc_id") >= 3)

    def terms_of(df):
        from article_extraction_spark.operators.retrieval import _tokens

        return df.select(
            F.col("doc_id"), F.explode(_tokens(F.col("text"))).alias("term")
        )

    source = ManifestTable(str(tmp_path / "terms"))
    postings_t = ManifestTable(str(tmp_path / "postings"))
    dl_t = ManifestTable(str(tmp_path / "dl"))
    ir_post = IncrementalRollup(source, postings_t, ["term", "doc_id"], {"tf": ("count", None)})
    ir_dl = IncrementalRollup(source, dl_t, ["doc_id"], {"dl": ("count", None)})

    for batch in (batch1, batch2):
        source.append(terms_of(batch))
        ir_post.refresh(spark)
        ir_dl.refresh(spark)

    doc_stats = dl_t.read(spark)
    postings = postings_t.read(spark).join(doc_stats, "doc_id").select(
        "term", "doc_id", "tf", "dl"
    )
    maintained = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(postings, doc_stats, _spark_queries(spark)).collect()
    }
    fresh_post, fresh_stats = build_text_index(docs_all)
    fresh = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(fresh_post, fresh_stats, _spark_queries(spark)).collect()
    }
    assert maintained.keys() == fresh.keys()
    for key in fresh:
        assert maintained[key] == pytest.approx(fresh[key], rel=1e-12), key


def test_maintained_index_operator(spark, tmp_path):
    """VERDICT r5 #5 promoted to an operator: MaintainedBM25Index keeps a
    persisted, term-bucket-partitioned index fresh under append-only
    ingest (bootstrap full, then CDC-incremental), query scans prune to
    the probed buckets at planning time, and maintained scores equal a
    from-scratch index of the full corpus."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from article_extraction_spark.operators.retrieval import MaintainedBM25Index

    docs_all = _spark_docs(spark).where(F.col("text") != "")
    idx = MaintainedBM25Index(str(tmp_path / "bm25"), n_buckets=8)
    s1 = idx.ingest(spark, docs_all.where(F.col("doc_id") < 3))
    s2 = idx.ingest(spark, docs_all.where(F.col("doc_id") >= 3))
    assert s1["postings_mode"] == "full"  # bootstrap
    assert s2["postings_mode"] == "incremental" and s2["doclens_mode"] == "incremental"
    assert 0 < s2["buckets_exported"] <= 8

    queries = _spark_queries(spark)
    scored = idx.scores(spark, queries)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    maintained = {(r["query_id"], r["doc_id"]): r["score"] for r in scored.collect()}
    fresh_post, fresh_stats = build_text_index(docs_all)
    fresh = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(fresh_post, fresh_stats, queries).collect()
    }
    assert maintained.keys() == fresh.keys() and len(maintained) > 0
    for key in fresh:
        assert maintained[key] == pytest.approx(fresh[key], rel=1e-12), key

    # the prune is real: corrupt every NON-probed bucket dir — queries
    # still run (pruned scans never open those files)
    probed = set(idx.probe_buckets(spark, queries))
    for d in glob.glob(str(tmp_path / "bm25" / "serving" / "bucket=*")):
        if int(d.rsplit("=", 1)[1]) not in probed:
            for f in glob.glob(f"{d}/*.parquet"):
                with open(f, "wb") as fh:
                    fh.write(b"corrupt")
    again = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in idx.scores(spark, queries).collect()
    }
    assert again == maintained

    # topk over the maintained index == bm25_topk over fresh
    shutil.rmtree(str(tmp_path / "bm25"))
    idx2 = MaintainedBM25Index(str(tmp_path / "bm25"), n_buckets=8)
    idx2.ingest(spark, docs_all)
    got_top = [
        (r["query_id"], r["rank"], r["doc_id"])
        for r in idx2.topk(spark, queries, k=3).orderBy("query_id", "rank").collect()
    ]
    want_top = [
        (r["query_id"], r["rank"], r["doc_id"])
        for r in bm25_topk(fresh_post, fresh_stats, queries, k=3)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert got_top == want_top


def test_maintained_index_piecewise_doc_and_guards(spark, tmp_path):
    """A document arriving in PIECES changes its dl, which is
    denormalized into buckets its earlier terms live in — those stale
    buckets must be re-exported, keeping scores equal to a from-scratch
    index of the merged corpus. Plus: n_buckets mismatch fails loudly,
    and a tokenless query returns empty."""
    from pyspark.sql import functions as F

    from article_extraction_spark.operators.retrieval import MaintainedBM25Index

    idx = MaintainedBM25Index(str(tmp_path / "idx"), n_buckets=4)
    part1 = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")], "doc_id long, text string"
    )
    part2 = spark.createDataFrame(
        [(0, "zeta eta theta iota"), (2, "kappa alpha")], "doc_id long, text string"
    )
    idx.ingest(spark, part1)
    s2 = idx.ingest(spark, part2)  # doc 0 re-arrives: dl 3 -> 7
    assert s2["postings_mode"] == "incremental"

    merged = spark.createDataFrame(
        [(0, "alpha beta gamma zeta eta theta iota"), (1, "delta epsilon"), (2, "kappa alpha")],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "alpha"), (2, "beta kappa"), (3, "")], "query_id long, qtext string"
    )
    maintained = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in idx.scores(spark, queries).collect()
    }
    fresh_post, fresh_stats = build_text_index(merged)
    fresh = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(fresh_post, fresh_stats, queries).collect()
    }
    assert maintained.keys() == fresh.keys() and len(maintained) > 0
    for key in fresh:
        assert maintained[key] == pytest.approx(fresh[key], rel=1e-12), key
    assert not any(q == 3 for q, _ in maintained)  # tokenless query

    with pytest.raises(ValueError, match="n_buckets"):
        MaintainedBM25Index(str(tmp_path / "idx"), n_buckets=8)
    with pytest.raises(ValueError):
        bm25_scores(fresh_post, None, queries)


def test_maintained_index_string_doc_ids_roundtrip(spark, tmp_path):
    """Review r6: the serving read schema derives from the doc-id type
    pinned at first ingest — a string-keyed index must score via the
    default read path, and a type change across ingests fails loudly."""
    import pytest as _pytest

    from article_extraction_spark.operators.retrieval import MaintainedBM25Index

    idx = MaintainedBM25Index(str(tmp_path / "idx"), n_buckets=4)
    docs = spark.createDataFrame(
        [("doc-a", "spark filter join"), ("doc-b", "filter scan"), ("doc-c", "join join")],
        "doc_id string, text string",
    )
    idx.ingest(spark, docs)
    queries = spark.createDataFrame([(1, "join")], "query_id long, qtext string")
    got = {r["doc_id"]: r["score"] for r in idx.scores(spark, queries).collect()}
    assert set(got) == {"doc-a", "doc-c"} and got["doc-c"] > got["doc-a"]
    with _pytest.raises(ValueError, match="doc_id type"):
        idx.ingest(spark, spark.createDataFrame([(1, "x")], "doc_id long, text string"))


def test_maintained_index_recovers_crashed_export(spark, tmp_path):
    """ADVICE r7 medium: a crash between terms.append and the serving
    export used to strand the batch — the next refresh folded it via the
    CDC cursor, but its buckets were never in `touched`, so queries
    silently missed those documents. The write-ahead pending-bucket set
    makes the next ingest export them."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from article_extraction_spark.operators.retrieval import MaintainedBM25Index

    docs_all = _spark_docs(spark).where(F.col("text") != "")
    idx = MaintainedBM25Index(str(tmp_path / "bm25"), n_buckets=8)
    idx.ingest(spark, docs_all.where(F.col("doc_id") == 0))  # bootstrap

    # crash mid-ingest: the append + rollup refreshes land, export doesn't
    real_export = idx._export
    def dying_export(spark_, affected):
        raise RuntimeError("simulated crash before export")
    idx._export = dying_export
    with _pytest.raises(RuntimeError, match="simulated crash"):
        idx.ingest(spark, docs_all.where(F.col("doc_id") == 1))
    idx._export = real_export
    assert os.path.exists(os.path.join(idx.root, "pending_buckets.json"))

    # a later (fresh-process) ingest of a DIFFERENT batch must also export
    # the crashed batch's buckets — not just its own
    idx2 = MaintainedBM25Index(str(tmp_path / "bm25"), n_buckets=8)
    idx2.ingest(spark, docs_all.where(F.col("doc_id") == 2))
    assert not os.path.exists(os.path.join(idx.root, "pending_buckets.json"))

    queries = _spark_queries(spark)
    maintained = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in idx2.scores(spark, queries).collect()
    }
    fresh_post, fresh_stats = build_text_index(docs_all.where(F.col("doc_id") <= 2))
    fresh = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(fresh_post, fresh_stats, queries).collect()
    }
    assert maintained.keys() == fresh.keys() and len(maintained) > 0
    for key in fresh:
        assert maintained[key] == pytest.approx(fresh[key], rel=1e-12), key
