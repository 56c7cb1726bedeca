"""End-to-end curation pipeline: quality → exact dedup → near dedup →
decontamination → PII redaction, every drop counted."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_curate_corpus_end_to_end(spark, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from curate_corpus import curate_corpus

    # gopher gate: ≥50 words, mean word length in [3, 10], ≥2 stopword hits
    # every trigram contains a stem-unique token, so distinct stems share NO
    # 3-grams (decontamination only fires on genuinely shared passages)
    def doc(prefix: str, stem: str) -> str:
        body = " ".join(f"{stem}{i:02d} the {stem}x{i:02d}" for i in range(20))
        return f"{prefix} {body}"

    base = doc("shared benchmark paragraph", "alpha")
    rows = [
        (0, base),                               # benchmark member → contaminated
        (1, base + " extra tail here"),          # near-dup of 0 (and contaminated)
        (2, "tiny"),                             # fails gopher word count
        (3, doc("unique third document", "beta")),
        (4, doc("unique third document", "beta")),  # exact dup of 3
        (5, doc("mail me at a@b.co please", "gamma")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    benchmark = docs.where(F.col("doc_id") == 0)

    cached_before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    stats = curate_corpus(spark, docs, benchmark, str(tmp_path / "out"),
                          jaccard_threshold=0.7, contamination_ngram=3)
    assert stats["input"] == 6
    assert stats["after_quality"] == 5          # doc 2 dropped
    assert stats["after_exact_dedup"] == 4      # doc 4 dropped (keep-first)
    assert stats["after_near_dedup"] == 3       # doc 1 dropped (near-dup of 0)
    assert stats["after_decontamination"] == 2  # doc 0 dropped (benchmark member)

    out = spark.read.parquet(str(tmp_path / "out" / "curated"))
    got = {r["doc_id"]: r["curated_text"] for r in out.collect()}
    assert set(got) == {3, 5}
    assert "[PII]" in got[5] and "a@b.co" not in got[5]
    # no NEW caches leak out of the job (other tests in the shared session
    # may legitimately hold their own)
    cached_after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert cached_after - cached_before == set(), cached_after - cached_before
