"""Substring-level dedup (operators/substring_dedup.py): planted-passage
detection, island merging, winnowing guarantee, boilerplate cap, and
first-occurrence-keeping strip."""

from __future__ import annotations

import numpy as np
import pytest

from article_extraction_spark.operators.substring_dedup import (
    duplicate_spans,
    strip_duplicate_spans,
    substring_dup_stats,
    substring_positions,
    winnow_positions,
)

PASSAGE = "the quick brown fox jumps over the lazy dog repeatedly and often"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_spans(rows, k, min_count=2, cross_doc=False):
    """Independent stride-1 twin: brute-force python fingerprinting +
    interval merge, the definition the Spark plan must reproduce."""
    from collections import defaultdict

    occ = defaultdict(list)
    for doc_id, text in rows:
        for i in range(len(text) - k + 1):
            occ[text[i : i + k]].append((doc_id, i + 1))
    marked = defaultdict(set)
    for gram, places in occ.items():
        n = len({d for d, _ in places}) if cross_doc else len(places)
        if n >= min_count:
            for d, p in places:
                marked[d].add(p)
    spans = []
    for d, poss in marked.items():
        cur_s = cur_e = None
        for p in sorted(poss):
            if cur_s is None:
                cur_s, cur_e = p, p + k
            elif p <= cur_e:
                cur_e = p + k
            else:
                spans.append((d, cur_s, cur_e, cur_e - cur_s))
                cur_s, cur_e = p, p + k
        if cur_s is not None:
            spans.append((d, cur_s, cur_e, cur_e - cur_s))
    return sorted(spans)


def test_planted_passages_match_python_twin(spark):
    rows = [
        (0, "A" * 10 + PASSAGE + " unique tail zero " + "B" * 30),
        (1, "different head one " + PASSAGE + " and a different ending here"),
        (2, "no duplicated content in this document at all, just filler."),
        (3, "within doc repeat: " + PASSAGE + " middle " + PASSAGE + " end"),
        (4, "tiny"),  # shorter than k: must not crash or emit
    ]
    docs = _docs(spark, rows)
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(docs, k=20).collect()
    )
    assert got == _py_spans(rows, 20)
    # cross_doc scope drops the within-doc-only "B"*30 run if it never
    # crosses documents, and keeps the passage spans
    got_cd = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(docs, k=20, scope="cross_doc").collect()
    )
    assert got_cd == _py_spans(rows, 20, cross_doc=True)
    assert len(got_cd) < len(got)


def test_stats_rollup_zero_filled(spark):
    rows = [
        (0, "x " + PASSAGE + " y"),
        (1, "z " + PASSAGE + " w"),
        (2, "entirely original text with no repeats whatsoever in it."),
    ]
    docs = _docs(spark, rows)
    spans = duplicate_spans(docs, k=30)
    stats = {r["doc_id"]: r for r in substring_dup_stats(docs, spans).collect()}
    assert set(stats) == {0, 1, 2}
    assert stats[2]["n_spans"] == 0 and stats[2]["dup_chars"] == 0 and stats[2]["dup_ratio"] == 0.0
    for d in (0, 1):
        assert stats[d]["n_spans"] == 1
        assert stats[d]["dup_chars"] >= len(PASSAGE)
        assert 0 < stats[d]["dup_ratio"] <= 1.0
        assert stats[d]["doc_len"] == len(rows[d][1])


def test_winnowing_guarantee_and_subset(spark):
    """Winnowed detection is a subset of stride-1 detection, AND any
    duplicate of length >= w+k-1 is still found (the MOSS guarantee) —
    checked over randomized corpora with planted long repeats."""
    rng = np.random.default_rng(17)
    k, w = 12, 6
    guarantee = w + k - 1  # 17
    alphabet = list("abcdefgh ")
    for trial in range(4):
        planted = "".join(rng.choice(alphabet, size=guarantee + 5))  # > threshold
        rows = []
        for d in range(6):
            body = "".join(rng.choice(alphabet, size=80))
            if d in (1, 4):
                body = body[:20] + planted + body[20:]
            rows.append((d, body))
        docs = _docs(spark, rows)
        exact = duplicate_spans(docs, k=k, scope="cross_doc")
        winnowed = duplicate_spans(docs, k=k, scope="cross_doc", winnow=w)
        ex = {(r["doc_id"], p) for r in exact.collect() for p in range(r["span_start"], r["span_end"])}
        wn = {(r["doc_id"], p) for r in winnowed.collect() for p in range(r["span_start"], r["span_end"])}
        assert wn <= ex, f"trial {trial}: winnowed spans not a subset"
        # the planted repeat must be (at least partly) detected in both docs
        for d in (1, 4):
            start = rows[d][1].index(planted) + 1
            covered = {(d, p) for p in range(start, start + len(planted))}
            assert covered & wn, f"trial {trial}: planted repeat missed in doc {d}"


def test_winnow_positions_thin_and_cover(spark):
    """Every window of w consecutive k-gram positions keeps >= 1
    fingerprint, and the volume drops substantially."""
    rng = np.random.default_rng(3)
    text = "".join(rng.choice(list("abcdef "), size=400))
    docs = _docs(spark, [(0, text)])
    pos = substring_positions(docs, k=10, with_order_hash=True)
    w = 8
    kept = sorted(r["pos"] for r in winnow_positions(pos, w).collect())
    total = pos.count()
    assert len(kept) < total * 0.5  # ~2/(w+1) expected
    for j in range(1, total - w + 2):
        assert any(j <= p <= j + w - 1 for p in kept), f"window at {j} has no fingerprint"


def test_df_cap_drops_boilerplate(spark):
    """A fingerprint repeated in EVERY document (site boilerplate) is
    excluded by df_cap, leaving only the rare duplicate."""
    boiler = "COPYRIGHT NOTICE ALL RIGHTS RESERVED FOREVER"
    rows = [(d, f"doc {d} body starts {boiler} and continues uniquely {d}") for d in range(10)]
    rows[3] = (3, rows[3][1] + " " + PASSAGE)
    rows[7] = (7, rows[7][1] + " " + PASSAGE)
    docs = _docs(spark, rows)
    uncapped = duplicate_spans(docs, k=30, scope="cross_doc")
    capped = duplicate_spans(docs, k=30, scope="cross_doc", df_cap=5)
    assert uncapped.count() >= 10  # boilerplate flagged everywhere
    got = {r["doc_id"] for r in capped.collect()}
    assert got == {3, 7}


def test_strip_keeps_first_occurrence(spark):
    rows = [
        (5, "first home of the passage: " + PASSAGE + " done"),
        (9, "second doc " + PASSAGE + " trailing"),
        (11, "third " + PASSAGE + " x " + PASSAGE + " y"),
    ]
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, k=25).collect()}
    # doc 5 (lowest doc_id) keeps its copy verbatim
    assert out[5]["cleaned_text"] == rows[0][1]
    assert out[5]["removed_chars"] == 0
    # later docs lose the passage (and the duplicated context around it)
    for d in (9, 11):
        assert PASSAGE not in out[d]["cleaned_text"]
        assert out[d]["removed_chars"] > 0
        # text outside spans is preserved in order
        assert out[d]["cleaned_text"] == "".join(
            ch for i, ch in enumerate(rows[{9: 1, 11: 2}[d]][1], start=1)
            if not any(
                s <= i < e
                for s, e in _strip_spans_py(rows, 25).get(d, [])
            )
        )


def _strip_spans_py(rows, k):
    """Python twin of the strip rule: occurrences other than the global
    (doc_id, pos)-first, island-merged."""
    from collections import defaultdict

    occ = defaultdict(list)
    for doc_id, text in rows:
        for i in range(len(text) - k + 1):
            occ[text[i : i + k]].append((doc_id, i + 1))
    marked = defaultdict(set)
    for gram, places in occ.items():
        if len(places) >= 2:
            places = sorted(places)
            for d, p in places[1:]:
                marked[d].add(p)
    spans = defaultdict(list)
    for d, poss in marked.items():
        cur_s = cur_e = None
        for p in sorted(poss):
            if cur_s is None:
                cur_s, cur_e = p, p + k
            elif p <= cur_e:
                cur_e = p + k
            else:
                spans[d].append((cur_s, cur_e))
                cur_s, cur_e = p, p + k
        if cur_s is not None:
            spans[d].append((cur_s, cur_e))
    return spans


def test_error_paths(spark):
    docs = _docs(spark, [(0, "abc")])
    with pytest.raises(ValueError, match="k must be"):
        substring_positions(docs, 0)
    with pytest.raises(ValueError, match="scope"):
        duplicate_spans(docs, k=2, scope="nope")
    with pytest.raises(ValueError, match="winnow"):
        winnow_positions(substring_positions(docs, 2), 0)


def test_rolling_engine_matches_md5_engine(spark):
    """VERDICT r5 #3: the Karp–Rabin engine must produce exactly the
    stride-1 spans and cleaned texts of the md5 engine on randomized
    corpora with planted repeats (hash function is an equality proxy;
    the downstream relational algebra is shared)."""
    rng = np.random.default_rng(99)
    alphabet = list("abcdefgh çñ日")  # multi-byte chars: pos must stay CHAR-based
    for trial in range(3):
        planted = "".join(rng.choice(alphabet, size=35))
        rows = []
        for d in range(8):
            body = "".join(rng.choice(alphabet, size=120))
            if d % 3 == 0:
                at = int(rng.integers(0, 80))
                body = body[:at] + planted + body[at:]
            rows.append((d, body))
        docs = _docs(spark, rows)
        for kwargs in ({"k": 18}, {"k": 18, "scope": "cross_doc"}, {"k": 12, "winnow": 4}):
            a = sorted(map(tuple, duplicate_spans(docs, engine="rolling", **kwargs).collect()))
            b = sorted(map(tuple, duplicate_spans(docs, engine="md5", **kwargs).collect()))
            if "winnow" in kwargs:
                # different order hashes select different (valid) winnow
                # samples — assert the guarantee, not sample identity:
                # both engines must cover the planted >= w+k-1 repeat
                cov_a = {(r[0], p) for r in a for p in range(r[1], r[2])}
                cov_b = {(r[0], p) for r in b for p in range(r[1], r[2])}
                for d, body in rows:
                    if planted in body:
                        s = body.index(planted) + 1
                        pts = {(d, p) for p in range(s, s + len(planted))}
                        assert pts & cov_a and pts & cov_b
            else:
                assert a == b, f"trial {trial} kwargs {kwargs}"
        sa = sorted(map(tuple, strip_duplicate_spans(docs, k=18, engine="rolling").collect()))
        sb = sorted(map(tuple, strip_duplicate_spans(docs, k=18, engine="md5").collect()))
        assert sa == sb


def test_rolling_hash_kernel_properties():
    """Pure-kernel checks, no Spark: equal substrings hash equal at any
    position (the normalization cancels the position term), unequal ones
    differ, and the winnow selector covers every window."""
    import numpy as np

    from article_extraction_spark.operators.substring_dedup import (
        _B1,
        _INV1,
        _window_hashes,
        _winnow_select,
    )

    rng = np.random.default_rng(5)
    core = "shared-passage-here!"
    t1 = "xx" + core + "tail one"
    t2 = "completely other head " + core + "zz"
    k = len(core)
    c1 = np.frombuffer(t1.encode("utf-32-le"), np.uint32).astype(np.uint64)
    c2 = np.frombuffer(t2.encode("utf-32-le"), np.uint32).astype(np.uint64)
    h1 = _window_hashes(c1, k, _B1, _INV1)
    h2 = _window_hashes(c2, k, _B1, _INV1)
    assert h1[t1.index(core)] == h2[t2.index(core)]  # position-independent
    assert len(set(h1.tolist()) | set(h2.tolist())) == h1.size + h2.size - 1
    # brute-force reference: hash == sum(c[i+m] * invB^m) mod 2^64
    ref = sum(int(c1[2 + m]) * pow(_INV1, m, 1 << 64) for m in range(k)) & ((1 << 64) - 1)
    assert int(h1[2]) == ref
    # winnow coverage: every w-window of positions keeps >= 1 selection
    fp = rng.integers(0, 1 << 63, size=200, dtype=np.uint64)
    for w in (2, 5, 17, 199, 200, 300):
        sel = set(_winnow_select(fp, w).tolist())
        for start in range(fp.size):
            assert sel & set(range(start, min(start + w, fp.size)))


def test_no_cartesian_or_bnlj_in_plans(spark):
    """Scale guard, same bar as the dedup family: candidate generation is
    equi-join on fingerprints — no CartesianProduct / BroadcastNestedLoop
    anywhere in the physical plan."""
    rows = [(d, f"document {d} " + PASSAGE) for d in range(8)]
    docs = _docs(spark, rows)
    for df in (
        duplicate_spans(docs, k=20, winnow=4),
        strip_duplicate_spans(docs, k=20),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
