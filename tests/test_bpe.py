"""Byte-level BPE: relational training vs a pure-python reference trainer,
encode/decode round trips, merge-fold semantics, and native array windows.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from article_extraction_spark.extraction.bpe import (
    _B2U,
    bpe_decode_udf,
    bpe_encode_udf,
    bpe_train,
    build_vocab,
    decode_ids,
    encode_text,
    encode_word,
    pretokenize,
    word_to_symbols,
)


def train_reference(texts: list[str], n_merges: int, min_freq: int = 2):
    """Pure-python BPE trainer with the exact same contract as bpe_train:
    per round, count adjacent pairs over the pre-token frequency table,
    pick (count desc, pair lexicographic asc), merge disjoint occurrences
    leftmost-first."""
    words = Counter()
    for t in texts:
        words.update(pretokenize(t))
    syms = {w: word_to_symbols(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, freq in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] += freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_train_matches_python_reference(spark):
    """Relational training == the pure-python trainer, merge for merge,
    on a corpus with repeats, unicode, digits, and punctuation."""
    texts = [
        "low lower lowest low low",
        "the lower the better, the lowest the best",
        "héllo héllo wörld 123 123!",
        "newer newest new new new",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, "text", n_merges=30, checkpoint_every=7)
    want = train_reference(texts, 30)
    assert got == want
    assert len(got) >= 20  # the corpus genuinely supports many merges


def test_train_deterministic(spark):
    texts = [("abc abd abe abc abd",), ("xyz abc abc",)]
    df = spark.createDataFrame(texts, "text string")
    m1 = bpe_train(df, "text", n_merges=8)
    m2 = bpe_train(df, "text", n_merges=8)
    assert m1 == m2 and len(m1) > 0


def test_merge_fold_leftmost_disjoint(spark):
    """The native fold must implement leftmost-first DISJOINT merging:
    'aaa' + (a,a) → [aa, a], never [a, aa] or [aa, aa]."""
    from pyspark.sql import functions as F

    from article_extraction_spark.extraction.bpe import _merge_fold

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a", "a", "b"],), ([],)],
        "syms array<string>",
    )
    got = [r["m"] for r in df.select(_merge_fold("a", "a").alias("m")).collect()]
    assert got == [["aa", "a"], ["aa", "aa"], ["b", "aa", "b"], []]


def test_encode_word_rank_priority():
    """Encoding replays merges lowest-rank-first, not left-to-right."""
    # ranks: (b,c) rank 0, (a,bc) rank 1 — 'abc' must become [abc], which
    # a left-to-right pair scan with (a,b) absent would never form
    ranks = {("b", "c"): 0, ("a", "bc"): 1}
    assert encode_word("abc", ranks) == ["abc"]
    # disjoint pass within one rank: 'bcbc' → [bc, bc]
    assert encode_word("bcbc", {("b", "c"): 0}) == ["bc", "bc"]


def test_roundtrip_hostile_strings():
    texts = [
        "",
        " ",
        "\n\n\t",
        "plain ascii words",
        "héllo wörld — ¡¿emoji 🎉🎊 ok?",
        "mixed   spaces\tand\nnewlines  ",
        "numbers 12345 and 3.14159",
        "null\x00byte and ctrl\x07chars",
        "日本語のテキスト and 한국어",
        "a" * 5000,
    ]
    merges = train_reference(texts, 20)
    ranks = {m: r for r, m in enumerate(merges)}
    vocab = build_vocab(merges)
    for t in texts:
        ids = encode_text(t, ranks, vocab)
        assert decode_ids(ids, merges) == t, repr(t[:40])
        # token ids are dense and bounded
        assert all(0 <= i < 256 + len(merges) for i in ids)


def test_udf_parity_and_memo(spark):
    """The distributed encode/decode equals the pure-python reference on
    every row, including nulls."""
    from pyspark.sql import functions as F

    texts = ["the lower the better", None, "", "héllo 🎉", "the the the"]
    merges = train_reference([t for t in texts if t], 10)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = (
        df.withColumn("ids", bpe_encode_udf(merges)(F.col("text")))
        .withColumn("back", bpe_decode_udf(merges)(F.col("ids")))
        .collect()
    )
    ranks = {m: r for r, m in enumerate(merges)}
    vocab = build_vocab(merges)
    for r in got:
        want = encode_text(r["text"] or "", ranks, vocab)
        assert list(r["ids"]) == want
        assert r["back"] == (r["text"] or "")


def test_byte_alphabet_total():
    """Every byte has a distinct printable symbol (the GPT-2 table)."""
    assert len(_B2U) == 256
    assert len(set(_B2U.values())) == 256
    assert all(len(s) == 1 for s in _B2U.values())


def test_array_windows_matches_iterator(spark):
    """Native array windowing == iter_token_windows across a random sweep
    of lengths × window × stride (the reference's E5 contract)."""
    from pyspark.sql import functions as F

    from article_extraction_spark.extraction.windows import (
        array_windows_col,
        iter_token_windows,
    )

    rng = np.random.RandomState(7)
    cases = []
    for n in [0, 1, 5, 20, 32, 33, 100]:
        cases.append(list(rng.randint(0, 1000, size=n)))
    df = spark.createDataFrame([(i, [int(x) for x in c]) for i, c in enumerate(cases)], "i long, ids array<int>")
    for window, stride in [(8, 8), (8, 4), (32, 24), (5, 3), (100, 50)]:
        got = {
            r["i"]: [list(w) for w in r["w"]]
            for r in df.select("i", array_windows_col(F.col("ids"), window, stride).alias("w")).collect()
        }
        for i, c in enumerate(cases):
            want = [list(w) for w in iter_token_windows(c, window, stride)]
            assert got[i] == want, (i, window, stride)


def test_pack_blocks_on_real_bpe_ids(spark):
    """concat_chunk_plan consumes real BPE token counts: block fill and
    per-doc coverage invariants hold on the actual encoded corpus."""
    from pyspark.sql import functions as F

    from article_extraction_spark.operators.packing import concat_chunk_plan

    texts = [f"doc {i} " + "the lower the better " * (i % 7 + 1) for i in range(40)]
    merges = train_reference(texts, 12)
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    ids_df = df.select(
        "doc_id", F.size(bpe_encode_udf(merges)(F.col("text"))).cast("long").alias("n")
    )
    plan = concat_chunk_plan(ids_df, "n", 64, "doc_id")
    rows = plan.collect()
    plan._retained_cache.unpersist()
    by_block: dict = {}
    by_doc: dict = {}
    for r in rows:
        by_block[r["block_id"]] = by_block.get(r["block_id"], 0) + r["n_tokens"]
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["n_tokens"]
    last = max(by_block)
    assert all(v == 64 for b, v in by_block.items() if b != last)
    want = {r["doc_id"]: r["n"] for r in ids_df.collect()}
    assert by_doc == want


def train_reference_batched(texts, n_merges, batch_merges, min_freq=2):
    """Python twin of bpe_train's batched mode: per round, rank pairs by
    (count desc, pair lex asc), take the top 4*m candidates, greedily keep
    a symbol-disjoint subset ({a, b, a+b} sets must not intersect), apply
    all kept merges. Returns (merges, rounds)."""
    words = Counter()
    for t in texts:
        words.update(pretokenize(t))
    syms = {w: word_to_symbols(w) for w in words}
    merges, rounds = [], 0
    while len(merges) < n_merges:
        m = min(batch_merges, n_merges - len(merges))
        rounds += 1
        pair_counts: Counter = Counter()
        for w, freq in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] += freq
        cands = sorted(
            ((c, p) for p, c in pair_counts.items() if c >= min_freq),
            key=lambda kv: (-kv[0], kv[1]),
        )[: max(1, 4 * m)]
        if not cands:
            break
        used, kept = set(), []
        for _c, (a, b) in cands:
            if len(kept) >= m:
                break
            if a in used or b in used or (a + b) in used:
                continue
            kept.append((a, b))
            used.update((a, b, a + b))
        merges.extend(kept)
        for a, b in kept:
            for w, s in syms.items():
                out, i = [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                syms[w] = out
    return merges[:n_merges], rounds


def test_batched_training_matches_batched_twin(spark):
    """VERDICT r5 #2: batch_merges=M applies a greedy symbol-disjoint
    top-M subset per driver round; the Spark implementation must equal
    the python batched twin merge-for-merge, and M=1 must stay bit-exact
    sequential (== train_reference)."""
    texts = [
        "low lower lowest low low",
        "the lower the better, the lowest the best",
        "héllo héllo wörld 123 123!",
        "newer newest new new new",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for m in (1, 4):
        stats: dict = {}
        got = bpe_train(df, "text", n_merges=24, batch_merges=m, round_stats=stats)
        want, want_rounds = train_reference_batched(texts, 24, m)
        assert got == want, m
        assert stats["rounds"] == want_rounds
    assert bpe_train(df, "text", n_merges=24, batch_merges=1) == train_reference(texts, 24)
    with pytest.raises(ValueError):
        bpe_train(df, "text", n_merges=4, batch_merges=0)


def test_batched_training_round_count_and_roundtrip(spark):
    """The scale claim made concrete: >=200 merges in about ceil(200/M)
    driver rounds (greedy disjointness may keep slightly fewer than M per
    round — allow small slack), and the batched tokenizer still satisfies
    decode(encode(text)) == text exactly."""
    rng = np.random.default_rng(23)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    vocab_words = [
        "".join(rng.choice(list(alpha), size=8)) for _ in range(150)
    ]
    texts = [
        " ".join(rng.choice(vocab_words, size=40)) for _ in range(60)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    stats: dict = {}
    merges = bpe_train(
        df, "text", n_merges=200, batch_merges=16, checkpoint_every=32,
        round_stats=stats,
    )
    assert len(merges) == 200
    assert stats["rounds"] <= -(-200 // 16) + 5, stats  # ceil + slack
    # kept merges are usable: exact roundtrip through the full id space
    ranks = {mm: r for r, mm in enumerate(merges)}
    vocab = build_vocab(merges)
    for t in texts[:5] + ["héllo wörld, 12 punct!? \n\ttabs"]:
        ids = encode_text(t, ranks, vocab)
        assert decode_ids(ids, merges) == t
