"""Tests for training-data operators: dedup, similarity search, text stats,
multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (4, "completely different content about spark partitions and shuffle behavior"),
    (5, "el rio la casa de que los gatos el la de que los"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates(spark):
    from article_extraction_spark.operators.dedup import exact_duplicates

    got = exact_duplicates(_docs(spark), "doc_id", "text").collect()
    assert len(got) == 1
    assert got[0]["n_dups"] == 2 and got[0]["doc_ids"] == [1, 2]


def test_minhash_near_dups(spark):
    from article_extraction_spark.operators.dedup import minhash_dedup

    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             minhash_dedup(_docs(spark), "doc_id", "text", threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert all(4 not in p and 5 not in p for p in pairs)


def test_simhash_near_dups(spark):
    from article_extraction_spark.operators.dedup import simhash_col, simhash_near_duplicates

    df = _docs(spark)
    sims = {r["doc_id"]: r["sh"] for r in df.select("doc_id", simhash_col(F.col("text")).alias("sh")).collect()}
    assert sims[1] == sims[2]  # identical text → identical simhash
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_near_duplicates(df, "doc_id", "text", max_hamming=6).collect()}
    assert (1, 2) in got and (1, 3) in got


def test_embedding_near_dups(spark):
    from article_extraction_spark.operators.dedup import embedding_near_duplicates

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.001, 0.0, 0.0]),  # near-identical direction
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_near_duplicates(df, "vec_id", "v", threshold=0.99, n_planes=6).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (3, 4) not in got


def test_dedup_cache_lifecycle(spark):
    """VERDICT r1: dedup calls must not leak persisted intermediates. With
    eager=True (default) the only surviving cached artifact is the returned
    pair table; unpersisting it leaves the session exactly as before."""
    from article_extraction_spark.operators.dedup import (
        embedding_near_duplicates,
        minhash_dedup,
        simhash_near_duplicates,
    )

    def cached_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    docs = _docs(spark)
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id long, v array<double>",
    )
    for result in (
        minhash_dedup(docs, "doc_id", "text", threshold=0.5),
        simhash_near_duplicates(docs, "doc_id", "text", max_hamming=6),
        embedding_near_duplicates(emb, "vec_id", "v", threshold=0.99, n_planes=4),
    ):
        before_release = cached_ids()
        result.unpersist(blocking=True)
        after = cached_ids()
        # exactly one cache (the result) was added and is now gone
        assert len(before_release - after) == 1, (before_release, after)
    # nothing from the three calls survives
    assert all("shingle" not in str(x) for x in cached_ids())


def test_embedding_multiprobe_recalls_one_bit_neighbors(spark):
    """A near-duplicate that lands one hyperplane sign away from its twin
    must be recalled with probe_hamming=1 (VERDICT r1 recall cliff)."""
    import numpy as np

    from article_extraction_spark.operators.dedup import embedding_near_duplicates

    n_planes, seed, dim = 6, 42, 8
    rng_p = np.random.RandomState(seed)
    planes = rng_p.randn(dim, n_planes)

    def key(v):
        return int((((v @ planes) > 0) * (1 << np.arange(n_planes))).sum())

    def hamming(a, b):
        return bin(a ^ b).count("1")

    # search deterministically for a vector whose tiny perturbation flips
    # EXACTLY one sign bit while keeping cosine high
    rng = np.random.RandomState(7)
    planted = None
    while planted is None:
        v = rng.randn(dim)
        v /= np.linalg.norm(v)
        for scale in (0.02, 0.05, 0.1):
            w = v + scale * rng.randn(dim)
            w /= np.linalg.norm(w)
            cos = float(v @ w)
            if hamming(key(v), key(w)) == 1 and cos > 0.95:
                planted = (v, w, cos)
                break
    v, w, _ = planted
    fillers = [(i, [float(x) for x in rng.randn(dim)]) for i in range(10, 30)]
    rows = [(1, [float(x) for x in v]), (2, [float(x) for x in w])] + fillers
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    kwargs = dict(threshold=0.95, n_planes=n_planes, seed=seed, dim=dim)
    no_probe = {(r["id_a"], r["id_b"]) for r in
                embedding_near_duplicates(df, "vec_id", "v", probe_hamming=0, **kwargs).collect()}
    probed = {(r["id_a"], r["id_b"]) for r in
              embedding_near_duplicates(df, "vec_id", "v", probe_hamming=1, **kwargs).collect()}
    assert (1, 2) not in no_probe  # the pair straddles a hyperplane
    assert (1, 2) in probed        # multiprobe recovers it


def test_brute_force_and_lsh_topk(spark):
    from article_extraction_spark.operators.similarity_search import brute_force_topk, lsh_topk

    import numpy as np

    rng = np.random.RandomState(0)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    query = vecs[0][1]
    exact = [r["vec_id"] for r in brute_force_topk(df, "v", query, k=5).collect()]
    assert exact[0] == 0  # self-similarity = 1.0 tops the list
    approx = [r["vec_id"] for r in lsh_topk(df, "v", query, k=5, n_planes=6, probe_hamming=2).collect()]
    assert approx[0] == 0
    assert len(set(exact) & set(approx)) >= 2  # decent recall on easy data


def test_textstats(spark):
    from article_extraction_spark.operators.textstats import (
        bpe_ish_token_count_col,
        fingerprint_col,
        lang_guess_col,
        punct_ratio_col,
        quality_score_col,
        token_count_col,
    )

    df = _docs(spark).withColumn("t", F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        token_count_col(F.col("t")).alias("tok"),
        bpe_ish_token_count_col(F.col("t")).alias("bpe"),
        punct_ratio_col(F.col("t")).alias("punct"),
        quality_score_col(F.col("t")).alias("q"),
        lang_guess_col(F.col("t")).alias("lang"),
        fingerprint_col(F.col("t")).alias("fp"),
    ).collect()}
    assert out[1]["tok"] == 14
    assert out[1]["bpe"] >= out[1]["tok"]  # subwords ≥ words
    assert out[1]["punct"] == 0.0
    assert out[1]["lang"] == "en"
    assert out[5]["lang"] == "es"
    assert out[1]["fp"] == out[2]["fp"] and out[1]["fp"] != out[3]["fp"]
    assert 0.0 <= out[4]["q"] <= 1.0
    # empty / null robustness
    edge = spark.createDataFrame([("",), (None,)], "t string")
    got = edge.select(token_count_col(F.col("t")).alias("tok"), lang_guess_col(F.col("t")).alias("lg")).collect()
    assert [r["tok"] for r in got] == [0, 0]
    assert [r["lg"] for r in got] == ["und", "und"]


def test_script_lang_and_gopher(spark):
    from article_extraction_spark.operators.textstats import gopher_flags_col, lang_id_col

    rows = [
        (1, "这是一个中文文档的例子 其中包含很多汉字 足够触发判断"),
        (2, "これは日本語のテキストです ひらがなとカタカナ"),
        (3, "Это русский текст с кириллицей для проверки"),
        (4, "the quick brown fox and the lazy dog " * 10),
        (5, "el rio la casa de que los gatos"),
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    langs = {r["id"]: r["l"] for r in df.select("id", lang_id_col(F.col("t")).alias("l")).collect()}
    assert langs == {1: "zh", 2: "ja", 3: "ru", 4: "en", 5: "es"}

    good = "the words be to of and that have with " * 12  # 108 words, clean
    bad_rows = [
        (1, good),
        (2, "short text"),  # word count fails
        (3, "the be to of and " + "#tag " * 60),  # symbol ratio fails
        (4, "\n".join("- bullet line the be of and that have with extra words here" for _ in range(20))),  # bullets fail
        (5, None),
    ]
    bdf = spark.createDataFrame(bad_rows, "id int, t string")
    flags = {r["id"]: r["g"] for r in bdf.select("id", gopher_flags_col(F.col("t")).alias("g")).collect()}
    assert flags[1]["passes"]
    assert not flags[2]["word_count_ok"] and not flags[2]["passes"]
    assert not flags[3]["symbol_ratio_ok"]
    assert not flags[4]["bullet_ratio_ok"]
    assert not flags[5]["passes"]


def test_multimodal_plumbing(spark):
    from article_extraction_spark.operators.multimodal import extract_media_features, frame_sample_plan

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"\x89PNG fake"), "image/png", 4, 4, None),
            (2, "video", bytearray(b"\x00\x00ftyp fake"), "video/mp4", None, None, 3500),
            (3, "audio", None, None, None, None, 1000),
        ],
        "media_id long, kind string, payload binary, mime string, width int, height int, duration_ms int",
    )
    feats = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats[1]["n_bytes"] == 9 and len(feats[1]["feature"]) == 8
    assert feats[3]["content_hash"] is None and feats[3]["n_bytes"] == 0
    # deterministic: same payload → same hash/feature
    feats2 = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert feats2[1]["content_hash"] == feats[1]["content_hash"]
    assert list(feats2[1]["feature"]) == list(feats[1]["feature"])

    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [(r["frame_idx"], r["ts_ms"]) for r in frames] == [(0, 0), (1, 1000), (2, 2000), (3, 3000)]


def test_redact_pii(spark):
    from article_extraction_spark.operators.textstats import redact_pii

    df = spark.createDataFrame(
        [
            ("mail a.b+c@ex-ample.org or 192.168.1.1 acct 987654321",),
            ("no pii here 1234",),
            (None,),
        ],
        "text string",
    )
    got = redact_pii(df, "text").collect()
    r0 = got[0]
    assert (r0["n_email"], r0["n_ipv4"], r0["n_longnum"]) == (1, 1, 1)
    assert r0["redacted"] == "mail [PII] or [PII] acct [PII]"
    r1 = got[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_longnum"]) == (0, 0, 0)
    assert got[2]["redacted"] == ""  # NULL-safe


def test_contamination_check(spark):
    from article_extraction_spark.operators.dedup import contamination_check

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),       # shares 3-grams with bench
            (2, "completely unrelated words entirely"),  # clean
            (3, "the quick brown fox jumps high"),       # identical to 1
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "we saw the quick brown fox yesterday")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_overlap"], r["contaminated"]) for r in
           contamination_check(corpus, bench, "doc_id", "text", ngram=3).collect()}
    # shared 3-grams: "the quick brown", "quick brown fox"
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (2, True)


def test_image_pixel_features_raw_rgb8(spark):
    """Real pixel math over raw payloads: channel means/std and a nearest-
    neighbor thumbnail verified against numpy ground truth."""
    import numpy as np

    from article_extraction_spark.operators.multimodal import (
        RAW_RGB8,
        image_pixel_features,
        resize_nearest,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(img.tobytes()), RAW_RGB8, 12, 16, None),
        (2, "image", bytearray(b"short"), RAW_RGB8, 12, 16, None),  # bad length
        # webp needs PIL (PNG and baseline JPEG no longer do — stdlib
        # codecs, test_codecs.py)
        (3, "image", bytearray(b"RIFF....WEBP"), "image/webp", 4, 4, None),
    ]
    from article_extraction_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in image_pixel_features(media, out_w=4, out_h=4).collect()}

    exp_mean = img.reshape(-1, 3).mean(axis=0) / 255.0
    np.testing.assert_allclose(got[1]["channel_mean"], exp_mean, rtol=1e-12)
    exp_thumb = resize_nearest(img, 4, 4).astype(np.float64) / 255.0
    np.testing.assert_allclose(got[1]["thumb"], exp_thumb.ravel(), rtol=1e-6)
    assert got[1]["decode_error"] is None
    assert "size mismatch" in got[2]["decode_error"]
    try:
        import PIL  # noqa: F401

        has_pil = True
    except Exception:
        has_pil = False
    if not has_pil:
        assert "needs PIL" in got[3]["decode_error"]


def test_audio_pcm_stats(spark):
    import numpy as np

    from article_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PCM16,
        audio_pcm_stats,
    )

    pcm = (np.sin(np.linspace(0, 20, 1000)) * 16384).astype("<i2")
    rows = [
        (1, "audio", bytearray(pcm.tobytes()), PCM16, None, None, 1000),
        (2, "audio", bytearray(b"xx"), "audio/mp3", None, None, 10),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in audio_pcm_stats(media).collect()}
    ref = pcm.astype(np.float64) / 32768.0
    assert got[1]["n_samples"] == 1000
    assert abs(got[1]["rms"] - float(np.sqrt((ref**2).mean()))) < 1e-12
    assert abs(got[1]["peak"] - float(np.abs(ref).max())) < 1e-12
    assert "needs soundfile" in got[2]["decode_error"]


def test_repetition_stats(spark):
    from article_extraction_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),           # 1 distinct word, bigram 'spam spam' x3
            (2, "all words here are distinct"),
            (3, ""),                               # empty-safe
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert got[1]["n_words"] == 4 and got[1]["n_distinct_words"] == 1
    assert abs(got[1]["dup_word_ratio"] - 0.75) < 1e-12
    assert got[1]["top_bigram_n"] == 3 and got[1]["n_bigrams"] == 3
    assert got[1]["top_bigram_share"] == 1.0
    assert got[2]["dup_word_ratio"] == 0.0 and got[2]["top_bigram_share"] == 0.25
    assert got[3]["n_words"] == 0 and got[3]["dup_word_ratio"] == 0.0


def test_connected_components(spark):
    from article_extraction_spark.operators.dedup import connected_components

    # two chains and a triangle: {1-2-3-4}, {10-11}, {20-21-22 triangle}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    labels = connected_components(edges)
    got = {r["id"]: r["component"] for r in labels.collect()}
    labels.unpersist(blocking=True)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    # nothing this call created survives after the caller releases the result
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), after - before


def test_connected_components_cleans_checkpoints(spark):
    """r3: CC uses public reliable .checkpoint() (no _jsc bookkeeping);
    superseded rounds' checkpoint files are swept, only the final round's
    files survive as the executor-loss recovery path."""
    import os
    import re

    from article_extraction_spark.operators.dedup import (
        _checkpoint_rdd_dirs,
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(100, 101)], "id_a long, id_b long"
    )
    before = _checkpoint_rdd_dirs(spark.sparkContext.getCheckpointDir())
    labels = connected_components(edges)
    resolved = spark.sparkContext.getCheckpointDir()
    assert resolved is not None
    survivors = _checkpoint_rdd_dirs(resolved) - before
    # local mode: the persisted result is the only copy needed — ALL of this
    # call's checkpoint files are swept (review r3: one leaked label table
    # per call otherwise); on a cluster the final round's files would remain
    assert survivors == set(), survivors
    assert os.path.isdir(re.sub(r"^file:/{0,2}(?=/)", "", resolved))
    got = {r["id"]: r["component"] for r in labels.collect()}
    labels.unpersist(blocking=True)
    assert set(got.values()) == {0, 100}


def test_simhash_batch_kernel_parity():
    """Property test (VERDICT r3 item 3): the whole-batch simhash kernel is
    bit-equal to the per-row scalar twin across chunk boundaries, empty/None
    rows, memo churn, and non-ASCII — no SparkSession needed."""
    import random
    import string

    import pandas as pd

    import article_extraction_spark.operators.dedup as D

    rng = random.Random(1234)

    def rand_text():
        c = rng.random()
        if c < 0.06:
            return None
        if c < 0.12:
            return ""
        if c < 0.18:
            return "!!! ??? ... ---"
        n = rng.randint(1, 120)
        alphabet = string.ascii_letters + string.digits + "éß漢!,. "
        return " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
            for _ in range(n)
        )

    texts = [rand_text() for _ in range(400)]
    expected = [D._simhash64_scalar(t) for t in texts]
    saved = (D._SIMHASH_CHUNK_TOKENS, D._SIMHASH_MEMO_MAX)
    try:
        for chunk, memo_max in [(1 << 18, 1_000_000), (17, 1_000_000), (64, 5)]:
            D._SIMHASH_CHUNK_TOKENS = chunk
            D._SIMHASH_MEMO_MAX = memo_max
            D._SIMHASH_MEMO.clear()
            D._SIMHASH_BUFS.clear()
            got = list(D._simhash64_batch(pd.Series(texts, dtype=object)))
            assert got == expected, (chunk, memo_max)
    finally:
        D._SIMHASH_CHUNK_TOKENS, D._SIMHASH_MEMO_MAX = saved
        D._SIMHASH_MEMO.clear()
        D._SIMHASH_BUFS.clear()


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    from article_extraction_spark.operators.dedup import connected_components

    # min-label propagation reaches one hop per round: an 8-deep chain
    # cannot converge in 3 rounds but does within 10
    chain = spark.createDataFrame([(i, i + 1) for i in range(8)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=3)
    labels = connected_components(chain, max_iterations=10)
    got = {r["id"]: r["component"] for r in labels.collect()}
    labels.unpersist(blocking=True)
    assert set(got.values()) == {0}


def test_embedding_probe_hamming_validation(spark):
    import pytest

    from article_extraction_spark.operators.dedup import embedding_near_duplicates

    df = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, v array<double>")
    with pytest.raises(ValueError, match="probe_hamming"):
        embedding_near_duplicates(df, "vec_id", "v", probe_hamming=3, dim=2)
    # probe_hamming=2 runs and finds nothing here (orthogonal vectors)
    out = embedding_near_duplicates(df, "vec_id", "v", threshold=0.99, probe_hamming=2, n_planes=4, dim=2)
    assert out.count() == 0
    out.unpersist(blocking=True)


def test_concat_chunk_plan_invariants(spark):
    """Sequence-packing plan: blocks tile the concatenated token stream
    exactly — full blocks sum to block_tokens, per-doc spans sum to the
    doc's count, doc and block offsets are gapless, zero-token docs vanish."""
    import random

    from article_extraction_spark.operators.packing import concat_chunk_plan

    rng = random.Random(17)
    rows = [(i, rng.choice([0, 1, 3, 7, 50, 128, 513])) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    B = 128
    plan = concat_chunk_plan(df, "n_tok", B, order_col="doc_id")
    got = plan.collect()
    plan._retained_cache.unpersist()

    total = sum(c for _, c in rows)
    n_blocks = -(-total // B)
    by_block = {}
    by_doc = {}
    for r in got:
        by_block.setdefault(r["block_id"], []).append(r)
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert 0 < r["n_tokens"] <= B
    assert set(by_block) == set(range(n_blocks))
    for bid, spans in by_block.items():
        spans.sort(key=lambda r: r["block_offset"])
        expected = B if bid < n_blocks - 1 else total - B * (n_blocks - 1)
        assert sum(r["n_tokens"] for r in spans) == expected
        pos = 0
        for s in spans:  # gapless tiling of the block
            assert s["block_offset"] == pos
            pos += s["n_tokens"]
    counts = dict(rows)
    assert set(by_doc) == {i for i, c in rows if c > 0}
    for did, spans in by_doc.items():
        spans.sort(key=lambda r: r["doc_offset"])
        assert sum(r["n_tokens"] for r in spans) == counts[did]
        pos = 0
        for s in spans:  # gapless tiling of the doc
            assert s["doc_offset"] == pos
            pos += s["n_tokens"]
        # consecutive blocks
        bids = [s["block_id"] for s in spans]
        assert bids == list(range(bids[0], bids[0] + len(bids)))


def test_bigram_lm_score(spark):
    """Add-1 bigram LM scoring: repeated in-domain bigrams score higher
    than unseen ones; hand-checked probabilities on a 3-doc corpus."""
    import math

    from article_extraction_spark.operators.textstats import bigram_lm_score

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a b"),
            (3, "z q"),      # bigram seen once, by itself
            (4, "x"),        # single token: no bigrams -> NULL score
        ],
        "doc_id long, text string",
    )
    scored = bigram_lm_score(docs, "doc_id", "text")
    got = {r["doc_id"]: r for r in scored.collect()}
    scored._retained_cache.unpersist()
    # corpus: unigrams a:3 b:3 z:1 q:1 x:1 (V=5);
    # bigrams ab:3 (2 from doc1 + 1 from doc2), ba:1, zq:1
    p_ab = (3 + 1) / (3 + 5)
    p_ba = (1 + 1) / (3 + 5)
    p_zq = (1 + 1) / (1 + 5)
    assert got[1]["n_bigrams"] == 3
    assert abs(got[1]["lm_score"] - round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)) < 1e-9
    assert abs(got[2]["lm_score"] - round(math.log(p_ab), 6)) < 1e-9
    assert abs(got[3]["lm_score"] - round(math.log(p_zq), 6)) < 1e-9
    assert got[4]["lm_score"] is None and got[4]["n_bigrams"] == 0
    # in-domain (repeated) text outscores the one-off bigram
    assert got[1]["lm_score"] > got[3]["lm_score"]
    # scoring NEW text against a trained LM: unseen bigrams get the floor
    new = spark.createDataFrame([(9, "q a")], "doc_id long, text string")
    scored_new = bigram_lm_score(new, "doc_id", "text", lm_corpus=docs)
    out = {r["doc_id"]: r for r in scored_new.collect()}
    scored_new._retained_cache.unpersist()
    p_floor = (0 + 1) / (1 + 5)  # n(qa)=0, n(q.)=1
    assert abs(out[9]["lm_score"] - round(math.log(p_floor), 6)) < 1e-9


def test_remove_boilerplate_lines(spark):
    from article_extraction_spark.operators.textstats import remove_boilerplate_lines

    banner = "SUBSCRIBE NOW"
    docs = spark.createDataFrame(
        [
            (1, f"{banner}\nreal content one\n\n  {banner}  \nmore text"),
            (2, f"{banner}\nsecond doc body"),
            (3, f"{banner}\nthird doc body"),
            (4, "no banner here\njust text"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           remove_boilerplate_lines(docs, "doc_id", "text", max_doc_freq=2).collect()}
    # banner appears (trim-normalized) in 3 distinct docs > threshold 2
    assert got[1]["text_clean"] == "real content one\nmore text"
    assert got[1]["n_lines"] == 5 and got[1]["n_lines_kept"] == 2
    assert got[2]["text_clean"] == "second doc body"
    assert got[4]["text_clean"] == "no banner here\njust text"
    assert got[5]["text_clean"] == "" and got[5]["n_lines_kept"] == 0


def test_collapse_repeated_lines(spark):
    from article_extraction_spark.operators.textstats import collapse_repeated_lines

    docs = spark.createDataFrame(
        [
            (1, "Menu\nMenu\nMenu\nreal text\nmore text\nmore text"),
            (2, "a\n\na\na"),          # blank separates; then a duplicate
            (3, "only line"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           collapse_repeated_lines(docs, "doc_id", "text").collect()}
    assert got[1]["text_clean"] == "Menu\nreal text\nmore text"
    assert got[1]["n_collapsed"] == 3
    # 'a' after a blank is NOT consecutive with the first 'a'; the second
    # pair collapses
    assert got[2]["text_clean"] == "a\n\na"
    assert got[2]["n_collapsed"] == 1
    assert got[3]["text_clean"] == "only line" and got[3]["n_collapsed"] == 0
    assert got[4]["text_clean"] == "" and got[4]["n_lines"] == 1


def test_connected_components_stress(spark):
    """Moderate-scale stress for the reliable-checkpoint CC (r3 impl):
    20k vertices / 40k random edges + a 30-hop chain — converges, labels
    verified on the chain and by component-count sanity."""
    import time

    from pyspark.sql import functions as SF

    from article_extraction_spark.operators.dedup import connected_components

    edges = (
        spark.range(40_000)
        .select(
            (SF.xxhash64("id") % 20_000).alias("id_a"),
            (SF.xxhash64("id", SF.lit(1)) % 20_000).alias("id_b"),
        )
        .select(SF.abs("id_a").alias("id_a"), SF.abs("id_b").alias("id_b"))
        .where(SF.col("id_a") != SF.col("id_b"))
    )
    chain = spark.createDataFrame(
        [(100_000 + i, 100_000 + i + 1) for i in range(30)], "id_a long, id_b long"
    )
    t0 = time.time()
    labels = connected_components(edges.unionByName(chain), max_iterations=40)
    rows = labels.collect()
    elapsed = time.time() - t0
    got = {r["id"]: r["component"] for r in rows}
    labels.unpersist(blocking=True)
    # the 30-hop chain collapses to its min label
    assert all(got[100_000 + i] == 100_000 for i in range(31))
    # random-graph sanity: far fewer components than vertices (giant
    # component emerges at 2 edges/vertex), every label is a member id
    n_vertices = len(got)
    n_components = len(set(got.values()))
    assert n_components < n_vertices / 10
    assert set(got.values()) <= set(got)
    assert elapsed < 240, f"CC stress took {elapsed:.0f}s"


def test_collapse_repeated_lines_idempotent(spark):
    """Property: collapsing twice equals collapsing once (fixed point)."""
    import random

    from article_extraction_spark.operators.textstats import collapse_repeated_lines

    rng = random.Random(5)
    docs = []
    for i in range(60):
        lines = []
        for _ in range(rng.randrange(0, 12)):
            r = rng.random()
            if r < 0.3:
                lines.append("dup line")
            elif r < 0.4:
                lines.append("")
            elif r < 0.5:
                lines.append("  dup line  ")  # trim-equal variant
            else:
                lines.append(f"uniq {rng.randrange(1000)}")
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    once = collapse_repeated_lines(df, "doc_id", "text").select(
        "doc_id", F.col("text_clean").alias("text")
    )
    twice = collapse_repeated_lines(once, "doc_id", "text")
    bad = {r["doc_id"]: r["n_collapsed"] for r in twice.collect() if r["n_collapsed"] > 0}
    assert not bad, bad


# ---------------------------------------------------------------------------
# round 4: native-first codec dispatch (_decode_image / _decode_audio)
# ---------------------------------------------------------------------------


def _install_fake_pil(monkeypatch, open_fn):
    """Inject a minimal fake PIL into sys.modules (driver-side only — these
    dispatch tests run the pure functions, no Spark workers involved)."""
    import sys
    import types

    from article_extraction_spark.operators import multimodal

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = open_fn
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    monkeypatch.setattr(multimodal, "_PIL_OK", None)  # drop the probe cache


def test_decode_image_prefers_native_backend(monkeypatch):
    """When PIL imports, in-scope PNG/JPEG route through it FIRST (native
    libs are the 100×-scale plan); the stdlib spec codec is the fallback."""
    import numpy as np

    from article_extraction_spark.functions.codecs import encode_jpeg, encode_png
    from article_extraction_spark.operators import multimodal

    calls = []
    fake_pixels = np.full((5, 7, 3), 9, dtype=np.uint8)

    class _FakeImg:
        def convert(self, mode):
            assert mode == "RGB"
            return fake_pixels

    def fake_open(buf):
        calls.append(len(buf.getvalue()))
        return _FakeImg()

    _install_fake_pil(monkeypatch, fake_open)
    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    for payload in (encode_png(img), encode_jpeg(img)):
        got = multimodal._decode_image(
            multimodal.PNG if payload[:4] == b"\x89PNG" else multimodal.JPEG,
            payload, None, None,
        )
        np.testing.assert_array_equal(got, fake_pixels)  # PIL's answer won
    assert len(calls) == 2
    # raw-rgb8 never touches a codec backend
    raw = multimodal._decode_image(multimodal.RAW_RGB8, img.tobytes(), 7, 5)
    np.testing.assert_array_equal(raw, img)
    assert len(calls) == 2


def test_decode_image_native_failure_falls_back_to_stdlib(monkeypatch):
    """A PIL that rejects the file (corrupt-for-PIL) must not kill the row:
    the stdlib spec codec gets a try and produces the real pixels."""
    import numpy as np

    from article_extraction_spark.functions.codecs import encode_png
    from article_extraction_spark.operators import multimodal

    def broken_open(buf):
        raise OSError("fake PIL cannot identify image file")

    _install_fake_pil(monkeypatch, broken_open)
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    got = multimodal._decode_image(multimodal.PNG, encode_png(img), None, None)
    np.testing.assert_array_equal(got, img)


def test_decode_image_png_out_of_scope_routes_to_pil(monkeypatch):
    """ADVICE r3 (medium): 16-bit / Adam7 PNGs must fall THROUGH to the PIL
    branch like the JPEG path does — absent PIL that surfaces as the
    needs-PIL error, not the stdlib codec's ValueError."""
    import pytest

    import numpy as np

    from article_extraction_spark.functions.codecs import encode_png
    from article_extraction_spark.operators import multimodal

    monkeypatch.setattr(multimodal, "_PIL_OK", False)
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    good = bytearray(encode_png(img))
    # IHDR data starts at offset 16; depth byte is IHDR[8], interlace IHDR[12]
    deep = bytes(good[:24]) + b"\x10" + bytes(good[25:])       # depth 16
    inter = bytes(good[:28]) + b"\x01" + bytes(good[29:])      # Adam7
    for variant in (deep, inter):
        with pytest.raises(NotImplementedError, match="needs PIL"):
            multimodal._decode_image(multimodal.PNG, variant, None, None)


def test_decode_audio_native_first_and_fallback(monkeypatch):
    import sys
    import types

    import numpy as np

    from article_extraction_spark.functions.codecs import decode_wav, encode_wav
    from article_extraction_spark.operators import multimodal

    tone = np.sin(np.linspace(0, 10, 400)) * 0.5
    wav = encode_wav(tone, rate=8000)

    fake_samples = np.full(17, 0.25)
    calls = []

    def fake_read(buf, dtype="float64"):
        calls.append(dtype)
        return fake_samples, 8000

    sf = types.ModuleType("soundfile")
    sf.read = fake_read
    monkeypatch.setitem(sys.modules, "soundfile", sf)
    monkeypatch.setattr(multimodal, "_SF_OK", None)
    got = multimodal._decode_audio(multimodal.WAV, wav)
    np.testing.assert_array_equal(got, fake_samples)  # soundfile preferred
    assert calls == ["float64"]

    # native backend rejects the file → stdlib wave fallback, real samples
    def broken_read(buf, dtype="float64"):
        raise RuntimeError("fake libsndfile error")

    sf.read = broken_read
    got = multimodal._decode_audio(multimodal.WAV, wav)
    np.testing.assert_array_equal(got, decode_wav(wav)[0].ravel())


def test_decode_image_backend_parity_real_pil():
    """Cross-backend parity on the oracle fixture classes: lossless PNG
    decodes byte-identically on PIL vs the stdlib codec, and solid-color
    (DC-only) JPEG — the jpeg_decode oracle's fixture class — matches
    exactly, so flipping backends cannot move the oracles."""
    import pytest

    np = pytest.importorskip("numpy")
    pytest.importorskip("PIL")
    from article_extraction_spark.functions.codecs import (
        decode_jpeg,
        decode_png,
        encode_jpeg,
        encode_png,
    )
    from article_extraction_spark.operators import multimodal

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    gray = np.repeat(rng.randint(0, 256, size=(9, 13, 1), dtype=np.uint8), 3, axis=2)
    for img in (rgb, gray):
        payload = encode_png(img)
        np.testing.assert_array_equal(
            multimodal._pil_decode(multimodal.PNG, payload), decode_png(payload)
        )
    solid = np.full((16, 16, 3), 200, dtype=np.uint8)
    jp = encode_jpeg(solid, quant=1)
    pil_img = multimodal._pil_decode(multimodal.JPEG, jp)
    np.testing.assert_array_equal(pil_img, decode_jpeg(jp))


def test_kmeans_fit_invariants_and_determinism(spark):
    """DataFrame-native Lloyd's: converged centroids are the means of
    their assigned points, the objective is no worse than at init, and
    two runs with the same seed are identical."""
    import numpy as np

    from article_extraction_spark.operators.similarity_search import (
        kmeans_fit,
        nearest_centroid_col,
    )

    rng = np.random.RandomState(5)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    rows = [(i, (centers[i % 3] + rng.randn(2) * 0.3).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    c1 = kmeans_fit(df, "v", k=3, max_iter=10, seed=42)
    c2 = kmeans_fit(df, "v", k=3, max_iter=10, seed=42)
    assert c1 == c2  # deterministic end-to-end

    # each converged centroid is the mean of its assigned points
    assigned = df.select("v", nearest_centroid_col("v", c1).alias("c")).collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r["c"], []).append(r["v"])
    for ci, vs in by_cluster.items():
        mean = np.mean(np.asarray(vs), axis=0)
        np.testing.assert_allclose(mean, c1[ci], atol=1e-9)
    # blobs recovered: each fitted centroid sits on one true center
    found = sorted(tuple(round(x) for x in c) for c in c1)
    assert found == [(0, 0), (0, 10), (10, 0)], found


def test_ivf_topk_exhaustive_equals_brute_force(spark, tmp_path):
    import numpy as np

    from article_extraction_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
        write_ivf,
    )

    rng = np.random.RandomState(9)
    rows = [(i, rng.randn(12).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    centroids = kmeans_fit(df, "v", k=5, max_iter=4, seed=1)
    path = str(tmp_path / "ivf")
    write_ivf(df, path, "v", centroids)
    query = rows[3][1]
    exact = brute_force_topk(df, "v", query, k=10).collect()
    approx = ivf_topk(spark, path, "v", query, centroids, k=10, nprobe=len(centroids)).collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in exact] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in approx
    ]


def test_write_ivf_rejects_dim_mismatch(spark, tmp_path):
    """A vector whose length differs from the centroid dim must FAIL the
    write (review r5: the old assert lived on a projected-then-dropped
    column, so Catalyst pruned it and the row silently landed in
    cluster=__HIVE_DEFAULT_PARTITION__, excluded from every probe)."""
    import pytest

    from article_extraction_spark.operators.similarity_search import write_ivf

    centroids = [[0.0, 0.0], [10.0, 10.0]]
    bad = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [1.0, 2.0, 3.0])],  # row 2: dim 3 != 2
        "vec_id long, v array<double>",
    )
    with pytest.raises(Exception) as ei:
        write_ivf(bad, str(tmp_path / "ivf_bad"), "v", centroids)
    assert "centroid dim" in str(ei.value)
    # good vectors (plus a NULL, which is excluded by contract) still write
    ok = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [9.0, 9.5]), (3, None)],
        "vec_id long, v array<double>",
    )
    path = str(tmp_path / "ivf_ok")
    write_ivf(ok, path, "v", centroids)
    assert spark.read.parquet(path).count() == 2


def test_tfidf_top_terms_hand_computed(spark):
    """3-doc fixture with hand-computed smoothed tf·idf scores."""
    import math

    from article_extraction_spark.operators.textstats import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "banana banana banana cherry"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["score"], r["rnk"])
        for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    }

    def idf(df_t):
        return math.log((3 + 1) / (df_t + 1)) + 1

    # doc 1: apple tf=2 df=2, banana tf=1 df=2
    assert got[(1, "apple")] == (2, 2 * idf(2), 1)
    assert got[(1, "banana")] == (1, 1 * idf(2), 2)
    # doc 3: banana tf=3 beats cherry tf=1
    assert got[(3, "banana")][2] == 1 and got[(3, "cherry")][2] == 2
    assert abs(got[(3, "banana")][1] - 3 * idf(2)) < 1e-12
    # k=2 everywhere
    assert len(got) == 6


def test_ngram_jaccard_pairs_exact_and_capped(spark):
    """Exact-Jaccard pair generation: planted near-identical pair found
    with the right score, disjoint docs absent, threshold honored; the
    hot-shingle cap removes pairs whose ONLY common shingles are
    ubiquitous while exact pairs survive."""
    import pytest

    from article_extraction_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "subscribe to our newsletter today"
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),      # near-dup of 1
            (3, "totally different words live here now"),
            (4, f"unique one content {boiler}"),
            (5, f"unique two payload {boiler}"),
            (6, f"unique three stuff {boiler}"),
        ],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.4)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    pairs.unpersist()
    # docs 1,2: 4 shingles each, 3 common → j = 3/5
    assert abs(got[(1, 2)] - 0.6) < 1e-12
    assert all(3 not in p for p in got), got

    # the boilerplate trio share only the ubiquitous shingles; capping
    # doc-freq at 2 removes those shingles from candidate generation, so
    # the trio's pairs vanish while the real near-dup pair survives
    uncapped = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.1)
    u = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    uncapped.unpersist()
    assert (4, 5) in u and (4, 6) in u and (5, 6) in u
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.1, max_shingle_doc_freq=2
    )
    c = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    capped.unpersist()
    assert (1, 2) in c
    assert not any(p in c for p in [(4, 5), (4, 6), (5, 6)]), c

    with pytest.raises(ValueError):
        ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0)


def test_incremental_exact_dedup_lifecycle(spark, tmp_path):
    """Batch-over-batch exact dedup against the fingerprint index:
    case-variant dups collapse, re-ingesting a batch survives nothing,
    a later batch only loses its true dups, and a conflicting commit
    retries idempotently."""
    from article_extraction_spark.catalog import CommitConflict, ManifestTable
    from article_extraction_spark.operators.dedup import incremental_exact_dedup

    index = ManifestTable(str(tmp_path / "idx"))
    b1 = spark.createDataFrame(
        [(1, "hello world"), (2, "Hello,   WORLD!"), (3, "something else")],
        "doc_id long, text string",
    )
    fresh1 = incremental_exact_dedup(b1, "doc_id", "text", index, spark)
    got1 = sorted(r["doc_id"] for r in fresh1.collect())
    fresh1.unpersist()
    assert got1 == [1, 3]  # 2 is a normalized dup of 1, min-id wins

    # replay the same batch: everything already indexed
    fresh1b = incremental_exact_dedup(b1, "doc_id", "text", index, spark)
    assert fresh1b.count() == 0
    fresh1b.unpersist()

    b2 = spark.createDataFrame(
        [(10, "hello world"), (11, "brand new content")],
        "doc_id long, text string",
    )
    fresh2 = incremental_exact_dedup(b2, "doc_id", "text", index, spark)
    assert [r["doc_id"] for r in fresh2.collect()] == [11]
    fresh2.unpersist()
    # index accumulated exactly the three unique fingerprints
    assert index.read(spark).count() == 3

    # racing commit: merge raises CommitConflict; the RETRY of the whole
    # call is idempotent (b3's fingerprint either landed or it didn't)
    b3 = spark.createDataFrame([(20, "late arrival")], "doc_id long, text string")

    class RacedIndex(ManifestTable):
        raced = False

        def _write_data(self, df):
            files = super()._write_data(df)
            if not RacedIndex.raced:
                RacedIndex.raced = True
                ManifestTable(self.root).append(
                    spark.createDataFrame(
                        [("ff" * 16, 999)], "fingerprint string, first_seen_id long"
                    )
                )
            return files

    raced = RacedIndex(str(tmp_path / "idx"))
    import pytest

    with pytest.raises(CommitConflict):
        incremental_exact_dedup(b3, "doc_id", "text", raced, spark)
    retry = incremental_exact_dedup(b3, "doc_id", "text", index, spark)
    assert retry.count() == 1
    retry.unpersist()
    assert index.read(spark).count() == 5  # 3 + racer's row + b3


def test_zorder_zvalue_interleave_known_bits(spark):
    """Morton interleave pinned on hand-computed codes: 2-bit ranks
    (x, y) → z = y1 x1 y0 x0."""
    from article_extraction_spark.operators.zorder import zvalue_col

    df = spark.createDataFrame(
        [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (2.0, 1.0)],
        "x double, y double",
    )
    z = zvalue_col(["x", "y"], mins=[0.0, 0.0], maxs=[3.0, 3.0], bits=2)
    got = [r["z"] for r in df.select(z.alias("z")).collect()]
    # ranks equal values here; interleave x bits at even positions
    # x=2,y=1 → x bits (1,0) at pos 0,2 ; y bits (0,1) at pos 1,3
    # z = x0 + 2*y0 + 4*x1 + 8*y1
    assert got == [0, 0b0101, 0b1010, 0b1111, 0b0110], [bin(v) for v in got]


def test_zorder_box_prunes_and_matches_full_scan(spark, tmp_path):
    """Data-skipping proof, same shape as the IVF/LSH tests: the box
    query equals the full-scan filter, touches a minority of files, and
    still works after every NON-selected file is corrupted (so the
    pruned files are provably never opened)."""
    import glob
    import os

    import numpy as np
    import pytest

    from article_extraction_spark.operators.zorder import (
        prune_files,
        read_zordered,
        write_zordered,
    )

    rng = np.random.RandomState(13)
    rows = [
        (i, float(rng.uniform(0, 100)), float(rng.uniform(0, 100)))
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    path = str(tmp_path / "ztab")
    write_zordered(df, path, ["x", "y"], n_files=16)

    box = {"x": (10.0, 25.0), "y": (60.0, 80.0)}
    expected = sorted(
        r[0] for r in rows if 10.0 <= r[1] <= 25.0 and 60.0 <= r[2] <= 80.0
    )
    got = sorted(r["id"] for r in read_zordered(spark, path, box).collect())
    assert got == expected and got

    selected = set(prune_files(path, box))
    total = prune_files(path, {})
    assert len(total) == 16
    assert len(selected) <= len(total) // 2, (len(selected), len(total))

    # corrupt every non-selected file: pruned read unaffected, full scan dies
    for f in total:
        if f not in selected:
            with open(f, "wb") as fh:
                fh.write(b"not a parquet file")
    again = sorted(r["id"] for r in read_zordered(spark, path, box).collect())
    assert again == expected
    with pytest.raises(Exception):
        spark.read.parquet(path).count()


def test_zorder_degenerate_and_empty_box(spark, tmp_path):
    from article_extraction_spark.operators.zorder import (
        read_zordered,
        write_zordered,
    )

    # constant column: span 0 must not divide by zero
    df = spark.createDataFrame(
        [(i, 5.0, float(i)) for i in range(100)], "id long, x double, y double"
    )
    path = str(tmp_path / "zc")
    write_zordered(df, path, ["x", "y"], n_files=4)
    got = read_zordered(spark, path, {"x": (0.0, 10.0), "y": (10.0, 19.0)}).collect()
    assert sorted(r["id"] for r in got) == list(range(10, 20))
    # a box that intersects no file stats → empty result, not an error
    assert read_zordered(
        spark, path, {"y": (1e6, 2e6)}, schema="id long, x double, y double"
    ).count() == 0


def test_ngram_jaccard_random_sweep_vs_bruteforce(spark):
    """Seeded random corpus: the relational exact-Jaccard pairs must
    equal a pure-python brute force over string shingle sets (catches
    hash-set vs string-set drift and candidate-generation recall gaps)."""
    import itertools
    import random

    from article_extraction_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = rng.randrange(3, 25)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant near-dups: copies with a word appended / replaced, so the
    # sweep exercises pairs above AND below the threshold
    for j in range(8):
        base_id, base_text = docs[j * 3]
        words = base_text.split()
        if j % 2 == 0:
            words.append(rng.choice(vocab))
        else:
            words[rng.randrange(len(words))] = rng.choice(vocab)
        docs.append((100 + j, " ".join(words)))

    def shingles(text, n=3):
        toks = [t for t in text.lower().split() if t]
        if len(toks) <= n - 1:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    expected = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = shingles(ta), shingles(tb)
        inter = len(sa & sb)
        union = len(sa | sb)
        j = 1.0 if union == 0 else inter / union
        if j >= 0.3:
            expected[(ia, ib)] = (inter, union)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.3)
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["n_union"])
        for r in pairs.collect()
    }
    pairs.unpersist()
    assert got == expected, (
        f"missing={set(expected) - set(got)} extra={set(got) - set(expected)}"
    )
    assert expected, "degenerate sweep: no qualifying pairs"


def test_zorder_zvalue_random_sweep_vs_python_morton(spark):
    """Seeded random points: the native z-value expression must equal a
    pure-python Morton reference (rank clamping included)."""
    import numpy as np

    from article_extraction_spark.operators.zorder import zvalue_col

    rng = np.random.RandomState(31)
    pts = [(float(x), float(y)) for x, y in rng.uniform(-5, 105, size=(300, 2))]
    lo, hi, bits = 0.0, 100.0, 8
    top = (1 << bits) - 1

    def rank(v):
        return min(top, max(0, int((v - lo) / (hi - lo) * top)))

    def morton(x, y):
        rx, ry = rank(x), rank(y)
        z = 0
        for b in range(bits):
            z |= ((rx >> b) & 1) << (2 * b)
            z |= ((ry >> b) & 1) << (2 * b + 1)
        return z

    df = spark.createDataFrame(pts, "x double, y double")
    z = zvalue_col(["x", "y"], [lo, lo], [hi, hi], bits=bits)
    got = [r["z"] for r in df.select(z.alias("z")).collect()]
    assert got == [morton(x, y) for x, y in pts]


def test_zorder_append_widens_domain_and_stays_correct(spark, tmp_path):
    """review r4: appending a batch from a different value domain must
    widen the sidecar's persisted domain to cover the whole table, and
    box queries over both batches stay exact (pruning only ever uses
    per-file footer stats, so correctness never depended on the domain)."""
    import json
    import os

    from article_extraction_spark.operators.zorder import (
        _SIDECAR,
        read_zordered,
        write_zordered,
    )

    b1 = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(100)], "id long, x double, y double"
    )
    b2 = spark.createDataFrame(
        [(1000 + i, 500.0 + i, 500.0 + i) for i in range(100)],
        "id long, x double, y double",
    )
    path = str(tmp_path / "zt")
    write_zordered(b1, path, ["x", "y"], n_files=4)
    write_zordered(b2, path, ["x", "y"], n_files=4, mode="append")
    sc = json.load(open(os.path.join(path, _SIDECAR)))
    assert sc["domain_min"] == [0.0, 0.0] and sc["domain_max"] == [599.0, 599.0]

    got = sorted(
        r["id"]
        for r in read_zordered(
            spark, path, {"x": (90.0, 510.0), "y": (90.0, 510.0)}
        ).collect()
    )
    assert got == list(range(90, 100)) + list(range(1000, 1011))


def test_media_features_arrow_twin_parity(spark):
    """mapInArrow twin must produce byte-identical output to the pandas
    twin over the same media batch (nulls included)."""
    from article_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        extract_media_features_arrow,
    )

    rows = [
        (1, "image", bytearray(b"\x01\x02\x03" * 100), "image/raw-rgb8", 10, 10, None),
        (2, "audio", bytearray(b"\x00\x10" * 500), "audio/pcm16", None, None, 100),
        (3, "video", None, "video/mp4", None, None, 5000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    a = sorted(map(tuple, extract_media_features(media).collect()))
    b = sorted(map(tuple, extract_media_features_arrow(media).collect()))
    assert a == b
    assert len(a) == 3
    null_row = next(t for t in a if t[0] == 3)
    assert null_row[3] is None  # null payload → null hash on both paths

    # round 5: the features are REAL decoded stats, not the digest fake
    by_id = {t[0]: t for t in a}
    assert by_id[1][5] == "image" and by_id[2][5] == "audio"
    assert by_id[3][5] == "null"
    # raw-rgb8 repeating (1,2,3): channel means are 1/255, 2/255, 3/255
    import numpy as np

    np.testing.assert_allclose(by_id[1][4][:3], [1 / 255, 2 / 255, 3 / 255], atol=1e-6)
    np.testing.assert_allclose(by_id[1][4][3:6], [0.0, 0.0, 0.0], atol=1e-6)
    # pcm16 alternating 0x1000: rms/peak of the real samples
    samples = np.frombuffer(bytes(rows[1][2]), dtype="<i2").astype(np.float64) / 32768.0
    np.testing.assert_allclose(by_id[2][4][0], np.sqrt((samples**2).mean()), rtol=1e-6)
    np.testing.assert_allclose(by_id[2][4][1], np.abs(samples).max(), rtol=1e-6)


def test_media_features_digest_fallback_for_undecodable(spark):
    """Corrupt/unknown payloads land on the digest fallback (feature_src
    'digest') instead of failing the task; decodable rows in the same
    batch still get real features."""
    from article_extraction_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    rows = [
        (1, "image", bytearray(b"\x89PNG not really a png"), "image/png", 4, 4, None),
        (2, "video", bytearray(b"\x00\x00ftypmp42"), "video/mp4", None, None, 900),
        (3, "image", bytearray(b"\x05\x06\x07" * 4), "image/raw-rgb8", 2, 2, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert got[1]["feature_src"] == "digest"
    assert got[2]["feature_src"] == "digest"
    assert got[3]["feature_src"] == "image"
    assert len(got[1]["feature"]) == 8 and got[1]["content_hash"] is not None


def test_zorder_append_sidecar_is_incremental(spark, tmp_path):
    """Round 5 (VERDICT r4 note): appending must read footers only for
    the NEW batch's files — prior sidecar entries are reused — while
    pruning over the combined table stays exact."""
    import pyarrow.parquet as pq
    from unittest import mock

    from article_extraction_spark.operators.zorder import read_zordered, write_zordered

    df1 = spark.createDataFrame(
        [(i, float(i % 50), float(i // 50)) for i in range(500)],
        "id long, x double, y double",
    )
    path = str(tmp_path / "zi")
    side1 = write_zordered(df1, path, ["x", "y"], n_files=6)
    n1 = len(side1["files"])

    df2 = spark.createDataFrame(
        [(1000 + i, float(60 + i % 20), float(i // 20)) for i in range(200)],
        "id long, x double, y double",
    )
    real_pf = pq.ParquetFile
    read_files = []

    def counting_pf(p, *a, **kw):
        read_files.append(p)
        return real_pf(p, *a, **kw)

    with mock.patch.object(pq, "ParquetFile", side_effect=counting_pf):
        side2 = write_zordered(df2, path, ["x", "y"], n_files=4, mode="append")
    assert len(side2["files"]) > n1
    # footer reads happened ONLY for files not in the prior sidecar
    assert 0 < len(read_files) == len(side2["files"]) - n1
    # prior entries survive verbatim
    prior_by_name = {e["file"]: e for e in side1["files"]}
    for e in side2["files"]:
        if e["file"] in prior_by_name:
            assert e == prior_by_name[e["file"]]
    # pruning over the combined table is still exact: x>=60 lives only in
    # the appended batch
    got = read_zordered(spark, path, {"x": (60.0, 100.0)}).collect()
    assert sorted(r["id"] for r in got) == sorted(
        1000 + i for i in range(200) if 60 + i % 20 >= 60
    )
    # domain widened to cover both batches
    assert side2["domain_min"][0] == 0.0 and side2["domain_max"][0] == 79.0


def test_prune_near_duplicates_keep_one(spark, tmp_path):
    """Pairs → clusters → keep-min materialization: a transitive chain
    (A~B, B~C, no direct A~C edge) collapses to A; disconnected docs
    survive with cluster_size 1."""
    from article_extraction_spark.operators.dedup import prune_near_duplicates

    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in (1, 2, 3, 10, 20)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = prune_near_duplicates(
        corpus, pairs, checkpoint_dir=str(tmp_path / "cc")
    )
    got = {r["doc_id"]: r["cluster_size"] for r in out.collect()}
    assert got == {1: 3, 10: 1, 20: 1}  # 2 and 3 pruned; rep carries size 3


def test_corpus_card_hand_computed(spark):
    from article_extraction_spark.card import corpus_card

    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "en", "s1"),
            (1, "alpha beta", "en", "s2"),   # exact dup of 0
            (2, "Alpha, BETA!", "fr", "s1"),  # normalized dup of 0/1
            (3, "gamma", None, "s2"),
            (4, "   ", "en", "s1"),           # whitespace-only
        ],
        "doc_id long, text string, lang string, source string",
    )
    card = {(r["section"], r["key"]): r["value"] for r in corpus_card(docs).collect()}
    assert card[("count_by_lang", "en")] == 3
    assert card[("count_by_lang", "<null>")] == 1
    assert card[("count_by_source", "s1")] == 3
    assert card[("chars", "n_docs")] == 5
    assert card[("chars", "total")] == 10 + 10 + 12 + 5 + 3
    assert card[("tokens", "total")] == 7  # "alpha beta" ×3 = 6, "gamma" = 1
    assert card[("tokens", "distinct")] == 3  # alpha, beta, gamma
    assert card[("dupes", "dup_groups")] == 1
    assert card[("dupes", "docs_in_dup_groups")] == 3
    assert card[("empty", "empty_docs")] == 1


def test_semantic_near_dup_pairs(spark):
    """SemDeDup-shaped generator: within-cluster pairwise cosine only —
    finds same-cluster near-dups, misses cross-cluster ones BY DESIGN
    (that's the comparison-count bound), python-twin checked."""
    from article_extraction_spark.operators.dedup import semantic_near_dup_pairs

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [0.9, 0.1]),    # cluster 0
        (2, [0.91, 0.1]),   # cluster 0, near-dup of 1
        (3, [0.708, 0.706]),  # cluster 0 by a hair; far from 1/2 in cosine
        (4, [0.1, 0.9]),    # cluster 1
        (5, [0.1, 0.91]),   # cluster 1, near-dup of 4
        (6, [0.706, 0.708]),  # cluster 1 by a hair; near-dup of 3 across the boundary
    ]
    df = spark.createDataFrame(rows, "vid long, v array<float>")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_near_dup_pairs(df, "vid", "v", cents, threshold=0.999).collect()
    }
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    import numpy as np

    assert set(got) == {(1, 2), (4, 5)}
    for (ia, ib), c in got.items():
        va = [float(np.float32(x)) for x in dict(rows)[ia]]
        vb = [float(np.float32(x)) for x in dict(rows)[ib]]
        assert abs(c - cos(va, vb)) < 1e-9
    # 3 and 6 are cosine-close but in different clusters → correctly absent
    v3 = [float(np.float32(x)) for x in dict(rows)[3]]
    v6 = [float(np.float32(x)) for x in dict(rows)[6]]
    assert cos(v3, v6) > 0.999  # the pair SemDeDup trades away
    # the self-join is an equi-join on the cluster id — never cartesian
    plan = (
        semantic_near_dup_pairs(df, "vid", "v", cents, threshold=0.999)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
