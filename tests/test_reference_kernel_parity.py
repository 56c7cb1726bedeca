"""Direct parity vs the reference's E7/E8 kernel helpers.

AST-loads the pure functions from the read-only checkout (never copied into
the engine) and asserts the engine twins agree on randomized inputs:

  * llm._iter_article_windows       ↔ hf_llm.iter_token_id_windows
  * llm._render_prompt              ↔ prompts.render_prompt
  * llm._resolve_max_context_length ↔ hf_llm._resolve_max_context
  * qa_squad._iter_windows          ↔ hf_qa._iter_char_windows
  * qa_squad._aggregate             ↔ hf_qa.aggregate_answers_py
  * qa_squad._estimate_num_windows  ↔ (window count of _iter_char_windows)
"""

from __future__ import annotations

import ast
import os
import random

import pytest

LLM_PATH = "/root/reference/models/llm.py"
QA_PATH = "/root/reference/models/qa_squad.py"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(LLM_PATH) and os.path.exists(QA_PATH)),
    reason="reference checkout not present",
)


def _load(path: str, wanted: set[str]) -> dict:
    tree = ast.parse(open(path, encoding="utf-8").read())
    body = [n for n in tree.body if isinstance(n, ast.FunctionDef) and n.name in wanted]
    found = {n.name for n in body}
    assert wanted <= found, wanted - found
    ns: dict = {}
    exec(  # noqa: S102
        "import math\nfrom typing import Any, Iterator, Iterable, Optional", ns
    )
    exec(compile(ast.Module(body=body, type_ignores=[]), path, "exec"), ns)  # noqa: S102
    return ns


@pytest.fixture(scope="module")
def ref_llm():
    ns = _load(LLM_PATH, {"_iter_article_windows", "_render_prompt", "_resolve_max_context_length"})
    # the reference reads its cap from config.py:4; engine constant must match
    from article_extraction_spark.extraction.hf_llm import MAX_CONTEXT_TOKENS

    assert MAX_CONTEXT_TOKENS == 100_000
    ns["MAX_CONTEXT_TOKENS"] = MAX_CONTEXT_TOKENS
    return ns


@pytest.fixture(scope="module")
def ref_qa():
    return _load(QA_PATH, {"_iter_windows", "_aggregate", "_estimate_num_windows"})


class _FakeTok:
    """Tokenizer stub for the reference's _iter_article_windows, which only
    calls .encode(text, add_special_tokens=False)."""

    def encode(self, text, add_special_tokens=False):
        return [ord(c) for c in text]


def test_token_window_parity(ref_llm):
    from article_extraction_spark.extraction.hf_llm import iter_token_id_windows

    tok = _FakeTok()
    rng = random.Random(11)
    cases = [("", 4, 2), ("abc", 0, 0), ("abc", 5, 2)]
    cases += [
        ("".join(rng.choice("abcdef") for _ in range(rng.randint(0, 40))),
         rng.randint(-1, 12), rng.randint(-1, 8))
        for _ in range(300)
    ]
    for text, w, s in cases:
        theirs = list(ref_llm["_iter_article_windows"](text, tok, w, s))
        mine = list(iter_token_id_windows(tok.encode(text), w, s))
        assert mine == theirs, (text, w, s)


def test_render_prompt_parity(ref_llm):
    from article_extraction_spark.extraction.prompts import render_prompt

    for t in ("x {article_text} y", "{article_text}{article_text}", "none"):
        for a in ("", "CHUNK", "{article_text}"):
            assert render_prompt(t, a) == ref_llm["_render_prompt"](t, a)


def test_resolve_max_context_parity(ref_llm):
    from article_extraction_spark.extraction.hf_llm import _resolve_max_context

    class Obj:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    cases = [
        (Obj(model_max_length=512), Obj(max_position_embeddings=1024)),
        (Obj(model_max_length=10**9), Obj(n_positions=2048)),  # sentinel huge → ignored
        (Obj(), Obj()),
        (Obj(model_max_length=4096), Obj(seq_length=100, max_sequence_length=200)),
    ]
    for tok, cfg in cases:
        assert _resolve_max_context(tok, cfg) == ref_llm["_resolve_max_context_length"](tok, cfg)


def test_char_window_parity_and_count(ref_qa):
    from article_extraction_spark.extraction.hf_qa import _iter_char_windows

    rng = random.Random(23)
    cases = [("", 5, 2), ("abc", 0, 1), ("abc", 2, 0)]
    cases += [
        ("".join(rng.choice("xyz ") for _ in range(rng.randint(0, 60))),
         rng.randint(1, 20), rng.randint(1, 15))
        for _ in range(300)
    ]
    for text, w, s in cases:
        theirs = list(ref_qa["_iter_windows"](text, w, s))
        mine = list(_iter_char_windows(text, w, s))
        assert mine == theirs, (text, w, s)
        # NB: the reference's _estimate_num_windows is only its tqdm-total
        # heuristic and over-counts when window < stride (e.g. len=36, w=1,
        # s=14 → iter yields 3, estimate says 4) — the WINDOW CONTENT parity
        # above is the real contract; allow the heuristic ±1
        if text and w > 0 and s > 0:
            est = ref_qa["_estimate_num_windows"](len(text), w, s)
            assert abs(len(mine) - est) <= 1, (text, w, s, len(mine), est)


def test_aggregate_parity(ref_qa):
    from article_extraction_spark.extraction.hf_qa import aggregate_answers_py

    rng = random.Random(31)
    for _ in range(300):
        answers = [
            ("".join(rng.choice("abch ") for _ in range(rng.randint(0, 6))), rng.random())
            for _ in range(rng.randint(0, 6))
        ]
        for mode in ("best", "longest", "concat"):
            if not answers and mode in ("best", "longest"):
                pass  # reference returns "" for empty too — covered below
            assert aggregate_answers_py(answers, mode) == ref_qa["_aggregate"](answers, mode), (
                answers,
                mode,
            )
    assert aggregate_answers_py([], "best") == ref_qa["_aggregate"]([], "best") == ""


def _reference_span_math(offsets, s, e, context, max_answer_chars, lmax):
    """NumPy transcription of qa_squad._qa_candidates' per-window span
    selection (qa_squad.py:130-152), kept line-faithful: joint = s+e, mask
    = triu & (length <= LMAX_TOK), row-major argmax over the masked matrix,
    char offsets from the picked token pair, skip on None/empty, strip +
    truncate. (torch is absent here; torch.argmax and np.argmax both take
    the first maximal flat index on ties.)"""
    import numpy as np

    s = np.asarray(s, dtype="float64")
    e = np.asarray(e, dtype="float64")
    N = s.shape[0]
    if N == 0:
        return None
    ii = np.arange(N)
    joint = s[:, None] + e[None, :]
    valid = np.triu(np.ones_like(joint, dtype=bool)) & (
        (ii[None, :] - ii[:, None] + 1) <= lmax
    )
    if not bool(valid.any()):
        return None
    val = np.where(valid, joint, -np.inf)
    flat_idx = int(np.argmax(val))
    idx_i, idx_j = divmod(flat_idx, N)
    st_char = offsets[idx_i][0]
    ed_char = offsets[idx_j][1]
    if st_char is None or ed_char is None or ed_char <= st_char:
        return None
    ans = context[st_char:ed_char].strip()
    if not ans:
        return None
    score = float(val.reshape(-1)[flat_idx])
    return ans[:max_answer_chars], score


def test_select_span_matches_reference_math_on_synthetic_logits():
    """VERDICT r3 item 5 fallback: the real QA forward pass cannot run here
    (no torch), so the span-selection MATH is parity-tested on synthetic
    logit matrices against a line-faithful transcription of the reference —
    ties, all-invalid windows, None/zero-width offsets, long-span capping,
    strip-to-empty, truncation, and n_best ranking all covered."""
    import numpy as np

    from article_extraction_spark.extraction.hf_qa import (
        LMAX_TOK,
        qa_candidates,
        select_span,
    )

    rng = random.Random(99)
    nprng = np.random.RandomState(99)
    context = "The quick brown fox jumps over the lazy dog. " * 40

    def rand_window(n):
        # integer-valued logits force exact ties; occasional None /
        # zero-width / reversed offsets exercise every skip branch
        s = nprng.randint(-3, 4, size=n).astype("float64")
        e = nprng.randint(-3, 4, size=n).astype("float64")
        offs = []
        for _ in range(n):
            a = rng.randrange(0, len(context) - 2)
            kind = rng.random()
            if kind < 0.05:
                offs.append((None, a + 1))
            elif kind < 0.10:
                offs.append((a, None))
            elif kind < 0.15:
                offs.append((a, a))  # zero width
            else:
                offs.append((a, min(len(context), a + rng.randrange(1, 12))))
        return offs, s, e

    for trial in range(300):
        n = rng.choice([0, 1, 2, 5, 31, 64])
        offs, s, e = rand_window(n)
        ref = _reference_span_math(offs, s, e, context, 160, LMAX_TOK)
        got = select_span(offs, s, e)
        if got is None:
            # select_span None ⇒ the reference math must skip too
            assert ref is None, (trial, ref)
        else:
            st, ed, score = got
            ans = context[st:ed].strip()
            if not ans:
                assert ref is None, (trial, ref)
            else:
                assert ref is not None, trial
                assert ref == (ans[:160], score), (trial, ref, (ans[:160], score))

    class FakeBackend:
        """Multi-window backend over synthetic logits."""

        def __init__(self, windows):
            self._w = windows

        def windows(self, question, ctx):
            yield from self._w

    for trial in range(40):
        wins = [rand_window(rng.choice([0, 3, 17, 40])) for _ in range(rng.randrange(0, 5))]
        for n_best in (0, 1, 3):
            got = qa_candidates("q?", context, FakeBackend(wins), n_best=n_best, max_answer_chars=20)
            # reference aggregation (qa_squad.py:154-161): dedup keep-best,
            # sort desc, top max(1, n_best)
            cands = []
            for offs, s, e in wins:
                r = _reference_span_math(offs, s, e, context, 20, LMAX_TOK)
                if r is not None:
                    cands.append(r)
            best = {}
            for a, sc in cands:
                if a not in best or sc > best[a]:
                    best[a] = sc
            ranked = sorted(best.items(), key=lambda x: x[1], reverse=True)
            assert got == ranked[: max(1, n_best)], (trial, n_best)
