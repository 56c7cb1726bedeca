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
