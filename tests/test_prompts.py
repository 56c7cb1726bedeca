from __future__ import annotations

from article_extraction_spark.extraction.prompts import (
    FIELD_TEMPLATES,
    article_budget,
    budgeted_prompts,
    render_prompt,
    whitespace_tokenizer,
)


def test_render_and_budget():
    t = FIELD_TEMPLATES["year"]
    assert "{article_text}" not in render_prompt(t, "abc")
    base_tokens = len(whitespace_tokenizer(render_prompt(t, "")))
    assert article_budget(t, base_tokens + 5) == 5
    assert article_budget(t, 3) == 0  # clamped at 0


def test_budgeted_prompts_windowing():
    text = " ".join(f"w{i}" for i in range(100))
    t = FIELD_TEMPLATES["year"]
    base = len(whitespace_tokenizer(render_prompt(t, "")))
    # budget 40 tokens, window unset → window = budget → ceil(100/40)=3 prompts
    prompts = budgeted_prompts(text, "year", context_limit=base + 40)
    assert len(prompts) == 3
    for p in prompts:
        assert len(whitespace_tokenizer(p)) <= base + 40
    # explicit overlapping windows
    prompts = budgeted_prompts(text, "year", context_limit=base + 40, window_tokens=40, stride_tokens=30)
    assert len(prompts) == 3
    # zero budget → single bare prompt (reference :211-223)
    assert budgeted_prompts(text, "year", context_limit=1) == [render_prompt(t, "")]
    # unknown field → no prompts
    assert budgeted_prompts(text, "nope", context_limit=100) == []
    # empty text → one prompt with empty article
    assert budgeted_prompts("", "year", context_limit=base + 40) == [render_prompt(t, "")]
