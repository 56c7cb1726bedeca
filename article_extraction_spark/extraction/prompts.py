"""E6: prompt assembly + context-budget truncation (reference
models/llm.py:102-103, 200-259; templates in questions/*.txt shipped via the
same --py-files zip that carries this module).

Semantics mirrored exactly with a pluggable tokenizer (whitespace by
default — the HF tokenizer is absent in this container; the budget logic is
tokenizer-agnostic):

  * render: ``template.replace("{article_text}", chunk)``
  * article_budget = max(0, context_limit − tokens(render(template, "")))
  * window ≤ budget; if a rendered prompt still exceeds the limit, the
    article chunk is re-truncated to the budget and re-checked; windows that
    STILL overflow are skipped (llm.py:236-244)
"""

from __future__ import annotations

from collections.abc import Callable

from .windows import iter_token_windows

Tokenizer = Callable[[str], list[str]]

# prompt templates keyed by field (the engine's own phrasing; the mapping
# shape matches reference _FIELD_TO_TEMPLATE, llm.py:15-21)
FIELD_TEMPLATES: dict[str, str] = {
    "model": (
        "You extract facts from articles. Answer with only the value.\n"
        "Question: what is the model name?\nArticle:\n{article_text}\nAnswer:"
    ),
    "parameters": (
        "You extract facts from articles. Answer with only the number.\n"
        "Question: how many parameters does the model have?\nArticle:\n{article_text}\nAnswer:"
    ),
    "h_number": (
        "You extract facts from articles. Answer with only the number.\n"
        "Question: how many accelerators were used for training?\nArticle:\n{article_text}\nAnswer:"
    ),
    "year": (
        "You extract facts from articles. Answer with only the year.\n"
        "Question: in which year was the work published?\nArticle:\n{article_text}\nAnswer:"
    ),
    "hardware_text": (
        "You extract facts from articles. Answer with only the value.\n"
        "Question: which training hardware was used?\nArticle:\n{article_text}\nAnswer:"
    ),
}


def whitespace_tokenizer(text: str) -> list[str]:
    return text.split()


def render_prompt(template: str, article_text: str) -> str:
    """Reference _render_prompt (llm.py:102-103)."""
    return template.replace("{article_text}", article_text)


def article_budget(template: str, context_limit: int, tokenizer: Tokenizer = whitespace_tokenizer) -> int:
    """max(0, limit − base-prompt tokens) — reference llm.py:208-211."""
    base = render_prompt(template, "")
    return max(0, context_limit - len(tokenizer(base)))


def budgeted_prompts(
    text: str,
    field: str,
    context_limit: int,
    window_tokens: int = 0,
    stride_tokens: int = 0,
    tokenizer: Tokenizer = whitespace_tokenizer,
    templates: dict[str, str] | None = None,
) -> list[str]:
    """All prompts the windowed extraction would issue for one document —
    the reference's window loop (llm.py:213-259) minus the generation call.
    """
    templates = templates or FIELD_TEMPLATES
    if field not in templates:
        return []
    template = templates[field]
    budget = article_budget(template, context_limit, tokenizer)
    if budget == 0:
        return [render_prompt(template, "")]

    effective_window = window_tokens if window_tokens > 0 else budget
    effective_window = min(effective_window, budget)
    stride = stride_tokens if stride_tokens > 0 else effective_window

    tokens = tokenizer(text or "")
    prompts: list[str] = []
    for window in iter_token_windows(tokens, effective_window, stride):
        chunk = " ".join(window)
        prompt = render_prompt(template, chunk)
        if len(tokenizer(prompt)) > context_limit:  # re-truncate (llm.py:236-244)
            allowed = min(budget, len(window))
            if allowed <= 0:
                continue
            prompt = render_prompt(template, " ".join(window[:allowed]))
            if len(tokenizer(prompt)) > context_limit:
                continue
        prompts.append(prompt)
    return prompts
