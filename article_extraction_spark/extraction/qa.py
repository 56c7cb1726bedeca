"""E8: QA span extraction shape (reference models/qa_squad.py:75-161).

The reference slides char windows over the article, scores candidate spans
with a QA model (joint start×end logits, upper-triangular, span ≤ LMAX_TOK
tokens), maps back to CHAR offsets, takes ``context[st:ed].strip()[:200]``,
dedups identical answer texts keeping max score, sorts, keeps n_best, then
aggregates (best | longest | concat).

Torch/transformers are absent here, so the span SCORER is a deterministic
keyword-overlap model (clearly marked); every other mechanic — windowing,
span enumeration with the token cap, char-offset mapping into the ORIGINAL
text, the 200-char truncation, dedup-by-text-max-score, n_best, aggregation
modes — matches the reference's dataflow and is what the Spark engine
actually owns.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LMAX_TOK = 30  # reference qa_squad.py:10
MAX_ANSWER_CHARS = 200  # reference :23, 151


_WORD_RE = re.compile(r"\S+")


def _score_spans(window: str, keywords: set[str]) -> list[tuple[float, int, int]]:
    """Deterministic stand-in for the QA model: a candidate span is a run of
    ≤ LMAX_TOK tokens; its score is keyword-hit count weighted by proximity
    (hits / span_tokens). Returns (score, char_start, char_end)."""
    tokens = [(m.group(0).lower(), m.start(), m.end()) for m in _WORD_RE.finditer(window)]
    if not tokens:
        return []
    hit_idx = [i for i, (w, _, _) in enumerate(tokens) if w.strip(".,;:!?") in keywords]
    spans: list[tuple[float, int, int]] = []
    for i in hit_idx:
        for width in (3, 7, LMAX_TOK):
            lo = max(0, i - width // 2)
            hi = min(len(tokens) - 1, i + width // 2)
            n_hits = sum(1 for j in range(lo, hi + 1) if j in hit_idx)
            score = n_hits / (hi - lo + 1)
            spans.append((score, tokens[lo][1], tokens[hi][2]))
    return spans


_QA_RESULT = T.StructType(
    [
        T.StructField("answer", T.StringType(), True),
        T.StructField(
            "candidates",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("answer", T.StringType(), False),
                        T.StructField("score", T.DoubleType(), False),
                        T.StructField("start", T.IntegerType(), False),
                        T.StructField("end", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
    ]
)


def qa_extract(
    df: DataFrame,
    text_col: str,
    keywords: list[str],
    window: int = 2000,  # reference config default :20
    stride: int = 400,
    n_best: int = 3,
    aggregator: str = "best",  # best | longest | concat (reference :40-48)
    out_col: str = "qa",
) -> DataFrame:
    """Window → score spans → char offsets in the original text → dedup by
    answer text keeping max score → n_best → aggregate."""
    kw = {k.lower() for k in keywords}

    @F.pandas_udf(_QA_RESULT)
    def _qa(texts: pd.Series) -> pd.DataFrame:
        answers, cands_col = [], []
        for text in texts:
            text = text or ""
            best: dict[str, tuple[float, int, int]] = {}
            i, n = 0, len(text)
            while True:  # char windows, reference :27-37
                win = text[i : i + window]
                for score, s, e in _score_spans(win, kw):
                    st, ed = i + s, i + e  # offsets in the ORIGINAL text
                    ans = text[st:ed].strip()[:MAX_ANSWER_CHARS]  # reference :151
                    if not ans:
                        continue
                    prev = best.get(ans)
                    if prev is None or score > prev[0]:  # dedup keep max (:155-161)
                        best[ans] = (score, st, ed)
                if i + window >= n:
                    break
                i += stride
                if i >= n:
                    break
            ranked = sorted(
                ((sc, ans, st, ed) for ans, (sc, st, ed) in best.items()),
                key=lambda x: (-x[0], x[2]),
            )[:n_best]
            cands = [
                {"answer": ans, "score": sc, "start": st, "end": ed}
                for sc, ans, st, ed in ranked
            ]
            if not ranked:
                agg = ""
            elif aggregator == "concat":
                agg = " ".join(ans for _, ans, _, _ in ranked)
            elif aggregator == "longest":
                agg = max(ranked, key=lambda x: len(x[1]))[1]
            else:
                agg = ranked[0][1]
            answers.append(agg)
            cands_col.append(cands)
        return pd.DataFrame({"answer": answers, "candidates": cands_col})

    return df.withColumn(out_col, _qa(F.col(text_col)))
