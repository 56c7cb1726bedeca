"""Vectorized (Arrow-batched) Spark surface of the extraction kernels.

Per BASELINE.json ``input_hint``: pandas/Arrow UDFs only, no per-row Python
UDFs. Classification stays entirely JVM-side (native column expressions);
only the genuinely-custom kernels (HTML state machine, PDF parse,
utf-8-ignore decode) cross into Python, and they do so one Arrow batch at a
time through a single struct-returning pandas UDF (one Arrow pass for text +
spans, E4's single-dispatch shape).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .core import SNIFF_PREFIX, to_text

_EXTRACT_RESULT_TYPE = T.StructType(
    [
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType(), False),
                        T.StructField("end", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("error", T.StringType(), True),
    ]
)


@F.pandas_udf(_EXTRACT_RESULT_TYPE)
def _to_text_udf_impl(doc_kind: pd.Series, payload: pd.Series) -> pd.DataFrame:
    """E1-E4 in one Arrow pass: (kind, payload) → (text, spans, error).

    Conversion failures don't fail the task: the row carries the error and
    is dropped downstream while lineage counts it (the reference logs and
    continues, tables/paper_text_table.py:150-152)."""
    texts: list[str] = []
    spans: list[list[dict[str, int]]] = []
    errors: list[str | None] = []
    for kind, data in zip(doc_kind, payload):
        err = None
        try:
            text, sp = to_text(kind, data)
        except Exception as exc:  # noqa: BLE001
            text, sp, err = "", [], f"{type(exc).__name__}: {exc}"[:500]
        texts.append(text)
        spans.append([{"start": s, "end": e} for s, e in sp])
        errors.append(err)
    return pd.DataFrame({"extracted_text": texts, "spans": spans, "error": errors})


# The extraction IS deterministic; the marking only disables filter pushdown
# THROUGH the UDF projection. Without it, a downstream drop-empty filter is
# pushed below the salted shuffle and Catalyst evaluates the UDF TWICE per
# row (once pre-shuffle for the filter, once post-shuffle for the project) —
# observed in the physical plan as two ArrowEvalPython nodes and 2× the
# extraction cost at bench scale.
to_text_udf = _to_text_udf_impl.asNondeterministic()


def classify_payload_col(text: Column) -> Column:
    """Native-expression payload-kind sniffing (S2 analog, reference
    tables/paper_document_table.py:60-70) — whole-stage-codegen friendly,
    no Python boundary. Must agree with core.classify_payload.

    Sniffs only the first SNIFF_PREFIX chars: regex-scanning full multi-KB
    payloads dominated the classify stage at bench scale, and content
    sniffing is a prefix property (a document whose first markup appears
    beyond the prefix is effectively text-leading anyway).
    """
    head = F.substring(text, 1, SNIFF_PREFIX)
    # NB: F.ltrim strips only ' ' — python lstrip (the twin) strips all
    # whitespace; use a regex so both agree on '\n{'-style payloads
    stripped = F.regexp_replace(head, r"^\s+", "")
    return (
        F.when(text.isNull(), F.lit("txt"))
        .when(
            head.startswith("%PDF-") | head.startswith("JVBERi0"),
            F.lit("pdf"),
        )
        .when(
            stripped.startswith("{") | stripped.startswith("["),
            F.lit("json"),
        )
        .when(
            head.rlike(r"(?is)<(?:!doctype\s+html|/?[a-z][a-z0-9]*)[\s>/]"),
            F.lit("html"),
        )
        .otherwise(F.lit("txt"))
    )


# -- Arrow-native extraction stage (r8) --------------------------------------
# The pandas-UDF path pays twice per batch: Series iteration on input and a
# python-dict-per-span list on output that pandas→Arrow converts object by
# object (measured +17 µs/row on a 22 µs/row kernel). The mapInArrow twin
# consumes the record batch directly and assembles the spans column from flat
# int arrays (one ListArray/StructArray build per batch, no per-span dicts).
# Semantics are IDENTICAL: same to_text kernel, same error capture.

_EXTRACT_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("doc_kind", T.StringType(), True),
        T.StructField("n_source_bytes", T.LongType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType(), False),
                        T.StructField("end", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("extract_error", T.StringType(), True),
    ]
)


def extract_map_in_arrow(batches):
    """mapInArrow stage: (conv_id, turn_idx, doc_kind, n_source_bytes, text)
    → (conv_id, turn_idx, doc_kind, n_source_bytes, extracted_text, spans,
    extract_error). Keyed columns pass through untouched; only text is
    consumed. Use with ``_EXTRACT_BATCH_SCHEMA``."""
    import pyarrow as pa

    span_fields = [
        pa.field("start", pa.int32(), nullable=False),
        pa.field("end", pa.int32(), nullable=False),
    ]
    for batch in batches:
        kinds = batch.column("doc_kind").to_pylist()
        texts = batch.column("text").to_pylist()
        out_texts: list[str] = []
        errors: list[str | None] = []
        starts: list[int] = []
        ends: list[int] = []
        offsets: list[int] = [0]
        for kind, data in zip(kinds, texts):
            err = None
            try:
                text, sp = to_text(kind, data)
            except Exception as exc:  # noqa: BLE001
                text, sp, err = "", [], f"{type(exc).__name__}: {exc}"[:500]
            out_texts.append(text)
            for s, e in sp:
                starts.append(s)
                ends.append(e)
            offsets.append(len(starts))
            errors.append(err)
        spans = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(starts, pa.int32()), pa.array(ends, pa.int32())],
                fields=span_fields,
            ),
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("conv_id"),
                batch.column("turn_idx"),
                batch.column("doc_kind"),
                batch.column("n_source_bytes"),
                pa.array(out_texts, pa.string()),
                spans,
                pa.array(errors, pa.string()),
            ],
            names=[
                "conv_id", "turn_idx", "doc_kind", "n_source_bytes",
                "extracted_text", "spans", "extract_error",
            ],
        )


@F.pandas_udf(_EXTRACT_RESULT_TYPE)
def _to_text_layout_udf_impl(doc_kind: pd.Series, payload: pd.Series) -> pd.DataFrame:
    """Layout-analyzed variant: pdf payloads go through the positioned-run
    parser (extract/pdf_layout.py — column detection, reading order,
    header/footer removal; spans not applicable for binary sources), all
    other kinds are identical to the simple path. Opt-in via
    convert_transcripts(pdf_mode="layout") — the DEFAULT path stays
    byte-parity with the reference's stream-order extraction."""
    from .pdf_layout import pdf_layout_extract_fn

    texts: list[str] = []
    spans: list[list[dict[str, int]]] = []
    errors: list[str | None] = []
    for kind, data in zip(doc_kind, payload):
        err = None
        sp: list = []
        if kind == "pdf":
            try:
                text = pdf_layout_extract_fn(data)
                if text is None:
                    text, err = "", "ValueError: undecodable PDF payload"
            except Exception as exc:  # noqa: BLE001
                text, err = "", f"{type(exc).__name__}: {exc}"[:500]
        else:
            try:
                text, sp2 = to_text(kind, data)
                sp = sp2
            except Exception as exc:  # noqa: BLE001
                text, err = "", f"{type(exc).__name__}: {exc}"[:500]
        texts.append(text)
        spans.append([{"start": s, "end": e} for s, e in sp])
        errors.append(err)
    return pd.DataFrame({"extracted_text": texts, "spans": spans, "error": errors})


to_text_layout_udf = _to_text_layout_udf_impl.asNondeterministic()
