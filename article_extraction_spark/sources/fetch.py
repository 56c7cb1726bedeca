"""S1/S2: the download stage (reference tables/paper_document_table.py:73-77,
60-70) as a distributed operator.

The fetch itself is a per-batch ``mapInPandas`` kernel (requests with a 30 s
timeout and UA header, one HTTP call per row, batched transport). This
sandbox has no EXTERNAL network, so the default kernel is a DETERMINISTIC
FAKE that synthesizes a payload from the URL (clearly marked); the REAL
requests path (``fake=False``) is exercised end-to-end against a localhost
HTTP server in tests/test_build_corpus.py — per-worker session, timeout,
content-type dispatch, per-row 4xx error capture.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

USER_AGENT = "article-extraction-spark/0.1"
FETCH_TIMEOUT_S = 30  # reference paper_document_table.py:19

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("id_paper", T.LongType(), False),
        T.StructField("document_url", T.StringType(), True),
        T.StructField("document_type", T.StringType(), True),
        T.StructField("document", T.BinaryType(), True),
        T.StructField("fetch_error", T.StringType(), True),
    ]
)


def doc_type_from_content_type_col(ct: Column) -> Column:
    """S2: content-type substring dispatch pdf/html/txt/json/bin
    (reference _doc_type_from_ct :60-70)."""
    c = F.lower(F.coalesce(ct, F.lit("")))
    return (
        F.when(c.contains("pdf"), "pdf")
        .when(c.contains("html"), "html")
        .when(c.contains("json"), "json")
        .when(c.contains("text"), "txt")
        .otherwise("bin")
    )


def _fake_fetch(url: str) -> tuple[str, bytes]:
    """DETERMINISTIC FAKE (no network in this sandbox): payload derived from
    the URL. .pdf URLs yield a minimal valid PDF, others a small HTML page."""
    if url.split("?")[0].lower().endswith(".pdf"):
        from ..fixtures.synth import make_pdf_bytes

        return "application/pdf", make_pdf_bytes([f"document for {url}"])
    return "text/html", f"<html><body><p>content of {url}</p></body></html>".encode()


def fetch_documents(
    df: DataFrame,
    url_col: str = "document_url",
    id_col: str = "id_paper",
    fake: bool = True,
) -> DataFrame:
    """One GET per row, per-batch kernel; errors recorded per row (the
    reference logs and skips, :131-136) rather than failing the task."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        session = None
        if not fake:
            import requests

            session = requests.Session()
            session.headers["User-Agent"] = USER_AGENT
        for pdf in batches:
            out = {"id_paper": [], "document_url": [], "document_type": [], "document": [], "fetch_error": []}
            for pid, url in zip(pdf[id_col], pdf[url_col]):
                ct, payload, err = None, None, None
                try:
                    if fake:
                        ct, payload = _fake_fetch(url or "")
                    else:
                        resp = session.get(url, timeout=FETCH_TIMEOUT_S)
                        resp.raise_for_status()
                        ct, payload = resp.headers.get("Content-Type", ""), resp.content
                except Exception as exc:  # noqa: BLE001
                    err = str(exc)[:500]
                out["id_paper"].append(pid)
                out["document_url"].append(url)
                out["document_type"].append(ct)
                out["document"].append(payload)
                out["fetch_error"].append(err)
            yield pd.DataFrame(out)

    fetched = df.select(F.col(id_col), F.col(url_col)).mapInPandas(kernel, FETCH_RESULT_SCHEMA)
    return fetched.withColumn(
        "document_type", doc_type_from_content_type_col(F.col("document_type"))
    )
