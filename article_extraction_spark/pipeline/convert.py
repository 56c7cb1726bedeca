"""The convert_to_txt stage as a Spark plan (reference
tables/paper_text_table.py:113-168, re-expressed declaratively).

Plan shape (all lazily composed; Catalyst prunes/pushes down):

  scan transcripts
    → classify payload kind (native expressions, codegen'd)
    → salted repartition sized by byte volume (skew handling)
    → to_text pandas UDF (one Arrow pass: text + spans)
    → drop empty extractions (reference :153-155)
    → diagnostics columns

Stable ``(conv_id, turn_idx)`` ordering is a property of *consumption*, not
storage: ordered_output() range-partitions + sorts for export; equality
checks always join on the key pair (SURVEY.md §7.4 determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extract.udfs import classify_payload_col, to_text_udf
from .partitioning import byte_balanced_partitions, salted_repartition


def convert_transcripts(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    salt: int = 0,
    drop_empty: bool = True,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → extracted turns.

    Output schema: EXTRACTED_TURNS_SCHEMA (conv_id, turn_idx, doc_kind,
    extracted_text, spans, n_source_bytes, n_extracted_chars).
    """
    if num_partitions is None:
        num_partitions = byte_balanced_partitions(transcripts)

    classified = transcripts.select(
        "conv_id",
        "turn_idx",
        "text",
        classify_payload_col(F.col("text")).alias("doc_kind"),
    )
    spread = salted_repartition(classified, num_partitions, "conv_id", "turn_idx", salt=salt)

    extracted = spread.withColumn(
        "_res", to_text_udf(F.col("doc_kind"), F.col("text"))
    ).select(
        "conv_id",
        "turn_idx",
        "doc_kind",
        F.col("_res.extracted_text").alias("extracted_text"),
        F.col("_res.spans").alias("spans"),
        F.octet_length("text").cast("long").alias("n_source_bytes"),
    )

    extracted = extracted.withColumn(
        "n_extracted_chars", F.length("extracted_text").cast("long")
    )
    if drop_empty:
        # empty conversions are dropped (reference paper_text_table.py:153-155)
        extracted = extracted.where(F.length("extracted_text") > 0)
    return extracted


def ordered_output(extracted: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Range-partition + sort for stable (conv_id, turn_idx) export order.

    A global orderBy would funnel through one post-shuffle sort of everything;
    repartitionByRange + sortWithinPartitions gives globally ordered output
    files with the sort parallelized per range — the scalable form.
    """
    n = num_partitions or extracted.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return extracted.repartitionByRange(int(n), "conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx"
    )
