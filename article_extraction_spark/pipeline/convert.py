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

from ..extract.udfs import classify_payload_col, to_text_layout_udf, to_text_udf
from .partitioning import byte_balanced_partitions, salted_repartition


def convert_transcripts(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    salt: int = 0,
    drop_empty: bool = True,
    spread: bool = True,
    with_readability: bool = False,
    pdf_mode: str = "simple",
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → extracted turns.

    Output schema: EXTRACTED_TURNS_SCHEMA (conv_id, turn_idx, doc_kind,
    extracted_text, spans, n_source_bytes, n_extracted_chars).

    ``spread=True`` salted-repartitions on (conv_id, turn_idx) — required
    when the source partitioning correlates with conv_id (Iceberg
    bucket(conv_id) tables, the 10^12-turn deployment) so mega-conversations
    can't straggle one task. For a source already uniformly partitioned,
    pass spread=False and save the full-payload shuffle.

    ``pdf_mode``: "simple" (default — stream-order text, byte-parity with
    the reference's extraction) or "layout" (extract/pdf_layout.py —
    column detection, reading-order sort, running header/footer removal;
    an intentional, opt-in deviation from reference parity).
    """
    if pdf_mode not in ("simple", "layout"):
        raise ValueError(f"pdf_mode must be 'simple' or 'layout', got {pdf_mode!r}")
    udf = to_text_udf if pdf_mode == "simple" else to_text_layout_udf
    if num_partitions is None:
        num_partitions = byte_balanced_partitions(transcripts)

    classified = transcripts.select(
        "conv_id",
        "turn_idx",
        "text",
        classify_payload_col(F.col("text")).alias("doc_kind"),
    )
    base = ["conv_id", "turn_idx", "doc_kind"]
    src_bytes = F.octet_length("text").cast("long").alias("n_source_bytes")

    # Only html/pdf genuinely need the Python kernel. txt/json are IDENTITY
    # transforms on parquet strings (parquet strings are valid UTF-8, so
    # decode('utf-8','ignore') — reference paper_text_table.py:91-104 — is a
    # no-op), and routing them through Arrow would ship the full payload to
    # Python and back: measured serialization-bound and ANTI-scaling with
    # worker count. Native path keeps them JVM-side, byte-identical.
    needs_py = classified.where(F.col("doc_kind").isin("html", "pdf"))
    passthrough = classified.where(~F.col("doc_kind").isin("html", "pdf"))

    if spread:
        # salt-repartition ONLY the Python-bound branch: that's where task
        # imbalance hurts (per-row parse cost), and shuffling just html/pdf
        # payloads instead of the whole corpus cuts shuffle bytes ~3× —
        # the shuffle is bandwidth-bound, i.e. a fixed cost that does not
        # parallelize away. The native branch is uniform per-row cheap.
        needs_py = salted_repartition(needs_py, num_partitions, "conv_id", "turn_idx", salt=salt)

    if pdf_mode == "simple" and not with_readability:
        # r8: Arrow-native extraction stage — same to_text kernel, but the
        # spans column is assembled from flat int arrays per batch instead
        # of a python dict per span (the pandas-UDF path's dominant
        # overhead; see extract/udfs.py). n_source_bytes is computed
        # JVM-side BEFORE the map and passes through untouched.
        from ..extract.udfs import _EXTRACT_BATCH_SCHEMA, extract_map_in_arrow

        py_out = needs_py.select(
            "conv_id", "turn_idx", "doc_kind", src_bytes, "text"
        ).mapInArrow(extract_map_in_arrow, _EXTRACT_BATCH_SCHEMA).select(
            *base, "extracted_text", "spans", "extract_error", "n_source_bytes"
        )
    else:
        py_out = needs_py.withColumn(
            "_res", udf(F.col("doc_kind"), F.col("text"))
        ).select(
            *base,
            F.col("_res.extracted_text").alias("extracted_text"),
            F.col("_res.spans").alias("spans"),
            F.col("_res.error").alias("extract_error"),
            src_bytes,
        )

    txt = F.coalesce(F.col("text"), F.lit(""))
    native_text = F.when(F.col("doc_kind").isin("txt", "json"), txt).otherwise(F.lit(""))
    native_spans = F.when(
        F.col("doc_kind").isin("txt", "json") & (F.length(txt) > 0),
        F.array(F.struct(F.lit(0).alias("start"), F.length(txt).alias("end"))),
    ).otherwise(F.array().cast("array<struct<start:int,end:int>>"))
    nat_out = passthrough.select(
        *base,
        native_text.alias("extracted_text"),
        native_spans.alias("spans"),
        F.lit(None).cast("string").alias("extract_error"),
        src_bytes,
    )

    if with_readability:
        # north-star diagnostics: Arc90-style main-content signal for html
        # turns (extra columns only — the equality oracle stays the <p> path);
        # same Arrow stage as the extraction UDF, masked to html rows
        from ..extract.readability import readability_udf

        is_html = F.col("doc_kind") == "html"
        rd = readability_udf(F.when(is_html, F.col("text")).otherwise(F.lit(None)))
        py_out = needs_py.withColumn(
            "_res", to_text_udf(F.col("doc_kind"), F.col("text"))
        ).withColumn("_rd", rd).select(
            *base,
            F.col("_res.extracted_text").alias("extracted_text"),
            F.col("_res.spans").alias("spans"),
            F.col("_res.error").alias("extract_error"),
            src_bytes,
            F.when(is_html, F.col("_rd.main_text")).alias("readability_text"),
            F.when(is_html, F.col("_rd.link_density")).alias("link_density"),
        )
        nat_out = nat_out.withColumn("readability_text", F.lit(None).cast("string")).withColumn(
            "link_density", F.lit(None).cast("double")
        )

    extracted = py_out.unionByName(nat_out)

    extracted = extracted.withColumn(
        "n_extracted_chars", F.length("extracted_text").cast("long")
    )
    if drop_empty:
        # empty conversions are dropped (reference paper_text_table.py:153-155);
        # errored rows extract to "" and drop with them — lineage accounts for
        # them in the drop_empty=False (checkpoint) path
        extracted = extracted.where(F.length("extracted_text") > 0).drop("extract_error")
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
