"""Structured-Streaming surface (SURVEY.md §2.10).

The reference is strictly batch with key-level incremental resume; its
Spark-native generalization is a file-source stream over the transcripts
directory with ``Trigger.AvailableNow`` — process everything present, commit
offsets to the checkpoint, stop; the next run resumes from the checkpoint.
That is exactly the reference's "resume from what's done" semantics with
exactly-once bookkeeping handled by the engine instead of an anti-join.

The extraction transformations are all per-row (classify + UDF), so the same
plan builders work unchanged on a streaming DataFrame; windowed turn-rate
metrics with a watermark handle late arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extract.udfs import classify_payload_col, to_text_udf
from ..schemas import TRANSCRIPTS_SCHEMA


def streaming_extract(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a transcripts parquet directory → extracted turns.

    Row-local plan (no shuffle) — append-mode compatible.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).format("parquet").load(input_dir)
    )
    classified = stream.select(
        "conv_id",
        "turn_idx",
        "ts",
        "text",
        classify_payload_col(F.col("text")).alias("doc_kind"),
    )
    extracted = classified.withColumn(
        "_res", to_text_udf(F.col("doc_kind"), F.col("text"))
    ).select(
        "conv_id",
        "turn_idx",
        "ts",
        "doc_kind",
        F.col("_res.extracted_text").alias("extracted_text"),
        F.col("_res.spans").alias("spans"),
    )
    return extracted.where(F.length("extracted_text") > 0)


def streaming_turn_metrics(extracted: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Windowed per-kind turn counts with late-data watermark."""
    return (
        extracted.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "doc_kind")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("extracted_text")).alias("chars_out"),
        )
    )


def run_available_now(
    df: DataFrame, out_dir: str, checkpoint_dir: str, query_name: str = "extract"
) -> None:
    """Incremental batch: process all currently-available input, commit the
    checkpoint, stop. Re-running picks up only NEW files — the streaming
    twin of pipeline.checkpoint's bucket resume."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()


def streaming_dedup(
    extracted: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    by_content: bool = False,
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST occurrence per key within the
    watermark horizon (``dropDuplicatesWithinWatermark``), so state is
    bounded by the event-time window — a trillion-turn stream carries only
    the last <watermark> of keys in the state store, unlike plain
    dropDuplicates whose state grows forever. ``by_content=True`` dedups on
    the md5 content fingerprint (streaming twin of exact_duplicates)."""
    if by_content:
        if keys is not None:
            raise ValueError(
                "pass either keys or by_content=True, not both — combining "
                "them silently changes which rows count as duplicates"
            )
        # the SAME normalized fingerprint as batch exact_duplicates — raw
        # md5 here silently diverged from the batch twin once the batch key
        # became normalization-aware (review r3)
        from ..operators.textstats import fingerprint_col

        extracted = extracted.withColumn("_fp", fingerprint_col(F.col("extracted_text")))
        keys = ["_fp"]
    elif keys is None:
        keys = ["conv_id", "turn_idx"]
    out = extracted.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return out.drop("_fp") if by_content else out


def run_available_now_merge(
    df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    keys: list[str],
    query_name: str = "extract-merge",
) -> None:
    """Incremental batch with UPSERT semantics: each micro-batch MERGEs into
    a catalog.ManifestTable on ``keys`` via foreachBatch.

    Exactly-once across restarts comes from TWO layers: the streaming
    checkpoint replays each epoch's exact input files, and a replayed
    micro-batch (same rows, same keys) MERGEs idempotently — re-upserting
    identical rows is a no-op for the final table state. This is the
    streaming twin of sinks.upsert/ManifestTable.merge, and the standard
    Structured-Streaming pattern for sinks with no native transactional
    stream support (an Iceberg deployment would writeStream straight into
    the table instead)."""
    from ..catalog import ManifestTable

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ManifestTable(table_root).merge(batch_df.sparkSession, batch_df, keys)

    q = (
        df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()


def run_available_now_dedup_ingest(
    df: DataFrame,
    out_dir: str,
    index_root: str,
    checkpoint_dir: str,
    id_cols: list[str] | None = None,
    text_col: str = "extracted_text",
    query_name: str = "dedup-ingest",
    merge_retries: int = 3,
) -> None:
    """Streaming twin of `operators.dedup.incremental_exact_dedup`
    (round 4): each micro-batch is fingerprint-deduped against the
    PERSISTENT index before landing — within-batch first, then
    left_anti vs everything any previous batch (or run) committed —
    and the survivors append to ``out_dir`` while their fingerprints
    MERGE into the index.

    Cross-restart exactly-once, three layers deep: the streaming
    checkpoint replays the exact input files of an interrupted epoch;
    the replayed batch's fingerprints anti-join away if the index MERGE
    already landed; and if the parquet append landed but the MERGE did
    not, the re-run re-appends rows whose fingerprints dedup to the
    same survivors (idempotent for the index, at-least-once for the
    parquet sink — readers dedup on the carried ``fingerprint`` column,
    which is why it is written). A concurrent index writer surfaces as
    CommitConflict; the batch retries ``merge_retries`` times against
    the new head before failing the query (the checkpoint then replays
    the batch on restart)."""
    from ..catalog import CommitConflict, ManifestTable
    from ..operators.dedup import incremental_exact_dedup

    id_sort = id_cols or ["conv_id", "turn_idx"]

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        keyed = batch_df.withColumn(
            "_ingest_id", F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_sort])
        )
        for attempt in range(merge_retries + 1):
            try:
                fresh = incremental_exact_dedup(
                    keyed, "_ingest_id", text_col, ManifestTable(index_root), spark
                )
                break
            except CommitConflict:
                if attempt == merge_retries:
                    raise
        try:
            fresh.drop("_ingest_id").write.mode("append").parquet(out_dir)
        finally:
            fresh.unpersist()

    q = (
        df.writeStream.foreachBatch(_dedup_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .queryName(query_name)
        .start()
    )
    q.awaitTermination()
