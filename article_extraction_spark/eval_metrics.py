"""Golden-comparison evaluation job (reference results/020925/scores.py —
§3.3): per-cell prediction vs truth with char metrics + embedding cosine
distance, cumulative means, per-(model,category) summaries with keyed upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .extraction.encode import encode_texts_deduped
from .functions.similarity import cosine_distance_col, jaro_winkler_udf, levenshtein_normalized_col
from .functions.textnorm import normalise_cell_col
from .sinks import upsert_by_key


def load_results_json(spark: SparkSession, path: str) -> DataFrame:
    """S7: the reference's nested all_results.json (model → category →
    {true: [...], predicted: [...]}) flattened to rows (reference
    scores.py:297-332 load_results + validation): spark.read.json with the
    nested maps exploded, length-mismatched pairs skipped, list elements
    zipped into (model, category, idx, true, predicted) rows."""
    raw = spark.read.option("multiLine", True).json(path)
    # model names are top-level fields; categories nested fields → melt via
    # stack over the inferred schema (schema-driven, no hardcoding)
    rows = []
    for model_field in raw.schema.fields:
        model = model_field.name
        for cat_field in model_field.dataType.fields:
            cat = cat_field.name
            rows.append(
                F.struct(
                    F.lit(model).alias("model"),
                    F.lit(cat).alias("category"),
                    F.col(f"`{model}`.`{cat}`.true").alias("true_list"),
                    F.col(f"`{model}`.`{cat}`.predicted").alias("pred_list"),
                )
            )
    melted = raw.select(F.explode(F.array(*rows)).alias("e")).select("e.*")
    valid = melted.where(
        F.col("true_list").isNotNull()
        & F.col("pred_list").isNotNull()
        & (F.size("true_list") == F.size("pred_list"))  # mismatches skipped (:323-335)
    )
    return valid.select(
        "model",
        "category",
        F.posexplode(F.arrays_zip(F.col("true_list"), F.col("pred_list"))).alias("idx", "pair"),
    ).select(
        "model",
        "category",
        "idx",
        F.col("pair.true_list").cast("string").alias("true"),
        F.col("pair.pred_list").cast("string").alias("predicted"),
    )


def per_turn_equality(extracted: DataFrame, golden: DataFrame) -> DataFrame:
    """Per-turn byte-equality vs golden outputs under (conv_id, turn_idx)
    keys — the BASELINE.json correctness metric. Full outer join so both
    missing and extra turns count as mismatches."""
    joined = extracted.select(
        "conv_id", "turn_idx", F.col("extracted_text")
    ).join(
        golden.select("conv_id", "turn_idx", "expected_text"),
        ["conv_id", "turn_idx"],
        "full_outer",
    )
    return joined.withColumn(
        "equal",
        F.coalesce(F.col("extracted_text") == F.col("expected_text"), F.lit(False)),
    )


def equality_rate(extracted: DataFrame, golden: DataFrame) -> float:
    row = per_turn_equality(extracted, golden).agg(
        F.avg(F.col("equal").cast("double")).alias("rate")
    ).first()
    return float(row["rate"] or 0.0)


def char_metrics(df: DataFrame, pred: str, truth: str) -> DataFrame:
    """Reference scores.py:190-294, 463-515: normalise both cells, then
    levenshtein (+normalized) and jaro-winkler similarity."""
    p = normalise_cell_col(F.col(pred))
    t = normalise_cell_col(F.col(truth))
    return (
        df.withColumn("_p", p)
        .withColumn("_t", t)
        .withColumn("levenshtein", F.levenshtein("_p", "_t"))
        .withColumn("levenshtein_norm", levenshtein_normalized_col(F.col("_p"), F.col("_t")))
        .withColumn("jaro_winkler", jaro_winkler_udf("_p", "_t"))
        .drop("_p", "_t")
    )


def semantic_metrics(df: DataFrame, pred: str, truth: str, encoder=None) -> DataFrame:
    """Embedding cosine distance (reference scores.py:159-167) with
    dedupe-before-encode on BOTH sides (the memo cache as a join, E10)."""
    df = encode_texts_deduped(df, pred, encoder, out_col="_pe")
    df = encode_texts_deduped(df, truth, encoder, out_col="_te")
    return df.withColumn(
        "cosine_distance", cosine_distance_col(F.col("_pe"), F.col("_te"))
    ).drop("_pe", "_te")


def evaluate(df: DataFrame, pred: str = "predicted", truth: str = "true") -> DataFrame:
    """Full per-row metric computation (validate → normalise → metrics)."""
    scored = char_metrics(df, pred, truth)
    scored = semantic_metrics(scored, pred, truth)
    return scored.withColumn(
        "exact", (normalise_cell_col(F.col(pred)) == normalise_cell_col(F.col(truth))).cast("int")
    )


def cumulative_mean_by(df: DataFrame, order: str, value: str, group: list[str]) -> DataFrame:
    """Expanding mean per (model, category) in row order (reference
    scores.py:454, 511-512)."""
    w = Window.partitionBy(*group).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(f"cum_{value}", F.avg(value).over(w))


def summarize(df: DataFrame, group: list[str]) -> DataFrame:
    """Per-(model,category) summary (reference scores.py:565-606)."""
    return df.groupBy(*group).agg(
        F.count("*").alias("n"),
        F.avg("exact").alias("exact_rate"),
        F.avg("levenshtein_norm").alias("mean_lev_norm"),
        F.avg("jaro_winkler").alias("mean_jaro_winkler"),
        F.avg("cosine_distance").alias("mean_cosine_distance"),
    )


def write_summary_upsert(
    spark: SparkSession, summary: DataFrame, path: str, keys: list[str] | None = None
) -> None:
    """Keyed summary upsert (reference scores.py:609-668 — MERGE analog)."""
    upsert_by_key(spark, summary, path, keys or ["model", "category"])
