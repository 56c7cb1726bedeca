"""End-to-end: synthetic transcripts → pipeline → per-turn equality rate 1.0
vs independently-constructed goldens, under stable (conv_id, turn_idx) keys
(FIXTURES.md §1-2; BASELINE.md per-turn text-equality target)."""

from __future__ import annotations

from pyspark.sql import functions as F

from article_extraction_spark.fixtures.synth import (
    golden_df,
    synth_transcripts,
    transcripts_df,
)
from article_extraction_spark.pipeline.convert import convert_transcripts, ordered_output


def test_per_turn_equality_rate_is_one(spark):
    rows, golden = synth_transcripts(n_convs=30, turns_per_conv=12, seed=42, mega_conv=False)
    tdf = transcripts_df(spark, rows)
    gdf = golden_df(spark, golden)

    out = convert_transcripts(tdf, num_partitions=8)

    joined = out.join(gdf, ["conv_id", "turn_idx"], "full_outer")
    stats = joined.select(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("extracted_text") == F.col("expected_text"), 1).otherwise(0)).alias("eq"),
        F.sum(F.col("extracted_text").isNull().cast("int")).alias("missing"),
        F.sum(F.col("expected_text").isNull().cast("int")).alias("extra"),
    ).first()
    assert stats["missing"] == 0, "pipeline dropped turns the golden expects"
    assert stats["extra"] == 0, "pipeline emitted turns the golden drops (empty conversions)"
    assert stats["eq"] == stats["n"] == len(golden)


def test_stable_ordering(spark):
    rows, _ = synth_transcripts(n_convs=10, turns_per_conv=8, seed=7, mega_conv=False)
    out = ordered_output(convert_transcripts(transcripts_df(spark, rows), num_partitions=4), 4)
    collected = out.select("conv_id", "turn_idx").collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in collected]
    assert keys == sorted(keys)


def test_mega_conversation_skew_completes_and_spreads(spark):
    rows, golden = synth_transcripts(n_convs=5, turns_per_conv=10, seed=13, mega_conv=True)
    tdf = transcripts_df(spark, rows)
    out = convert_transcripts(tdf, num_partitions=8)
    # turn-level salting must spread the mega-conv's EXPENSIVE (python-
    # kernel) rows across all salted partitions; txt/json rows take the
    # native no-shuffle path and keep source partitioning by design
    per_part = (
        out.withColumn("pid", F.spark_partition_id())
        .where(F.col("conv_id").endswith("-mega") & F.col("doc_kind").isin("html", "pdf"))
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(per_part) == 8, f"mega-conv concentrated in {len(per_part)} partitions"
    counts = [r["count"] for r in per_part]
    assert max(counts) < 3 * min(counts), f"unbalanced: {counts}"
    assert out.count() == len(golden)


def test_with_readability_columns(spark):
    rows = [
        ("c", 0, "user", "<p>main body text, long enough to score well, with commas</p><nav>menu</nav>", None, None),
        ("c", 1, "user", "plain text turn", None, None),
    ]
    tdf = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    out = {r["turn_idx"]: r for r in convert_transcripts(tdf, num_partitions=2, with_readability=True).collect()}
    assert "main body text" in out[0]["readability_text"]
    assert out[0]["link_density"] == 0.0
    assert out[1]["readability_text"] is None  # native branch: diagnostics null
    # baseline extraction unchanged
    assert out[0]["extracted_text"].startswith("main body text")


def test_doc_kind_classification_matches_python(spark):
    rows, _ = synth_transcripts(n_convs=20, turns_per_conv=10, seed=99, mega_conv=False)
    from article_extraction_spark.extract.core import classify_payload
    from article_extraction_spark.extract.udfs import classify_payload_col

    tdf = transcripts_df(spark, rows)
    got = tdf.select("text", classify_payload_col(F.col("text")).alias("k")).collect()
    for r in got:
        assert r["k"] == classify_payload(r["text"])


def test_arrow_extraction_stage_matches_pandas_udf_path(spark):
    """r8: the default (simple, no-readability) convert path runs the
    Arrow-native mapInArrow extraction stage; its output — text, spans,
    error capture, byte counts — must be row-identical to the legacy
    pandas-UDF path (pdf_mode='layout' exercises that path's plumbing for
    html/txt/json rows via the same to_text kernel)."""
    from pyspark.sql import functions as F

    from article_extraction_spark.extract.udfs import (
        _EXTRACT_BATCH_SCHEMA,
        extract_map_in_arrow,
        to_text_udf,
    )

    rows = [
        ("c1", 0, "html", "<p>alpha</p><div>skip</div><p>beta</p>"),
        ("c1", 1, "html", "<p></p>"),                      # drops: no paragraphs
        ("c1", 2, "html", "&amp; <p>entity path</p>"),      # parser fallback
        ("c1", 3, "pdf", "JVBERi0xLjQKJSVFT0Y="),           # undecodable → error
        ("c1", 4, "pdf", "%PDF-garbage"),                   # error path
        ("c2", 0, "html", "<p>  padded  </p>\n<p>two</p>"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, doc_kind string, text string"
    ).withColumn("n_source_bytes", F.octet_length("text").cast("long"))

    arrow = df.mapInArrow(extract_map_in_arrow, _EXTRACT_BATCH_SCHEMA)
    legacy = df.withColumn("_r", to_text_udf(F.col("doc_kind"), F.col("text"))).select(
        "conv_id", "turn_idx", "doc_kind", "n_source_bytes",
        F.col("_r.extracted_text").alias("extracted_text"),
        F.col("_r.spans").alias("spans"),
        F.col("_r.error").alias("extract_error"),
    )
    a = sorted(map(tuple, arrow.collect()))
    b = sorted(map(tuple, legacy.collect()))
    assert a == b
    # spans survive as real offsets through the arrow batch assembly
    by_key = {(r[0], r[1]): r for r in a}
    good = by_key[("c1", 0)]
    assert good[4] == "alpha\nbeta" and [tuple(s) for s in good[5]] == [(3, 8), (30, 34)]
    assert by_key[("c1", 3)][6] is not None  # error captured, not raised
