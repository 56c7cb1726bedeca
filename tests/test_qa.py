from __future__ import annotations

from pyspark.sql import functions as F

from article_extraction_spark.extraction.qa import qa_extract


def test_qa_span_offsets_point_into_original_text(spark):
    text = ("filler words here. " * 30) + "the training hardware was NVIDIA A100 gpus. " + ("tail. " * 30)
    df = spark.createDataFrame([(1, text)], "id int, text string")
    row = qa_extract(df, "text", ["hardware", "gpus"], window=200, stride=80).first()["qa"]
    assert "hardware" in row["answer"].lower() or "gpus" in row["answer"].lower()
    for c in row["candidates"]:
        assert text[c["start"] : c["end"]].strip()[:200] == c["answer"]
    scores = [c["score"] for c in row["candidates"]]
    assert scores == sorted(scores, reverse=True)
    assert len(row["candidates"]) <= 3
    answers = [c["answer"] for c in row["candidates"]]
    assert len(answers) == len(set(answers))  # dedup by text


def test_qa_aggregators_and_empty(spark):
    text = "alpha beta gamma hardware delta. epsilon hardware zeta."
    df = spark.createDataFrame([(1, text)], "id int, text string")
    best = qa_extract(df, "text", ["hardware"], window=30, stride=10).first()["qa"]["answer"]
    longest = qa_extract(df, "text", ["hardware"], window=30, stride=10, aggregator="longest").first()["qa"]["answer"]
    concat = qa_extract(df, "text", ["hardware"], window=30, stride=10, aggregator="concat").first()["qa"]["answer"]
    assert best and longest and concat
    assert len(longest) >= len(best)
    assert best in concat

    none = qa_extract(df, "text", ["zzzmissing"], window=30, stride=10).first()["qa"]
    assert none["answer"] == "" and none["candidates"] == []

    null_df = spark.createDataFrame([(1, None)], "id int, text string")
    assert qa_extract(null_df, "text", ["x"]).first()["qa"]["answer"] == ""
