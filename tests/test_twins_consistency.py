"""The engine keeps python twins of several native column expressions (used
inside fuzzy-join/registry kernels). These must agree exactly — randomized
cross-checks Spark-expression vs python-twin."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _rand_strings(rng, n, alphabet):
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 16))) for _ in range(n)]


def test_parse_numeric_column_vs_python(spark):
    from article_extraction_spark.extraction.registry import _parse_numeric_py
    from article_extraction_spark.functions.casts import parse_numeric_col

    rng = random.Random(3)
    vals = _rand_strings(rng, 400, "0123456789., kmbtKMBT") + ["1.5k", "x", "", "7", "2M"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["p"] for r in df.select(parse_numeric_col(F.col("v")).alias("p")).collect()]
    for v, spark_val in zip(vals, got):
        py_val = _parse_numeric_py(v)
        if spark_val is None:
            assert py_val is None, (v, spark_val, py_val)
        else:
            # python twin coerces to int (registry numeric targets)
            assert py_val == int(spark_val), (v, spark_val, py_val)


def test_normalize_column_vs_python(spark):
    from article_extraction_spark.functions.textnorm import normalize_alnum_col
    from article_extraction_spark.operators.joins import normalize_alnum

    rng = random.Random(4)
    vals = _rand_strings(rng, 400, "abcXYZ012 ,;/&+()-!.éß") + ["NVIDIA A100-SXM4 (80GB)!"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["n"] for r in df.select(normalize_alnum_col(F.col("v")).alias("n")).collect()]
    for v, spark_val in zip(vals, got):
        assert spark_val == normalize_alnum(v), (v, spark_val)


def test_split_tokens_column_vs_python(spark):
    from article_extraction_spark.functions.textnorm import split_tokens, split_tokens_col

    rng = random.Random(6)
    vals = _rand_strings(rng, 300, "ab AB,;/&+ and ")
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    for extra in (False, True):
        got = [
            r["t"]
            for r in df.select(split_tokens_col(F.col("v"), extra_separators=extra).alias("t")).collect()
        ]
        for v, spark_val in zip(vals, got):
            assert list(spark_val or []) == split_tokens(v, extra_separators=extra), (v, extra)


def test_classify_column_vs_python(spark):
    from article_extraction_spark.extract.core import classify_payload
    from article_extraction_spark.extract.udfs import classify_payload_col

    rng = random.Random(8)
    vals = _rand_strings(rng, 400, "<p>/a {[%PDF-JVBERi0 \n") + ["%PDF-1.4", "  {\"a\":1}", "<div>x</div>"]
    # Unicode-whitespace prefixes (ADVICE r1): Java \s is ASCII-only, so the
    # python twin must NOT treat \xa0 /   /   as strippable either
    vals += [ws + body for ws in ("\xa0", " ", " ", "\x0b", " \t\n")
             for body in ('{"a":1}', "[1]", "<div>x</div>", "plain")]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = [r["k"] for r in df.select(classify_payload_col(F.col("v")).alias("k")).collect()]
    for v, spark_val in zip(vals, got):
        assert spark_val == classify_payload(v), repr(v)
