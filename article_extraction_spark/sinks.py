"""Sinks S8-S12 (reference SURVEY.md §2.1) on the parquet-manifest layer
(Iceberg jars absent; every function notes its Iceberg twin).

S8  full-replace        → overwrite            (≙ createOrReplace)
S9  batched append      → append               (≙ .append(); per-partition
                           Arrow writes replace the reference's BATCH=20
                           hand batching, paper_document_table.py:114-158)
S10 upsert by key       → anti-join + union + overwrite
                           (≙ MERGE INTO ... WHEN MATCHED/NOT MATCHED)
S11 CSV metric sinks    → csv overwrite / keyed upsert
S12 DDL variants        → table-name templating (≙ tometadata variants,
                           paper_information_table.py:359-363)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_or_replace(df: DataFrame, path: str) -> None:
    """S8 (reference epoch_table.py:192 to_sql if_exists='replace')."""
    df.write.mode("overwrite").parquet(path)


def append(df: DataFrame, path: str) -> None:
    """S9 — one atomic job commit instead of 20-row transactions."""
    df.write.mode("append").parquet(path)


def upsert_by_key(spark: SparkSession, src: DataFrame, path: str, keys: list[str]) -> None:
    """S10: update-else-insert (reference paper_information_table.py:296-303).

    Parquet emulation of MERGE: keep destination rows whose key is absent
    from src (left_anti), union src, rewrite. On Iceberg this is a single
    ``MERGE INTO dst USING src ON keys WHEN MATCHED THEN UPDATE SET * WHEN
    NOT MATCHED THEN INSERT *`` with snapshot isolation; at 100 TB pair it
    with partition pruning on the key's bucket so only touched files rewrite.
    """
    if os.path.exists(path):
        dest = spark.read.parquet(path)
        merged = dest.join(src.select(*keys).distinct(), keys, "left_anti").unionByName(
            src, allowMissingColumns=True
        )
        # stage first: the plan reads the files it is about to overwrite
        tmp = path + "__staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
        _rmtree(tmp)
    else:
        src.write.mode("overwrite").parquet(path)


def _rmtree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def write_csv_metrics(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11 (reference scores.py:434-460): single-file CSV for small metric
    tables (coalesce(1) is fine — metrics are tiny by construction)."""
    df.coalesce(1).write.mode(mode).option("header", True).csv(path)


def variant_table_path(base_dir: str, variant: str) -> str:
    """S12: named table variants of a fixed schema (reference
    _get_variant_table :359-363 — ``paper_information_<variant>``)."""
    return os.path.join(base_dir, f"paper_information_{variant}")


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed co-location (the 100 TB join strategy): pay the shuffle ONCE
    at write time — every later equi-join or aggregation on ``keys`` between
    tables bucketed with the same (keys, n_buckets) runs EXCHANGE-FREE
    (verified by tests/test_plans.py::test_bucketed_join_has_no_exchange).
    Spark's ``bucketBy`` is the warehouse analog of Iceberg's
    ``bucket(N, key)`` hidden-partition transform the checkpoint layer uses
    (pipeline/partitioning.bucket_col); sortBy additionally lets the join
    skip its sort."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table_name)
