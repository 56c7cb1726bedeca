"""Dimension-table builders (reference corpus-build steps 2-3,
create_tables.py:18-22).

hardware: select/rename → trim → numeric coerce → W→kW → drop null/empty
names → dedup by name → clip ≥0 (reference tables/hardware_table.py:62-84).
country: rename → drop null factor → numeric year → LATEST year per country
(reference tables/country_table.py:61-74).

Surrogate ids are row_number over the natural key sort — deterministic under
any partitioning (the reference's autoincrement follows CSV order, which has
no distributed analog; key-sorted ids are stable and reproducible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.physics import watts_to_kilowatts_col
from ..operators.aggregates import latest_per_group


def _with_id(df: DataFrame, id_col: str, order_col: str) -> DataFrame:
    w = Window.orderBy(order_col)
    return df.withColumn(id_col, F.row_number().over(w))


def load_hardware_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV (Hardware name, Max performance, TDP (W)) → hardware dim."""
    raw = spark.read.option("header", True).csv(path)
    required = ["Hardware name", "Max performance", "TDP (W)"]
    missing = [c for c in required if c not in raw.columns]
    if missing:
        raise KeyError(f"Missing expected hardware columns: {missing}")
    cleaned = raw.select(
        F.trim(F.col("`Hardware name`")).alias("hardware"),
        F.col("`Max performance`").try_cast("double").alias("compute"),
        watts_to_kilowatts_col(F.col("`TDP (W)`").try_cast("double")).alias("power"),
    )
    cleaned = (
        cleaned.where(F.col("hardware").isNotNull() & (F.col("hardware") != ""))
        .dropDuplicates(["hardware"])
        .withColumn("compute", F.greatest(F.col("compute"), F.lit(0.0)))
    )
    return _with_id(cleaned, "id_hardware", "hardware").select(
        "id_hardware", "hardware", "compute", "power"
    )


def load_country_csv(spark: SparkSession, path: str) -> DataFrame:
    """OWID-shaped CSV (Entity, Year, Carbon intensity...) → country dim,
    reduced to the latest year per country."""
    raw = spark.read.option("header", True).csv(path)
    renamed = raw.select(
        F.col("Entity").alias("country"),
        F.col("Year").try_cast("int").alias("year"),
        F.col("`Carbon intensity of electricity - gCO2/kWh`").try_cast("double").alias("gco2_kwh"),
    )
    filtered = renamed.where(F.col("gco2_kwh").isNotNull() & F.col("year").isNotNull())
    latest = latest_per_group(filtered, "country", "year").select("country", "gco2_kwh")
    return _with_id(latest, "id_country", "country").select("id_country", "country", "gco2_kwh")
