"""Epoch-style fact-table loader (reference tables/epoch_table.py:170-192):
CSV → rename map → synthesized id_paper → per-type coercion dispatch → pad
missing columns.

The reference dispatches coerce-to-NULL casts per column set
(epoch_table.py:130-143 over tables/other/columns.py:74-95); the engine does
the same with native try-casts, driven by COLUMN_SETS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.casts import (
    to_boolean_col,
    to_date_col,
    to_float_comma_col,
    to_int_comma_col,
    to_timestamp_col,
)

# the 11 epoch columns consumed downstream (reference
# paper_information_table.py:103-116) + type-set dispatch; extend freely —
# the mechanism is schema-driven, not hand-coded per column
DEFAULT_RENAME = {
    "Model": "model",
    "Abstract": "abstract",
    "Approach": "approach",
    "Parameters": "parameters",
    "Training compute (FLOP)": "training_compute",
    "Training power draw (W)": "training_power_draw_w",
    "Hardware quantity": "hardware_quantity",
    "Publication date": "publication_date",
    "Country (of organization)": "country_of_organization",
    "Training hardware": "training_hardware",
    "Link": "link",
}

COLUMN_SETS: dict[str, list[str]] = {
    "date": ["publication_date"],
    "datetime": ["last_modified"],
    "boolean": ["possibly_over_1e23_flop", "frontier_model"],
    "float": ["parameters", "training_compute", "training_power_draw_w", "hardware_quantity"],
    "int": ["citations"],
}

_CASTERS = {
    "date": to_date_col,
    "datetime": to_timestamp_col,
    "boolean": to_boolean_col,
    "float": to_float_comma_col,
    "int": to_int_comma_col,
}


def load_epoch_csv(
    spark: SparkSession,
    path: str,
    rename: dict[str, str] | None = None,
    column_sets: dict[str, list[str]] | None = None,
    pad_columns: list[str] | None = None,
) -> DataFrame:
    rename = rename or DEFAULT_RENAME
    column_sets = column_sets or COLUMN_SETS
    raw = spark.read.option("header", True).csv(path)
    df = raw.select(
        *[F.col(f"`{src}`").alias(dst) for src, dst in rename.items() if src in raw.columns]
    )
    # synthesized surrogate key (reference epoch_table.py:184): row_number
    # over the natural column order for determinism
    order_cols = [df.columns[0]] + df.columns[1:]
    df = df.withColumn("id_paper", F.row_number().over(Window.orderBy(*order_cols)))
    for type_name, cols in column_sets.items():
        caster = _CASTERS[type_name]
        for c in cols:
            if c in df.columns:
                df = df.withColumn(c, caster(F.col(c)))
    for c in pad_columns or []:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df.select("id_paper", *[c for c in df.columns if c != "id_paper"])
