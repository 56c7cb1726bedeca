"""Unit math & physics derivations (F15, F16) as guarded column arithmetic.

Reference semantics: tables/hardware_table.py:74,81-82 (W→kW, clip ≥0) and
tables/paper_information_table.py:305-349 with constants PUE=1.20, MFU=0.30
(reference config.py:8-9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PUE = 1.20
DEFAULT_MFU = 0.30


def watts_to_kilowatts_col(c: Column) -> Column:
    """F15: W → kW, clipped at 0 (hardware_table.py:74, 81-82)."""
    return F.greatest(c.cast("double") * F.lit(1e-3), F.lit(0.0))


def training_time_hours_col(
    training_compute: Column, h_compute: Column, h_number: Column, mfu: float = DEFAULT_MFU
) -> Column:
    """hours = compute / (n · h_compute · 1e12 · MFU) / 3600, only when every
    input is present and positive (reference :312-327)."""
    ok = (
        training_compute.isNotNull()
        & (training_compute > 0)
        & h_compute.isNotNull()
        & (h_compute > 0)
        & h_number.isNotNull()
        & (h_number > 0)
    )
    denom = h_number * h_compute * F.lit(1e12) * F.lit(mfu)
    return F.when(ok, training_compute / denom / F.lit(3600.0))


def energy_kwh_col(
    training_time_hours: Column,
    power_draw: Column,
    h_power: Column,
    h_number: Column,
    pue: float = DEFAULT_PUE,
) -> Column:
    """kWh = (power_draw/1000 | h_power·n) · hours · PUE (reference :329-339);
    power_draw (whole-system watts) wins over per-device h_power (kW)."""
    hours_ok = training_time_hours.isNotNull() & (training_time_hours > 0)
    return F.when(
        hours_ok & power_draw.isNotNull() & (power_draw > 0),
        (power_draw / F.lit(1000.0)) * training_time_hours * F.lit(pue),
    ).when(
        hours_ok & h_power.isNotNull() & (h_power > 0) & h_number.isNotNull() & (h_number > 0),
        (h_power * h_number) * training_time_hours * F.lit(pue),
    )


def co2eq_col(energy_kwh: Column, gco2_kwh: Column) -> Column:
    """co2eq = kWh · gCO2/kWh / 1000 when the factor is present and ≥0
    (reference :341-349)."""
    return F.when(
        energy_kwh.isNotNull() & gco2_kwh.isNotNull() & (gco2_kwh >= 0),
        energy_kwh * (gco2_kwh / F.lit(1000.0)),
    )
