"""Row-level expectations + quarantine (operators/quality_gate.py) and
snapshot rollback (catalog.rollback)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from article_extraction_spark.operators.quality_gate import quarantine, validate_rows


def test_validate_and_quarantine(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (3, 7.0, None), (4, None, "x")],
        "id long, price double, note string",
    )
    rules = {
        "price_positive": F.col("price") > 0,
        "note_present": "note IS NOT NULL",
    }
    got = {
        r["id"]: list(r["_violations"])
        for r in validate_rows(df, rules).collect()
    }
    # NULL price: `price > 0` is NULL -> violation (unevaluable must not pass)
    assert got == {
        1: [],
        2: ["price_positive"],
        3: ["note_present"],
        4: ["price_positive"],
    }
    good, bad = quarantine(df, rules)
    assert sorted(r["id"] for r in good.collect()) == [1]
    assert "_violations" not in good.columns
    assert sorted(r["id"] for r in bad.collect()) == [2, 3, 4]
    with pytest.raises(ValueError, match="at least one rule"):
        validate_rows(df, {})
    # single codegen'd pass: no shuffle, no python
    plan = validate_rows(df, rules)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_rollback_restores_snapshot_state(spark, tmp_path):
    from article_extraction_spark.catalog import ManifestTable

    t = ManifestTable(str(tmp_path / "t"))
    v1 = t.append(spark.createDataFrame([(1,), (2,)], "id long"))
    t.delete(spark, spark.createDataFrame([(2,)], "id long"), ["id"])
    v2 = t.current_snapshot_id()
    t.append(spark.createDataFrame([(3,)], "id long"))
    t.overwrite(spark.createDataFrame([(99,)], "id long"))

    # rollback to the MoR-delete snapshot: files AND delete entries restore
    v5 = t.rollback(v2)
    assert t.current_snapshot_id() == v5
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1]
    # the overwritten state is still time-travelable (nothing deleted)
    assert [r["id"] for r in t.read(spark, snapshot_id=v5 - 1).collect()] == [99]
    # rollback to a plain append snapshot
    t.rollback(v1)
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 2]
    # rolling back to the current head is a no-op
    assert t.rollback(t.current_snapshot_id()) == t.current_snapshot_id()
    # expired target raises
    with pytest.raises(FileNotFoundError):
        t.rollback(9999)
