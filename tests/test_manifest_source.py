"""The catalog as a Spark-native format: datasource writer (executors
write parquet, driver commits the manifest atomically) + reader
(per-file partitions, snapshot time travel, schema alignment)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def registered(spark):
    from article_extraction_spark.sources.manifest_source import (
        ManifestTableDataSource,
    )

    spark.dataSource.register(ManifestTableDataSource)
    return spark


def _rows(lo, hi):
    base = dt.datetime(2026, 1, 1)
    return [(i, f"v{i}", base + dt.timedelta(seconds=i)) for i in range(lo, hi)]


def test_write_read_roundtrip_and_time_travel(registered, tmp_path):
    from article_extraction_spark.catalog import ManifestTable

    spark = registered
    root = str(tmp_path / "tbl")
    schema = "k long, v string, ts timestamp"
    spark.createDataFrame(_rows(0, 10), schema).write.format("manifest_table").option(
        "root", root
    ).mode("append").save()
    spark.createDataFrame(_rows(10, 15), schema).write.format("manifest_table").option(
        "root", root
    ).mode("append").save()

    t = ManifestTable(root)
    assert t.snapshots() == [1, 2]
    # datasource reader == catalog (spark parquet) reader, both snapshots
    ds_all = spark.read.format("manifest_table").option("root", root).load()
    assert sorted(map(tuple, ds_all.collect())) == sorted(
        map(tuple, t.read(spark).collect())
    )
    assert ds_all.count() == 15
    ds_v1 = (
        spark.read.format("manifest_table")
        .option("root", root).option("snapshot_id", 1).load()
    )
    assert ds_v1.count() == 10

    # overwrite mode truncates the head, old snapshot still readable
    spark.createDataFrame(_rows(100, 103), schema).write.format(
        "manifest_table"
    ).option("root", root).mode("overwrite").save()
    assert spark.read.format("manifest_table").option("root", root).load().count() == 3
    assert (
        spark.read.format("manifest_table")
        .option("root", root).option("snapshot_id", 2).load().count()
    ) == 15


def test_interop_and_schema_alignment(registered, tmp_path):
    """Spark-written snapshots read through the datasource reader, and a
    file from before a widening merge aligns (missing column → NULL)."""
    from article_extraction_spark.catalog import ManifestTable

    spark = registered
    root = str(tmp_path / "tbl")
    t = ManifestTable(root)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.merge(spark, spark.createDataFrame([(3, "c", 9.5)], "k long, v string, w double"), ["k"])
    ds = spark.read.format("manifest_table").option("root", root).load()
    got = {r["k"]: (r["v"], r["w"]) for r in ds.collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}


def test_failed_write_commits_nothing_and_sweeps_files(registered, tmp_path):
    import glob

    from article_extraction_spark.catalog import ManifestTable

    spark = registered
    root = str(tmp_path / "tbl")
    schema = "k long, v string, ts timestamp"
    spark.createDataFrame(_rows(0, 5), schema).write.format("manifest_table").option(
        "root", root
    ).mode("append").save()

    @F.udf("long")
    def boom(k):
        raise RuntimeError("planted failure")

    bad = spark.createDataFrame(_rows(5, 9), schema).withColumn("k", boom("k"))
    with pytest.raises(Exception):
        bad.write.format("manifest_table").option("root", root).mode("append").save()
    t = ManifestTable(root)
    assert t.snapshots() == [1], "failed write must not commit a manifest"
    # every data file on disk is referenced by the surviving manifest
    referenced = set(t._load(1)["files"])
    on_disk = {
        p.split(f"{root}/", 1)[1]
        for p in glob.glob(f"{root}/data/commit-*/*.parquet")
    }
    assert on_disk == referenced, f"orphans: {on_disk - referenced}"
    assert t.read(spark).count() == 5


def test_empty_write_and_empty_snapshot_read(registered, tmp_path):
    """review r4: an all-empty write still commits (an empty snapshot),
    and reading it yields an empty frame — pyspark hands read() a None
    partition for an empty partition list, which must not crash."""
    spark = registered
    root = str(tmp_path / "tbl")
    schema = "k long, v string"
    spark.createDataFrame([], schema).write.format("manifest_table").option(
        "root", root
    ).mode("append").save()
    ds = spark.read.format("manifest_table").option("root", root).load()
    assert ds.count() == 0
    assert [f.name for f in ds.schema.fields] == ["k", "v"]
    # no stray zero-row data files were committed or left behind
    import glob

    assert glob.glob(f"{root}/data/commit-*/*.parquet") == []


def test_user_supplied_schema_rejected_with_hint(registered, tmp_path):
    spark = registered
    root = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "k long, v string").write.format(
        "manifest_table"
    ).option("root", root).mode("append").save()
    with pytest.raises(Exception, match="derives its schema"):
        spark.read.format("manifest_table").schema("k long").option(
            "root", root
        ).load().collect()


def test_stream_write_availablenow_and_offset_resume(registered, tmp_path):
    """writeStream.format('manifest_table'): each micro-batch commits a
    stream-append snapshot carrying its batch id; a second availableNow
    run resumes the SOURCE offsets and appends only new conversations."""
    from article_extraction_spark.catalog import ManifestTable
    from article_extraction_spark.sources.transcript_source import (
        SyntheticTranscriptsDataSource,
    )

    spark = registered
    spark.dataSource.register(SyntheticTranscriptsDataSource)
    root, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")

    def run_once():
        q = (
            spark.readStream.format("synthetic_transcripts")
            .option("n_convs", 20).option("turns_per_conv", 2)
            .option("convs_per_batch", 10).load()
            .writeStream.format("manifest_table")
            .option("root", root).option("checkpointLocation", ck)
            .option("writer_id", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    run_once()
    t = ManifestTable(root)
    assert t.read(spark).count() == 20  # first 10 convs × 2 turns
    head = t._load(t.current_snapshot_id())
    assert head["operation"] == "append" and "stream_batch" in head
    assert head["stream_writer"] == ck

    run_once()
    got = t.read(spark)
    assert got.count() == 40
    assert got.select("conv_id").distinct().count() == 20
    # exactly-once across the runs
    assert got.select("conv_id", "turn_idx").distinct().count() == 40
    # datasource reader agrees with the catalog reader
    ds = spark.read.format("manifest_table").option("root", root).load()
    assert ds.count() == 40


def test_stream_commit_replay_is_idempotent(registered, tmp_path):
    """The Iceberg-style replay guard: committing the same batch id twice
    (engine crash between sink commit and checkpoint record) must leave
    ONE snapshot and remove the duplicate files."""
    import glob
    import os

    from article_extraction_spark.catalog import ManifestTable
    from article_extraction_spark.sources.manifest_source import (
        _FilesMessage,
        _ManifestStreamWriter,
    )
    from pyspark.sql.types import StructType

    spark = registered
    root = str(tmp_path / "tbl")
    schema = spark.createDataFrame([(1,)], "k long").schema
    w = _ManifestStreamWriter(root, schema, writer_id="pipeline-A")

    def fake_files(tag):
        rel = f"data/commit-x/{tag}.parquet"
        os.makedirs(os.path.join(root, "data/commit-x"), exist_ok=True)
        spark.createDataFrame([(1,)], "k long").toPandas().to_parquet(
            os.path.join(root, rel)
        )
        return [rel]

    w.commit([_FilesMessage(fake_files("first"))], batchId=7)
    t = ManifestTable(root)
    assert len(t.snapshots()) == 1

    dup = fake_files("replayed")
    w.commit([_FilesMessage(dup)], batchId=7)  # replay of the same batch
    assert len(t.snapshots()) == 1, "replayed batch must not commit again"
    assert not os.path.exists(os.path.join(root, dup[0])), "dup file kept"
    assert t.read(spark).count() == 1

    # a genuinely NEW batch commits normally
    w.commit([_FilesMessage(fake_files("second"))], batchId=8)
    assert len(t.snapshots()) == 2
    assert t.read(spark).count() == 2

    # review r4 (reproduced data loss): a DIFFERENT pipeline starting at
    # batch 0 must NOT be treated as a replay of this one's batch 0
    other = _ManifestStreamWriter(root, schema, writer_id="pipeline-B")
    other.commit([_FilesMessage(fake_files("otherq"))], batchId=0)
    assert len(t.snapshots()) == 3
    assert t.read(spark).count() == 3
    # while pipeline A replaying batch 8 is still detected across B's commit
    dup8 = fake_files("replay8")
    w.commit([_FilesMessage(dup8)], batchId=8)
    assert len(t.snapshots()) == 3
    assert not os.path.exists(os.path.join(root, dup8[0]))
