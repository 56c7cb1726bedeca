"""Physical-plan audits: the engine must produce the plans we designed for
(pushdown, pruning, broadcast, TakeOrderedAndProject, no Python in native
paths) — not just correct results (round brief: '.explain' the plan and
iterate until it's the plan you'd want)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.where(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # only the 3 referenced columns reach the scan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate:timestamp" in plan


def test_dim_join_is_broadcast(spark):
    from article_extraction_spark.operators.joins import broadcast_dim_join

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    j = broadcast_dim_join(
        li.select(F.col("l_suppkey").alias("n_nationkey"), "l_quantity"), nation, "n_nationkey"
    )
    assert "BroadcastHashJoin" in _plan(j)


def test_top_k_compiles_to_take_ordered(spark):
    from article_extraction_spark.operators import top_k

    o = spark.read.parquet(f"{SF}/orders.parquet")
    plan = _plan(top_k(o.select("o_orderkey", "o_totalprice"), F.col("o_totalprice"), 10))
    assert "TakeOrderedAndProject" in plan


def test_native_branch_has_no_python(spark):
    """txt/json passthrough must stay JVM-side; only the html/pdf branch may
    cross into Python (the anti-scaling fix — convert.py routing)."""
    from article_extraction_spark.pipeline.convert import convert_transcripts
    from article_extraction_spark.schemas import TRANSCRIPTS_SCHEMA

    t = spark.createDataFrame([], TRANSCRIPTS_SCHEMA)
    out = convert_transcripts(t, num_partitions=2)
    plan = _plan(out)
    # exactly ONE python-eval operator (the html/pdf branch), none for
    # native (r8: the default path is the Arrow-native MapInArrow stage)
    assert plan.count("MapInArrow") == 1
    assert plan.count("ArrowEvalPython") == 0
    # and the union has a pure-projection second branch
    assert "Union" in plan


def test_ordered_output_uses_range_partitioning(spark):
    """W1 export: rangepartitioning + per-partition sort, NOT a single-
    partition global sort."""
    from article_extraction_spark.pipeline.convert import ordered_output
    from article_extraction_spark.schemas import EXTRACTED_TURNS_SCHEMA

    df = spark.createDataFrame([], EXTRACTED_TURNS_SCHEMA)
    plan = _plan(ordered_output(df, 4))
    assert "rangepartitioning(conv_id" in plan
    assert "Sort [conv_id" in plan
    assert "], false, 0" in plan  # global=false: sort is within partitions


def test_anti_join_resume_plan(spark):
    from article_extraction_spark.pipeline.checkpoint import resume_missing_turns

    a = spark.range(10).select(
        F.col("id").cast("string").alias("conv_id"), F.lit(0).alias("turn_idx")
    )
    pending = resume_missing_turns(a, a.limit(3))
    assert "LeftAnti" in _optimized(pending)


def test_scan_count_minhash_single_signature_pass(spark):
    """The MinHash pipeline must read the corpus through the cached shingle
    table, not re-tokenize per band/join side: the plan references
    InMemoryTableScan (the persist barrier)."""
    from article_extraction_spark.operators.dedup import minhash_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    pairs = minhash_dedup(docs, "doc_id", "text")
    assert "InMemoryTableScan" in _plan(pairs)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same (key, n) join with ZERO Exchange
    nodes — the pre-shuffle was paid once at write time. At 100 TB this is
    the difference between an 800 GB shuffle per join and none."""
    from article_extraction_spark.sinks import write_bucketed_table

    orders = spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey", "o_totalprice")
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    write_bucketed_table(orders, "b_orders", ["o_custkey"], 8)
    write_bucketed_table(cust, "b_cust", ["o_custkey"], 8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        j = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")


def test_top_terms_plan_partial_agg_and_take_ordered(spark):
    from article_extraction_spark.operators.textstats import top_terms

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    plan = _plan(top_terms(docs, "text", k=20))
    assert "TakeOrderedAndProject" in plan          # no global sort
    assert plan.count("HashAggregate") >= 2, plan   # map-side partial agg


def test_contamination_plan_no_cartesian(spark):
    from article_extraction_spark.operators.dedup import contamination_check

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") < 50)
    plan = _plan(contamination_check(docs, bench, "doc_id", "text", ngram=3))
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # shingle-keyed equi-join


def test_lsh_bucketed_probe_prunes_partitions(spark, tmp_path):
    """VERDICT r3 item 4: the bucketed ANN layout's probe must be partition
    PRUNING — the scan opens only the probed bucket= directories, and the
    plan carries the probe as PartitionFilters (not a post-scan Filter)."""
    import numpy as np

    from article_extraction_spark.operators.similarity_search import (
        lsh_topk_bucketed,
        query_probe_keys,
        write_lsh_bucketed,
    )

    rng = np.random.RandomState(0)
    rows = [(i, rng.randn(16).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    path = str(tmp_path / "ann")
    write_lsh_bucketed(df, path, "v", n_planes=6, seed=42)

    query = rows[7][1]
    top = lsh_topk_bucketed(
        spark, path, "v", query, k=5, n_planes=6, probe_hamming=1, seed=42
    )
    got = {r["vec_id"] for r in top.collect()}
    assert 7 in got  # the planted query vector itself is recalled

    # pruning happens at planning time: the probe key set is a
    # PartitionFilter on the scan node, NOT a post-scan Filter
    plan = _plan(top)
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in part_filters and " IN " in part_filters, part_filters

    # behavioral proof that non-probed directories are never OPENED:
    # corrupt every non-probed bucket's parquet files — the probe must
    # still succeed while a full scan fails
    import glob
    import os

    keys = set(query_probe_keys(query, n_planes=6, probe_hamming=1, seed=42))
    existing = {
        int(os.path.basename(d).split("=")[1]) for d in glob.glob(f"{path}/bucket=*")
    }
    data_schema = "vec_id long, v array<double>"  # bucket comes from the layout
    corrupted = 0
    for b in existing - keys:
        for f in glob.glob(f"{path}/bucket={b}/*.parquet"):
            with open(f, "wb") as fh:
                fh.write(b"not a parquet file")
            corrupted += 1
    assert corrupted > 0, "fixture degenerate: every bucket probed"
    again = lsh_topk_bucketed(
        spark, path, "v", query, k=5, n_planes=6, probe_hamming=1, seed=42,
        schema=data_schema,
    )
    assert 7 in {r["vec_id"] for r in again.collect()}
    with pytest.raises(Exception):
        spark.read.schema(data_schema).parquet(path).count()


def test_pack_blocks_no_global_window(spark):
    """Sequence packing must never plan a single-task global window: the
    only Window node is partitioned by the range-partition id."""
    from article_extraction_spark.operators.packing import concat_chunk_plan

    df = spark.createDataFrame([(i, 10 + i % 50) for i in range(500)], "doc_id long, n long")
    plan = concat_chunk_plan(df, "n", 128, order_col="doc_id", num_partitions=4)
    s = _plan(plan)
    plan._retained_cache.unpersist()
    # every Window node mentions _pid in its partition spec
    for seg in s.split("Window ")[1:]:
        head = seg.split("\n", 1)[0]
        assert "_pid" in head, head
    assert "Generate explode" in s or "explode" in s  # native block fan-out
    assert "ArrowEvalPython" not in s and "BatchEvalPython" not in s


def test_bigram_lm_no_cartesian(spark):
    """LM scoring is equi-joins only — no BroadcastNestedLoopJoin or
    CartesianProduct anywhere in the plan."""
    from article_extraction_spark.operators.textstats import bigram_lm_score

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(50)], "doc_id long, text string"
    )
    out = bigram_lm_score(docs, "doc_id", "text")
    s = _plan(out)
    out._retained_cache.unpersist()
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    assert "ArrowEvalPython" not in s  # fully native


def test_boilerplate_removal_shuffles_hashes_not_lines(spark):
    """The line-frequency aggregate groups on the xxhash64 key (longs
    through the shuffle), and the whole op stays JVM-native."""
    from article_extraction_spark.operators.textstats import remove_boilerplate_lines

    docs = spark.createDataFrame(
        [(i, "header\nbody %d\nfooter" % i) for i in range(50)], "doc_id long, text string"
    )
    out = remove_boilerplate_lines(docs, "doc_id", "text")
    s = _plan(out)
    assert "xxhash64" in s
    assert "ArrowEvalPython" not in s and "BatchEvalPython" not in s
    assert "CartesianProduct" not in s


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """Round 4: the IVF layout's nprobe probe must be planning-time
    partition pruning, same proof shape as the LSH-bucketed test —
    corrupt every non-probed cluster's files, the probe still succeeds."""
    import glob
    import os

    import numpy as np

    from article_extraction_spark.operators.similarity_search import (
        ivf_topk,
        kmeans_fit,
        write_ivf,
    )

    rng = np.random.RandomState(3)
    # four well-separated blobs of 100 vectors each
    centers = np.eye(4, 8) * 20.0
    rows = []
    for i in range(400):
        v = centers[i % 4] + rng.randn(8) * 0.05
        rows.append((i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    centroids = kmeans_fit(df, "v", k=4, max_iter=5, seed=42)
    path = str(tmp_path / "ivf")
    write_ivf(df, path, "v", centroids)

    query = rows[8][1]  # blob 0 member
    top = ivf_topk(spark, path, "v", query, centroids, k=5, nprobe=1)
    got = {r["vec_id"] for r in top.collect()}
    assert 8 in got
    assert all(v % 4 == 0 for v in got), got  # all neighbors from blob 0

    plan = _plan(top)
    part_filters = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "cluster" in part_filters, part_filters

    # nearest centroid to the query, by the same ranking ivf_topk uses
    probe = min(
        range(4), key=lambda i: sum((a - b) ** 2 for a, b in zip(centroids[i], query))
    )
    data_schema = "vec_id long, v array<double>"
    corrupted = 0
    for d in glob.glob(f"{path}/cluster=*"):
        if int(os.path.basename(d).split("=")[1]) != probe:
            for f in glob.glob(f"{d}/*.parquet"):
                with open(f, "wb") as fh:
                    fh.write(b"not a parquet file")
                corrupted += 1
    assert corrupted > 0
    again = ivf_topk(
        spark, path, "v", query, centroids, k=5, nprobe=1, schema=data_schema
    )
    assert 8 in {r["vec_id"] for r in again.collect()}
    with pytest.raises(Exception):
        spark.read.schema(data_schema).parquet(path).count()


def test_zorder_residual_predicate_is_pushed_down(spark, tmp_path):
    """Within the files the sidecar keeps, the box predicate must reach
    the parquet scan as PushedFilters — the files are z-sorted, so
    parquet row-group min/max stats make the pushed predicate skip row
    groups too (free within-file skipping)."""
    import numpy as np

    from article_extraction_spark.operators.zorder import (
        read_zordered,
        write_zordered,
    )

    rng = np.random.RandomState(4)
    df = spark.createDataFrame(
        [(i, float(rng.uniform(0, 100)), float(rng.uniform(0, 100))) for i in range(5000)],
        "id long, x double, y double",
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], n_files=8)
    q = read_zordered(spark, path, {"x": (10.0, 30.0), "y": (40.0, 60.0)})
    plan = _plan(q)
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    # the formatted plan truncates long filter lists with "..." — assert
    # on the x bounds (always within the visible prefix)
    assert "GreaterThanOrEqual(x,10.0)" in pushed, pushed
    assert "LessThanOrEqual(x,30.0)" in pushed, pushed


def test_length_bucketed_batches(spark):
    """Padding-aware inference batching: pow2 caps exact on boundaries,
    per-batch padded cost within budget, deterministic slots, oversize
    rows fail loudly (guard is load-bearing inside bucket_cap)."""
    import pytest as _pytest

    from article_extraction_spark.operators.packing import length_bucketed_batches

    rows = [(i, l) for i, l in enumerate([3, 5, 9, 16, 17, 33, 120, 128, 129, 250, 1, 64])]
    df = spark.createDataFrame(rows, "seq_id long, n_tokens long")
    out = length_bucketed_batches(df, "n_tokens", 256, order_col="seq_id")
    got = {r["seq_id"]: (r["bucket_cap"], r["batch_id"], r["slot"]) for r in out.collect()}
    assert got[3][0] == 16 and got[4][0] == 32  # 16 → cap 16 (exact), 17 → 32
    assert got[7][0] == 128 and got[8][0] == 256
    # budget: a 256-cap batch holds exactly 1 row → ids 8 and 9 in
    # different batches
    assert got[8][1] != got[9][1]
    # 128-cap batches hold 2 rows → 6 and 7 share one
    assert got[6][1] == got[7][1] and {got[6][2], got[7][2]} == {0, 1}
    from pyspark.sql import functions as F

    cost = out.groupBy("batch_id").agg((F.count("*") * F.max("padded_len")).alias("c"))
    assert cost.where("c > 256").count() == 0
    assert out.where("n_tokens > padded_len").count() == 0
    # determinism across partitionings
    again = {
        r["seq_id"]: (r["bucket_cap"], r["batch_id"], r["slot"])
        for r in length_bucketed_batches(
            df.repartition(7), "n_tokens", 256, order_col="seq_id"
        ).collect()
    }
    assert again == got
    # oversize fails the job
    big = spark.createDataFrame([(1, 300)], "seq_id long, n_tokens long")
    with _pytest.raises(Exception, match="batch_token_budget"):
        length_bucketed_batches(big, "n_tokens", 256).collect()
    # NULL length fails too (review r5: used to land in the cap-1 bucket)
    nul = spark.createDataFrame([(1, None)], "seq_id long, n_tokens long")
    with _pytest.raises(Exception, match="NULL"):
        length_bucketed_batches(nul, "n_tokens", 256).collect()
    with _pytest.raises(ValueError, match="budget"):
        length_bucketed_batches(df, "n_tokens", 0)
    # ADVICE r5: identifiers needing backticks (spaces/hyphens/dots) must
    # parse and resolve — the raw f-string interpolation used to fail
    weird = df.withColumnRenamed("n_tokens", "seq len.x-1")
    wgot = {
        r["seq_id"]: (r["bucket_cap"], r["batch_id"], r["slot"])
        for r in length_bucketed_batches(
            weird, "seq len.x-1", 256, order_col="seq_id"
        ).collect()
    }
    assert wgot == got
