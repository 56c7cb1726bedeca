"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (native higher-order
functions + TakeOrderedAndProject — per-partition heaps, no global sort),
and an LSH-bucketed approximate variant as the scale path (the IVF-style
probe: only candidate buckets are scanned).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.similarity import cosine_similarity_col


def brute_force_topk(
    df: DataFrame, vec_col: str, query: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    The query becomes a literal array (constant-folded); the score is a
    native expression, so the scan stays whole-stage-codegen'd and column-
    pruned; orderBy+limit compiles to TakeOrderedAndProject.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col),
        cosine_similarity_col(F.col(vec_col), q).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def hyperplane_bucket_udf(dim: int, n_planes: int, seed: int, spark) -> "F.pandas_udf":
    """Seeded random-hyperplane sign-bucket (shared with dedup)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes).astype("float64")
    bc = spark.sparkContext.broadcast(planes)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        import numpy as np

        pl = bc.value
        mat = np.vstack([np.asarray(v, dtype="float64") for v in vecs])
        signs = (mat @ pl) > 0
        return pd.Series((signs * (1 << np.arange(pl.shape[1]))).sum(axis=1), dtype="int64")

    return bucket


def query_probe_keys(
    query: list[float], n_planes: int = 8, probe_hamming: int = 1, seed: int = 42
) -> list[int]:
    """The query vector's sign-bucket plus every bucket within
    ``probe_hamming`` bit-flips (multiprobe), using the SAME seeded
    hyperplanes as hyperplane_bucket_udf — query-side and data-side hashing
    must agree bit-for-bit or recall silently collapses."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.randn(len(query), n_planes).astype("float64")
    qsigns = (np.asarray(query, dtype="float64") @ planes) > 0
    qkey = int((qsigns * (1 << np.arange(n_planes))).sum())

    keys = {qkey}
    if probe_hamming >= 1:
        keys |= {qkey ^ (1 << b) for b in range(n_planes)}
    if probe_hamming >= 2:
        for b1 in range(n_planes):
            for b2 in range(b1 + 1, n_planes):
                keys.add(qkey ^ (1 << b1) ^ (1 << b2))
    return sorted(keys)


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: scan only buckets whose sign-key is within
    ``probe_hamming`` bits of the query's bucket (multiprobe), as a filter
    over an unbucketed table. For the 100 TB path use write_lsh_bucketed +
    lsh_topk_bucketed, where the probe becomes partition PRUNING (only the
    probed buckets' files are read)."""
    keys = query_probe_keys(query, n_planes, probe_hamming, seed)
    bucket = hyperplane_bucket_udf(len(query), n_planes, seed, df.sparkSession)
    bucketed = df.withColumn("_bk", bucket(F.col(vec_col)))
    candidates = bucketed.where(F.col("_bk").isin(keys))
    return brute_force_topk(candidates, vec_col, query, k, id_col)


def write_lsh_bucketed(
    df: DataFrame,
    path: str,
    vec_col: str,
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize the ANN storage layout: parquet partitioned by the
    hyperplane sign-key (``bucket=<key>/`` directories, ≤2^n_planes of
    them). One UDF pass at write time; every subsequent probe is partition
    pruning — the scan touches only the probed buckets' files, so query
    cost is O(corpus/2^n_planes × probes), independent of corpus size."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        if first is None or first["d"] is None or first["d"] < 0:
            raise ValueError(
                "cannot infer vector dim (empty input or NULL first vector) "
                "— pass dim= explicitly"
            )
        dim = int(first["d"])
    bucket = hyperplane_bucket_udf(dim, n_planes, seed, df.sparkSession)
    df.withColumn("bucket", bucket(F.col(vec_col))).write.partitionBy("bucket").mode(
        mode
    ).parquet(path)


def lsh_topk_bucketed(
    spark,
    path: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
    schema=None,
) -> DataFrame:
    """Approximate top-k over a write_lsh_bucketed table. The probe-key
    filter lands on the partition column, so Catalyst prunes to the probed
    ``bucket=`` directories at planning time (PartitionFilters in the scan
    node — plan-audited in tests/test_plans.py); non-probed buckets are
    never opened.

    Pass ``schema`` (data columns only — ``bucket`` is discovered from the
    directory layout) on large tables: it skips footer-sampling schema
    inference, so planning never touches any data file."""
    keys = query_probe_keys(query, n_planes, probe_hamming, seed)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    t = reader.parquet(path).where(F.col("bucket").isin(keys))
    return brute_force_topk(t, vec_col, query, k, id_col)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — round 4. The second scale path alongside the
# LSH-bucketed layout: centroids are TRAINED (DataFrame-native Lloyd's
# k-means) instead of random hyperplanes, the table is partitioned by
# nearest-centroid id, and a query probes only the nprobe nearest
# centroids' partitions (planning-time pruning, like lsh_topk_bucketed).
# ---------------------------------------------------------------------------


def nearest_centroid_col(vec_col, centroids: list[list[float]]):
    """0-based nearest-centroid id as ONE native expression per row — no
    shuffle, no UDF, ties to the lowest centroid id (array_position finds
    the first occurrence of the min). ``vec_col`` may be a column name or
    a Column expression (round 5: PQ assigns per SLICED subvector)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cl = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(
        cl,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int = 8,
    max_iter: int = 10,
    seed: int = 42,
    tol: float = 1e-9,
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Lloyd's k-means trained with DataFrame ops only.

    Per iteration: the ASSIGNMENT is a per-row native expression
    (`nearest_centroid_col` — distances to the literal centroid array +
    array_position of the min; NO shuffle, no UDF), and the UPDATE is one
    posexplode + groupBy(cluster, dim) avg — ONE shuffle with map-side
    partial aggregation; k×dim averaged values come back to the driver
    (the only driver-side state, bytes not rows). Deterministic: init
    takes the k vectors with the smallest xxhash64(id-free vector bytes,
    seed) — stable under any partitioning — and argmin ties go to the
    lowest centroid id. Empty clusters keep their previous centroid.

    HOF distances are interpreted (no codegen), so fitting cost is
    O(rows × k × dim) interpreted ops per iteration — standard IVF
    practice applies at 100 TB: fit on a sample (``sample_fraction``),
    assign the full corpus once at write time (`write_ivf`)."""
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    # NULL vectors make the nearest-centroid expression NULL (the row
    # would crash the update step and, at write time, land in a
    # never-probed __HIVE_DEFAULT_PARTITION__ — review r4); drop them
    # here, and surface length mismatches with a real error below.
    df = df.where(F.col(vec_col).isNotNull())
    init_rows = (
        df.select(F.col(vec_col).alias("_v"))
        .dropDuplicates(["_v"])
        .orderBy(F.xxhash64(F.col("_v"), F.lit(seed)))
        .limit(k)
        .collect()
    )
    centroids = [list(map(float, r["_v"])) for r in init_rows]
    if len(centroids) < k:
        raise ValueError(f"need ≥{k} distinct vectors to init k-means, got {len(centroids)}")
    for _ in range(max_iter):
        assigned = df.select(
            nearest_centroid_col(vec_col, centroids).alias("_c"),
            F.col(vec_col).alias("_v"),
        )
        means = (
            assigned.select("_c", F.posexplode("_v").alias("_d", "_x"))
            .groupBy("_c", "_d")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["_c"], {})[r["_d"]] = r["_m"]
        if None in by_cluster:
            raise ValueError(
                "some vectors produced no nearest centroid — vector lengths "
                f"differ from the centroid dim ({len(centroids[0])}); "
                "normalize the embedding column before fitting"
            )
        for ci, dims in by_cluster.items():
            new_centroids[ci] = [dims[d] for d in sorted(dims)]
        movement = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if movement < tol:
            break
    return centroids


def write_ivf(
    df: DataFrame,
    path: str,
    vec_col: str,
    centroids: list[list[float]],
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF layout: parquet partitioned by nearest-centroid
    id (``cluster=<i>/`` directories). Assignment is one native-expression
    pass; every subsequent probe is partition pruning.

    NULL vectors are EXCLUDED (they are unsearchable by similarity and
    would otherwise land in a never-probed ``__HIVE_DEFAULT_PARTITION__``
    — review r4); a vector whose length differs from the centroid dim
    fails the write with a clear error instead of silently vanishing
    into that same partition. The guard is folded INTO the ``cluster``
    column itself (``otherwise(raise_error)``) — a project-then-drop
    assertion column gets pruned by Catalyst and never runs (review r5)."""
    raw = nearest_centroid_col(vec_col, centroids)
    guarded = F.when(raw.isNotNull(), raw).otherwise(
        F.raise_error(
            F.lit(f"vector length != centroid dim ({len(centroids[0])})")
        ).cast("int")
    )
    assigned = df.where(F.col(vec_col).isNotNull()).withColumn(
        "cluster", guarded
    )
    assigned.write.partitionBy("cluster").mode(mode).parquet(path)


def ivf_topk(
    spark,
    path: str,
    vec_col: str,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    schema=None,
) -> DataFrame:
    """Approximate top-k over a write_ivf table: rank centroids by L2 to
    the query (driver-side, k×dim floats), read only the ``nprobe``
    nearest clusters — the filter lands on the partition column, so
    Catalyst prunes to those ``cluster=`` directories at planning time
    (same mechanism as lsh_topk_bucketed, pruning-proof in
    tests/test_training_ops.py). ``nprobe=len(centroids)`` is exhaustive
    and exactly equals brute_force_topk (the oracle uses this).

    Pass ``schema`` (data columns only) on large tables to skip
    footer-sampling inference at planning."""
    q = [float(x) for x in query]
    ranked = sorted(
        range(len(centroids)),
        key=lambda i: (sum((a - b) ** 2 for a, b in zip(centroids[i], q)), i),
    )
    probe = ranked[: max(1, nprobe)]
    reader = spark.read.schema(schema) if schema is not None else spark.read
    t = reader.parquet(path).where(F.col("cluster").isin(probe))
    return brute_force_topk(t, vec_col, q, k, id_col)


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — round 5. The COMPRESSION member of the ANN
# family: LSH buckets (recall control), IVF (partition pruning), PQ
# (memory): a d-dim vector becomes m small codes (one byte each at
# k≤256), and search scores candidates with Asymmetric Distance
# Computation — per-subspace lookup tables of query-to-centroid
# distances, summed by code. At 100 TB the PQ-coded corpus is ~d·4/m
# times smaller than raw float32 vectors, and ADC scoring is m array
# lookups + adds per candidate, fully codegen'd (no python).
# Compose with IVF: coarse cluster pruning first, ADC within probed
# clusters (the standard IVFADC layout).
# ---------------------------------------------------------------------------


def pq_residual_col(vec_col, coarse_centroids: list[list[float]], cluster_col=None):
    """``x − coarse_centroid(x)`` as one native expression — the quantity
    residual PQ encodes (Jégou et al. 2011 §III: coding residuals instead
    of raw vectors is what makes m·log2(k) bits/vector usable, because the
    codebook's entropy is spent on the fine structure instead of
    re-describing the coarse cell). Pass ``cluster_col`` when the coarse
    assignment is already a stored column (the IVF write path) so it is
    not recomputed."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    cl = (
        nearest_centroid_col(v, coarse_centroids)
        if cluster_col is None
        else (F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col)
    )
    cents = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in coarse_centroids]
    )
    return F.zip_with(v, F.element_at(cents, cl + 1), lambda a, b: a - b)


def pq_train(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    max_iter: int = 5,
    seed: int = 42,
    coarse_centroids: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: the vector splits into ``m`` equal
    slices and each slice gets its own k-means codebook (kmeans_fit — the
    DataFrame-native Lloyd's). Returns m codebooks of k centroids.

    With ``coarse_centroids`` the codebooks are trained on RESIDUALS
    ``x − coarse_centroid(x)`` (one codebook set shared across coarse
    cells — the memory-practical IVFADC variant of Jégou et al. §V.A)."""
    probe = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if probe is None:
        raise ValueError("pq_train needs at least one non-NULL vector")
    dim = len(probe[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    src, col = df, F.col(vec_col)
    if coarse_centroids is not None:
        src = df.where(F.col(vec_col).isNotNull()).select(
            pq_residual_col(vec_col, coarse_centroids).alias("_r")
        )
        col = F.col("_r")
    books = []
    for j in range(m):
        sliced = src.select(F.slice(col, j * sub + 1, sub).alias("_v"))
        books.append(kmeans_fit(sliced, "_v", k=k, max_iter=max_iter, seed=seed + j))
    return books


def pq_code_col(
    vec_col,
    codebooks: list[list[list[float]]],
    coarse_centroids: list[list[float]] | None = None,
    cluster_col=None,
):
    """array<int> of length m: per-subspace nearest-centroid codes, one
    native expression (m × nearest_centroid_col over slices). With
    ``coarse_centroids`` the codes quantize the RESIDUAL
    ``x − coarse_centroid(x)`` (residual IVFADC). On the write path pass
    ``cluster_col`` (the stored partition column) so the coarse
    assignment isn't re-derived; without it the assignment expression is
    inlined per subspace (interpreted HOFs have no CSE — fine for
    oracle-scale scoring, use the stored column at scale)."""
    sub = len(codebooks[0][0])
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    if coarse_centroids is not None:
        v = pq_residual_col(v, coarse_centroids, cluster_col=cluster_col)
    return F.array(
        *[
            nearest_centroid_col(F.slice(v, j * sub + 1, sub), book)
            for j, book in enumerate(codebooks)
        ]
    )


def pq_adc_col(codes_col, query: list[float], codebooks: list[list[list[float]]]):
    """ADC score from a STORED codes column (the IVFADC read path — no
    vectors touched): the query's per-centroid squared distances are
    precomputed driver-side (m×k floats) and shipped as literals; the
    score is the j-ordered sum of lookups — a FIXED fold, so the float
    result is reproducible bit-for-bit at any partitioning."""
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    sub = len(codebooks[0][0])
    adc = F.lit(0.0)
    for j, book in enumerate(codebooks):
        qj = query[j * sub : (j + 1) * sub]
        lut = [sum((a - b) * (a - b) for a, b in zip(qj, cent)) for cent in book]
        adc = adc + F.element_at(
            F.array(*[F.lit(float(x)) for x in lut]), F.element_at(c, j + 1) + 1
        )
    return adc


def ivfadc_score_col(
    codes_col,
    cluster_col,
    query: list[float],
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    clusters: list[int] | None = None,
):
    """Residual-ADC score from STORED (cluster, codes) columns: for rows
    in coarse cell c the codes encode ``x − centroid_c``, so the query's
    lookup tables are built from its RESIDUAL ``q − centroid_c`` — one
    m×k table per probed cell, precomputed driver-side and folded into a
    CASE over the cluster column (nprobe branches, all literal lookups,
    no vectors read). ``clusters`` limits the branches to the probed
    cells (default: every cell). Rows outside ``clusters`` score NULL."""
    cl = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    if clusters is None:
        clusters = list(range(len(coarse_centroids)))
    expr = None
    for c in clusters:
        rq = [a - b for a, b in zip(query, coarse_centroids[c])]
        branch = pq_adc_col(codes_col, rq, codebooks)
        expr = F.when(cl == int(c), branch) if expr is None else expr.when(cl == int(c), branch)
    return expr


def _probe_cells(coarse_centroids: list[list[float]], query: list[float], nprobe: int) -> list[int]:
    """The nprobe coarse cells nearest the query under the (dist, index)
    tie rule — SHARED by ivfadc_topk (stage 1) and ivfadc_rerank_topk
    (stage 2): both stages must select the same partitions or stage-1
    candidates would vanish from stage 2's IN-filtered scan (review r7)."""
    ranked = sorted(
        range(len(coarse_centroids)),
        key=lambda i: (
            sum((a - b) ** 2 for a, b in zip(coarse_centroids[i], query)),
            i,
        ),
    )
    return ranked[: max(1, nprobe)]


def ivfadc_topk(
    spark,
    path: str,
    query: list[float],
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    schema=None,
) -> DataFrame:
    """The full residual-IVFADC read path over a write_ivf table whose
    rows carry STORED residual-PQ codes: rank coarse cells by L2 to the
    query driver-side, prune the scan to the ``nprobe`` nearest cells'
    ``cluster=`` directories (planning-time PartitionFilters), score the
    survivors with per-cell residual lookup tables (ivfadc_score_col) —
    no vector column is ever read. Returns (id, cluster, adc) ordered by
    (adc, id).

    Pass ``schema`` (data columns only) on large tables to skip
    footer-sampling inference at planning."""
    q = [float(x) for x in query]
    probe = _probe_cells(coarse_centroids, q, nprobe)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    t = reader.parquet(path).where(F.col("cluster").isin(probe))
    scored = t.select(
        F.col(id_col),
        F.col("cluster"),
        ivfadc_score_col(codes_col, "cluster", q, coarse_centroids, codebooks, probe).alias(
            "adc"
        ),
    )
    return scored.orderBy(F.col("adc"), F.col(id_col)).limit(k)


def ivfadc_rerank_topk(
    spark,
    path: str,
    query: list[float],
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    codes_col: str = "codes",
    schema=None,
) -> DataFrame:
    """IVFADC+R (Jégou et al. 2011 §IV, round 7): ADC distances are
    quantization-approximate, so the standard refinement re-ranks the
    ADC top-``rerank`` candidates by their EXACT vectors and returns the
    true top-k of that candidate set — recall@k strictly improves over
    ADC-only on the same bits (tested).

    Stage 1 is ``ivfadc_topk`` (partition-pruned, codes only — no vector
    column read). Stage 2 re-reads ONLY the probed ``cluster=``
    partitions, column-pruned to (id, vec) and filtered to the ≤R
    candidate ids (an IN over driver-collected ids — R is small by
    construction, and parquet row-group stats prune under it), then
    ranks by exact squared L2 with the deterministic (dist, id) tie
    rule. Cost at 100 TB: one bounded scan of nprobe partitions' vector
    column for R rows — the refinement reads R full vectors where ADC
    read none, the exact trade §IV describes.

    Returns (id, exact squared-L2 ``dist``) ordered by (dist, id).
    Requires the IVF layout to carry the raw vector column alongside the
    codes (write the table with both; storage-separated vector stores
    can point-read candidates instead — same candidates, same result).
    """
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    q = [float(x) for x in query]
    stage1 = ivfadc_topk(
        spark, path, q, coarse_centroids, codebooks,
        k=rerank, nprobe=nprobe, id_col=id_col, codes_col=codes_col, schema=schema,
    )
    cand = [r[id_col] for r in stage1.select(id_col).collect()]
    if not cand:
        return stage1.select(id_col, F.lit(0.0).alias("dist")).limit(0)
    probe = _probe_cells(coarse_centroids, q, nprobe)  # same cells as stage 1
    reader = spark.read.schema(schema) if schema is not None else spark.read
    t = (
        reader.parquet(path)
        .where(F.col("cluster").isin(probe))
        .where(F.col(id_col).isin(cand))
    )
    # exact squared L2 in the fixed left-to-right fold (cross-engine rule)
    dist = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(x) for x in q]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        t.select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.col("dist"), F.col(id_col))
        .limit(k)
    )


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
) -> DataFrame:
    """Top-k by Asymmetric Distance over raw vectors: encode + pq_adc_col
    + (adc, id)-ordered limit (a total order). NULL vectors are EXCLUDED
    (unsearchable, same rule as write_ivf/brute_force_topk — review r5:
    they used to rank FIRST, ascending sort is NULLS FIRST); a vector
    whose length mismatches the codebooks fails loudly via a guard
    folded INTO the codes column (the project-then-drop lesson)."""
    raw_codes = pq_code_col(vec_col, codebooks)
    guarded = F.when(
        ~F.exists(raw_codes, lambda x: x.isNull()), raw_codes
    ).otherwise(
        F.raise_error(
            F.lit(
                f"vector length incompatible with PQ codebooks "
                f"({len(codebooks)}×{len(codebooks[0][0])} dims)"
            )
        ).cast("array<int>")
    )
    scored = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), guarded.alias("_codes")
    )
    return (
        scored.withColumn("adc", pq_adc_col("_codes", query, codebooks))
        .orderBy(F.col("adc"), F.col(id_col))
        .limit(k)
        .select(id_col, "_codes", "adc")
        .withColumnRenamed("_codes", "codes")
    )
