"""Maintained MinHash-LSH near-duplicate index (round 7, VERDICT r6 #2).

``incremental_exact_dedup``'s near-dup sibling: a continuously-ingesting
corpus must not recompute LSH candidates over everything per batch. The
index persists one MinHash signature row per document (the source of
truth, a ManifestTable) plus an append-only serving layout of banded
LSH keys hive-partitioned by a band-hash bucket. Ingesting a batch:

1. signatures for the batch's docs (already-indexed doc_ids skip — a
   replayed batch is a no-op, mirroring incremental_exact_dedup);
2. LSH candidates = fresh-vs-index (serving scan pruned to the batch's
   buckets at planning time — PartitionFilters, plan-asserted) plus
   fresh-vs-fresh (self-join bounded by batch size);
3. verification by signature agreement: n_matches = |{k : sig_a[k] =
   sig_b[k]}| ≥ ceil(threshold·K) — the standard unbiased Jaccard
   estimator (Broder 1997), integer-exact so any engine replays it;
4. durable order: serving append FIRST, then the signature MERGE —
   a crash between leaves orphan band rows that the retry re-pairs
   and dedups (self-healing), whereas the reverse order would
   anti-join the batch away with its bands never exported (the
   ADVICE r7 BM25 failure shape).

Hashing is md5 arithmetic end to end (the sketches.py convention):
base shingle hash = first 60 md5 bits mod P (P = 2^31 − 1), per-k
hashes via (a_k·h + b_k) mod P with constants derived from md5(k) —
products stay under 2^62, so BIGINT engines agree bit-for-bit. A
second engine can replay signatures, bands, buckets, candidates AND
verification (no xxhash64 in the index path, unlike the batch-mode
``minhash_lsh_candidates``).

100-TB shape: signature rows are K longs per doc (text never enters
the index); candidate joins shuffle band keys, bounded by batch size
× bands plus the pruned serving slice; the within-batch self-join is
batch-sized. Band rows are immutable per doc, so the serving layout
is append-only — no overwrite, no read-modify-write; compact its
small files with any parquet-dir compaction on a schedule.

Reference behavior: dedup semantics follow the same near-dup contract
as operators/dedup.py (reference has no streaming dedup; carried from
the corpus-curation surface, SURVEY §2).
"""

from __future__ import annotations

import hashlib
import json
import math
import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col

__all__ = ["MaintainedMinHashIndex", "minhash_params", "MINHASH_P"]

# Mersenne prime 2^31 − 1: (a·h + b) mod P stays < 2^62 for a, b, h < 2^31,
# exact in any 64-bit-integer engine.
MINHASH_P = (1 << 31) - 1


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_k, b_k) per hash from md5("mh-<k>") — shared by
    the Spark expressions, the DuckDB oracle and the python twin."""
    out = []
    for k in range(num_hashes):
        d = hashlib.md5(f"mh-{k}".encode()).hexdigest()
        out.append(((int(d[:8], 16) % (MINHASH_P - 1)) + 1, int(d[8:16], 16) % MINHASH_P))
    return out


def _base_hash(shingle_col) -> F.Column:
    """First 60 md5 bits mod P — DuckDB: ('0x'||substr(md5(g),1,15))::BIGINT % P."""
    return F.pmod(
        F.conv(F.substring(F.md5(shingle_col), 1, 15), 16, 10).cast("long"),
        F.lit(MINHASH_P),
    )


class MaintainedMinHashIndex:
    _META = "index_meta.json"
    _PENDING_SUFFIX = None  # serving is append-only: no pending set needed

    def __init__(
        self,
        root: str,
        num_hashes: int = 16,
        bands: int = 8,
        shingle_n: int = 3,
        n_buckets: int = 16,
    ):
        from ..catalog import ManifestTable

        if num_hashes % bands:
            raise ValueError("num_hashes must be divisible by bands")
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        self.root = root
        cfg = {
            "num_hashes": num_hashes,
            "bands": bands,
            "shingle_n": shingle_n,
            "n_buckets": n_buckets,
        }
        meta_path = os.path.join(root, self._META)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                stored = json.load(f)
            mismatch = {k: (stored.get(k), v) for k, v in cfg.items() if stored.get(k) != v}
            if mismatch:
                raise ValueError(
                    f"index at {root} was built with different parameters: {mismatch} "
                    "— signatures/bands would disagree"
                )
        else:
            os.makedirs(root, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump(cfg, f)
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.shingle_n = shingle_n
        self.n_buckets = n_buckets
        self.params = minhash_params(num_hashes)
        self.sigs = ManifestTable(f"{root}/sigs")
        self.serving_dir = f"{root}/serving"

    # -- expression builders ----------------------------------------------------

    def sig_col(self, shingle_hash_col) -> F.Column:
        """array<long> length-K signature from a MATERIALIZED base-hash
        array column (HOFs have no CSE — hash shingles once upstream)."""

        def mk(a: int, b: int):
            return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P))

        return F.array(
            *[F.array_min(F.transform(shingle_hash_col, mk(a, b))) for a, b in self.params]
        )

    def band_cols(self, sig_col) -> F.Column:
        """array<string>: band b's key = comma-joined minhash slice."""
        rpb = self.rows_per_band
        return F.transform(
            F.sequence(F.lit(0), F.lit(self.bands - 1)),
            lambda b: F.concat_ws(
                ",", F.transform(F.slice(sig_col, b * rpb + 1, rpb), lambda x: x.cast("string"))
            ),
        )

    def bucket_col(self, band_idx_col, band_key_col) -> F.Column:
        """Serving partition: first 16 md5 bits of "<band_idx>|<band_key>"
        mod n_buckets (term_bucket_col's replayable shape)."""
        h = F.md5(F.concat_ws("|", band_idx_col.cast("string"), band_key_col))
        return (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % self.n_buckets).cast("int")

    # -- write path ---------------------------------------------------------------

    def ingest(
        self,
        spark,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        threshold: float = 0.5,
        on_pairs=None,
        commit: bool = True,
    ) -> dict:
        """Index a batch; returns ``{"pairs": DataFrame (persisted),
        "new_docs", "skipped_existing", "buckets_probed", "min_matches"}``.

        ``pairs`` holds the verified near-dup pairs INVOLVING this batch's
        fresh docs — (id_a, id_b, n_matches) with id_a < id_b and
        n_matches ≥ ceil(threshold · num_hashes). Docs whose text yields
        no shingles can never collide in a band and are skipped. Callers
        ``.unpersist()`` the pairs frame when done.

        ``on_pairs``: optional callback invoked with the materialized
        pairs BEFORE the index commits. Load-bearing for streaming
        (the exact-dedup twin's append-before-merge lesson): once the
        index commits, a replayed batch is a no-op and returns EMPTY
        pairs — a sink writing pairs only after ingest returns would
        lose them forever on a crash between the two. Writing inside
        the callback makes the pairs sink at-least-once instead
        (re-appended on replay; readers dedup on (id_a, id_b))."""
        if not 0.0 < threshold <= 1.0:
            raise ValueError(f"threshold must be in (0, 1], got {threshold}")
        min_matches = math.ceil(threshold * self.num_hashes - 1e-9)

        id_type = docs.schema[id_col].dataType.simpleString()
        # validate against an existing pin always; WRITE the pin only on
        # the commit path (review r7: a crashed commit=False probe with a
        # wrongly-typed id column must not poison the empty index forever)
        self._pin_meta("doc_id_type", id_type, write=commit)

        # r8 (VERDICT r7 #4): steady-state ingest was job-latency-bound
        # (~7 driver round-trips per batch in local mode). The batch and
        # fresh counts now come from ONE left-join-marked aggregate (the
        # former separate batch.count() + fresh.count() jobs), and the
        # signature count is read off the already-materialized cache after
        # the bucket collect. (An Observation-based fold was tried first:
        # CollectMetrics nodes inside persisted subtrees silently break
        # Observation.get, so counts stay explicit jobs.)
        batch = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
        ).dropDuplicates(["doc_id"])
        try:
            existing_ids = self.sigs.read(spark).select("doc_id")
        except FileNotFoundError:
            existing_ids = None
        if existing_ids is not None:
            marked = batch.join(
                existing_ids.withColumn("_old", F.lit(1)), "doc_id", "left"
            )
            row = marked.agg(
                F.count(F.lit(1)).alias("n_in"), F.count("_old").alias("n_old")
            ).first()
            n_in, n_fresh = row["n_in"], row["n_in"] - row["n_old"]
            fresh = marked.where(F.col("_old").isNull()).select("doc_id", "text")
        else:
            n_in = n_fresh = batch.count()  # bootstrap: nothing indexed yet
            fresh = batch
        fresh = fresh.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            return self._ingest_fresh(
                spark, fresh, existing_ids, n_in, n_fresh, min_matches,
                on_pairs, commit,
            )
        finally:
            fresh.unpersist(blocking=False)

    def _ingest_fresh(
        self, spark, fresh, existing_ids, n_in, n_fresh, min_matches,
        on_pairs=None, commit=True,
    ) -> dict:
        # one md5 pass per shingle, materialized once (HOF no-CSE rule).
        # Tokenless docs are dropped FIRST: shingles_col maps an empty
        # token array to [""], which would otherwise band every empty doc
        # into one giant colliding bucket.
        hashed = (
            fresh.where(F.col("text").isNotNull() & F.col("text").rlike("[a-zA-Z0-9]"))
            .select(
                "doc_id",
                F.transform(shingles_col(F.col("text"), self.shingle_n), _base_hash).alias("_h"),
            )
        )
        sig_df = hashed.select("doc_id", self.sig_col(F.col("_h")).alias("sig")).persist(
            StorageLevel.MEMORY_AND_DISK
        )

        banded = (
            sig_df.select(
                "doc_id",
                F.posexplode(self.band_cols(F.col("sig"))).alias("band_idx", "band_key"),
            )
            .withColumn("bucket", self.bucket_col(F.col("band_idx"), F.col("band_key")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # ≤ n_buckets ints by construction — bounded driver round-trip.
        # This ONE job also materializes the sig/band caches (r8: the
        # former standalone sig_df.count() materialization job is gone;
        # the count below reads the already-populated cache).
        probe = sorted({r["bucket"] for r in banded.select("bucket").distinct().collect()})
        n_new = sig_df.count()

        # r8: for normally-sized batches, hint the truly batch-bounded side
        # of the candidate joins as a broadcast: banded is ≤ n_fresh × bands
        # rows BY CONSTRUCTION, so the gate on the known n_fresh is exact.
        # The candidate set itself is NOT hinted — its size depends on band
        # collisions against the existing index (a hot near-dup cluster can
        # explode it), so a forced broadcast there could hard-fail where a
        # shuffle join survives by spilling; the planner/AQE keeps choosing
        # for those joins from runtime sizes.
        small_batch = n_fresh * self.bands <= 2_000_000
        bj = F.broadcast if small_batch else (lambda df: df)

        cand_parts = []
        if probe and os.path.isdir(self.serving_dir):
            old = self._read_serving(spark).where(F.col("bucket").isin(probe))
            vs_index = (
                bj(banded).join(
                    old.select(
                        "bucket", "band_idx", "band_key", F.col("doc_id").alias("_old_id")
                    ),
                    ["bucket", "band_idx", "band_key"],
                )
                .where(F.col("_old_id") != F.col("doc_id"))
                .select(
                    F.least("doc_id", "_old_id").alias("id_a"),
                    F.greatest("doc_id", "_old_id").alias("id_b"),
                )
            )
            cand_parts.append(vs_index)
        a, b = bj(banded.alias("a")), banded.alias("b")
        vs_batch = a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        cand_parts.append(vs_batch)
        cands = cand_parts[0]
        for extra in cand_parts[1:]:
            cands = cands.unionByName(extra)
        cands = cands.dropDuplicates(["id_a", "id_b"])

        # signature lookup: fresh sigs (this batch) + the stored table;
        # disjoint by construction (fresh anti-joined the stored ids)
        lookup = sig_df.select("doc_id", "sig")
        if existing_ids is not None:
            lookup = lookup.unionByName(self.sigs.read(spark).select("doc_id", "sig"))
        match_cnt = F.size(
            F.filter(
                F.zip_with(F.col("_sig_a"), F.col("_sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        pairs = (
            cands.join(
                lookup.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("_sig_a")), "id_a"
            )
            .join(lookup.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("_sig_b")), "id_b")
            .withColumn("n_matches", match_cnt)
            .where(F.col("n_matches") >= min_matches)
            .select("id_a", "id_b", "n_matches")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            pairs.count()
            if on_pairs is not None:
                # BEFORE the commits: a replayed batch returns empty pairs
                # (see ingest docstring), so late sinks would lose these
                on_pairs(pairs)
            if n_new and commit:
                # serving FIRST: a crash before the sig merge leaves orphan
                # band rows the retry dedups; sig-first would drop the batch
                # from candidate generation forever
                banded.select("bucket", "band_idx", "band_key", "doc_id").write.partitionBy(
                    "bucket"
                ).mode("append").parquet(self.serving_dir)
                self.sigs.merge(spark, sig_df, ["doc_id"])
        except Exception:
            pairs.unpersist(blocking=False)
            raise
        finally:
            sig_df.unpersist(blocking=False)
            banded.unpersist(blocking=False)
        return {
            "pairs": pairs,
            "new_docs": n_new,
            "skipped_existing": n_in - n_fresh,
            "buckets_probed": len(probe),
            "min_matches": min_matches,
        }

    # -- helpers --------------------------------------------------------------

    def _pin_meta(self, key: str, value: str, write: bool = True) -> None:
        meta_path = os.path.join(self.root, self._META)
        with open(meta_path) as f:
            meta = json.load(f)
        if key not in meta:
            if not write:
                return  # probe mode: nothing pinned yet, nothing to check
            meta[key] = value
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, meta_path)
        elif meta[key] != value:
            raise ValueError(
                f"index at {self.root} was built with {key}={meta[key]!r}, got {value!r}"
            )

    def _read_serving(self, spark) -> DataFrame:
        import json as _json

        with open(os.path.join(self.root, self._META)) as f:
            id_type = _json.load(f).get("doc_id_type", "bigint")
        schema = f"band_idx int, band_key string, doc_id {id_type}, bucket int"
        return spark.read.schema(schema).parquet(self.serving_dir)
