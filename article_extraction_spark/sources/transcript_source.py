"""Custom PySpark DataSource for transcripts (round 4) — the Spark-4
public Python Data Source API (`pyspark.sql.datasource`), the idiomatic
re-expression of the reference's "source" concept: instead of
driver-side fixture prep or a mapInPandas fetch kernel, the engine
exposes `spark.read.format("synthetic_transcripts")` with real partition
planning, per-partition deterministic generation on the EXECUTORS, and
option-driven source-side pruning, plus a streaming twin whose offsets
make `readStream` resume exactly where the checkpoint says.

Rows share the transcripts schema and the per-conversation seeding
TECHNIQUE of fixtures.synth (each conversation derives from (seed,
conv) alone, so any partitioning yields identical rows) but are a
distinct generator — do not expect fixtures.synth's golden rows here.
Packaged behind the engine-native source interface:

    spark.dataSource.register(SyntheticTranscriptsDataSource)
    df = (spark.read.format("synthetic_transcripts")
          .option("n_convs", 1000).option("turns_per_conv", 5)
          .option("num_partitions", 32).load())

Source-side pruning is EXPLICIT (options ``turn_min`` / ``turn_max`` /
``conv_id``) rather than via ``pushFilters``, deliberately: measured on
Spark 4.1, filter pushdown into a python source mutates the ONE reader
instance the relation owns and the scan is then reused for every later
query on the same DataFrame — an unfiltered ``count()`` after a
filtered query returned the filtered count, with neither
``pushFilters`` nor ``partitions()`` re-invoked to let the source
reset. Until the engine re-plans python-source pushdown per query,
implementing ``pushFilters`` means silent cross-query row loss; the
option form gives the same generation-time pruning with no hidden
state.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

_WORDS = [
    "spark", "query", "join", "filter", "table", "column", "row", "batch",
    "stream", "merge", "sort", "agg", "window", "vector", "data", "value",
]
_EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)


def _conv_rows(conv: int, turns_per_conv: int, seed: int):
    """Deterministic rows for ONE conversation — seeded by (seed, conv)
    alone, so the output is identical under any partitioning."""
    out = []
    for t in range(turns_per_conv):
        h = hashlib.blake2b(
            f"{seed}:{conv}:{t}".encode(), digest_size=8
        ).digest()
        r = int.from_bytes(h, "big")
        n_words = 5 + r % 20
        words = [
            _WORDS[(r >> (i % 48)) % len(_WORDS)] for i in range(n_words)
        ]
        out.append(
            (
                f"conv-{conv:06d}",
                t,
                "user" if t % 2 == 0 else "assistant",
                " ".join(words),
                None,
                _EPOCH + dt.timedelta(seconds=conv * 1000 + t * 7),
            )
        )
    return out


class _ConvRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    """NOTE: no ``pushFilters`` — see the module docstring for the
    measured Spark 4.1 reader-reuse hazard. Generation-time pruning is
    explicit via the ``turn_min``/``turn_max``/``conv_id`` options."""

    def __init__(self, options):
        self.n_convs = int(options.get("n_convs", 100))
        self.turns_per_conv = int(options.get("turns_per_conv", 5))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("num_partitions", 8))
        self.turn_lo = int(options.get("turn_min", 0))
        self.turn_hi = int(options.get("turn_max", self.turns_per_conv - 1))
        self.conv_eq: str | None = options.get("conv_id")

    def partitions(self):
        if self.n_convs <= 0:
            return []  # pyspark substitutes [None]; read() guards it
        n = min(self.num_partitions, max(1, self.n_convs))
        per = -(-self.n_convs // n)
        return [
            _ConvRange(i, min(i + per, self.n_convs))
            for i in range(0, self.n_convs, per)
        ]

    def read(self, partition):
        if partition is None:  # empty source planned zero partitions
            return
        for conv in range(partition.start, partition.end):
            cid = f"conv-{conv:06d}"
            if self.conv_eq is not None and cid != self.conv_eq:
                continue
            for row in _conv_rows(conv, self.turns_per_conv, self.seed):
                if self.turn_lo <= row[1] <= self.turn_hi:
                    yield row


class _StreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: each micro-batch emits the next ``rate``
    conversations; the offset is the conversation counter, so a
    checkpointed restart resumes at the exact conversation the engine
    recorded — no rows re-emitted, none skipped."""

    def __init__(self, options):
        self.turns_per_conv = int(options.get("turns_per_conv", 5))
        self.seed = int(options.get("seed", 42))
        self.rate = int(options.get("convs_per_batch", 10))
        self.max_convs = int(options.get("n_convs", 100))

    def initialOffset(self):
        return {"conv": 0}

    def read(self, start):
        begin = start["conv"]
        end = min(begin + self.rate, self.max_convs)
        rows = []
        for conv in range(begin, end):
            rows.extend(_conv_rows(conv, self.turns_per_conv, self.seed))
        return (iter(rows), {"conv": end})

    def readBetweenOffsets(self, start, end):
        rows = []
        for conv in range(start["conv"], end["conv"]):
            rows.extend(_conv_rows(conv, self.turns_per_conv, self.seed))
        return iter(rows)


class SyntheticTranscriptsDataSource(DataSource):
    """``format("synthetic_transcripts")`` — batch + streaming."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_transcripts"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> _Reader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema: StructType) -> _StreamReader:
        return _StreamReader(self.options)
