"""Custom stateful streaming operator: cross-batch sessionization with
applyInPandasWithState.

The batch twin (queries.user_sessions) computes 30-minute-gap sessions
with a window lag; this operator maintains the equivalent computation
incrementally over an unbounded stream: per-user state carries
(last_event_us, n_events, n_sessions) across micro-batches, and each
batch emits the user's updated running totals.

This is the pattern for any reference-style per-record stateful
middleware at streaming scale: state is keyed and partitioned by the
group column (one shuffle), lives in the state store (RocksDB-backed on
a real cluster), and the per-group logic runs on Arrow-batched pandas
frames, never row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, n_sessions long"
STATE_SCHEMA = "last_us long, n_events long, n_sessions long"

GAP_US = 30 * 60 * 1_000_000


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_us, n_events, n_sessions = state.get if state.exists else (None, 0, 0)
    rows = pd.concat(list(pdfs)).sort_values("ts_us")
    for ts in rows["ts_us"]:
        ts = int(ts)
        if last_us is None or ts - last_us > GAP_US:
            n_sessions += 1
        last_us = ts
        n_events += 1
    state.update((last_us, n_events, n_sessions))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n_events], "n_sessions": [n_sessions]})


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """events stream (with ts timestamp) -> per-user running session
    totals, emitted each micro-batch (update mode)."""
    from pyspark.sql import functions as F

    with_us = events.select("user_id", F.unix_micros("ts").alias("ts_us"))
    return with_us.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
