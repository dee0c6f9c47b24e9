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
        # max, not assignment: a late event from an earlier micro-batch
        # must not move the session clock BACKWARDS — a regressed
        # last_us would make the next on-time event look like a new
        # session. (Within one batch the sort_values handles order;
        # across batches only the max is safe.)
        last_us = ts if last_us is None else max(last_us, ts)
        n_events += 1
    state.update((last_us, n_events, n_sessions))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n_events], "n_sessions": [n_sessions]})


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """events stream (with ts timestamp) -> per-user running session
    totals, emitted each micro-batch (update mode)."""
    from meteor_spark.functions import unix_us

    with_us = events.select("user_id", unix_us("ts").alias("ts_us"))
    return with_us.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Second-generation stateful operator: transformWithStateInPandas
# (Spark 4 state-v2 API). Tracks per-user running totals AND the distinct
# event-type set via a MapState — composite state that the older
# applyInPandasWithState would have to pickle into one opaque tuple. At
# scale the distinct-type map lives in the RocksDB state store per key
# with point lookups, never rebuilt per batch.
#
# Runtime requirement: the state-v2 Python client talks protobuf to the
# state server, so executing (not defining/planning) this operator needs
# `google.protobuf` on the Python path and the RocksDB state store
# provider. The equivalence test importorskips accordingly.
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, n_types long"

from pyspark.sql.streaming.stateful_processor import StatefulProcessor  # noqa: E402


class UserActivityProcessor(StatefulProcessor):
    """Per-user cross-batch accumulator: event count, value sum, distinct
    event-type count (MapState used as a persistent set)."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "n_events long, total_value double")
        self._types = handle.getMapState("types", "event_type string", "seen byte")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        (user_id,) = key
        n_events, total_value = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            n_events += len(pdf)
            total_value += float(pdf["value"].sum())
            for t in pdf["event_type"].unique():
                if not self._types.containsKey((t,)):
                    self._types.updateValue((t,), (1,))
        self._totals.update((n_events, total_value))
        n_types = sum(1 for _ in self._types.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_events],
                "total_value": [round(total_value, 2)],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def user_activity_stateful(events: DataFrame) -> DataFrame:
    """events stream -> per-user running (count, value sum, distinct
    event types), emitted per micro-batch (update mode, state-v2)."""
    return events.select("user_id", "event_type", "value").groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
