"""Arbitrary stateful streaming via Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (which backs
``nrt.stateful_sessions``): typed named state handles (value/list/map),
per-key timers, and state TTL managed by the engine. This module restates
the reference's per-entity running ledger (watermark bookkeeping per
entity, ``/root/reference/COPY_MSQL_TO_SILVER.py:128-152``) as an online
per-key profile — the feature-store shape a training pipeline keeps next
to its corpus: running counts/sums and last-seen per user, updated
incrementally per micro-batch.

Scale posture: state is one fixed-width tuple per active key, stored in
the state store (RocksDB on a real cluster), partitioned by the grouping
key — no global state, no driver involvement. TTL (engine-enforced,
per-entry) bounds the store to recently-active keys, which a 100 TB/day
stream needs; emission is one row per (key, micro-batch) — update-mode
deltas, not a full snapshot.

Runtime dependency: the TWS python worker exchanges state over protobuf
with the JVM state server; executing (not merely planning) a TWS query
requires the ``protobuf`` package. The end-to-end test is gated on it
(``tests/test_streaming.py``); plan construction and output schema are
asserted unconditionally.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

PROFILE_OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
_PROFILE_STATE_SCHEMA = "n long, total double, last_us long"


class RunningProfileProcessor(StatefulProcessor):
    """Per-user running profile: event count, value sum, last-seen.

    Emits the post-update profile for every key that received rows in the
    micro-batch (an update-mode delta stream a ``foreachBatch`` merge can
    upsert into a versioned table, exactly like the NRT silver flow).
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile", _PROFILE_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        n = 0
        total = 0.0
        last_us = 0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            # ns → µs; timestamps arrive as datetime64[ns] in Arrow batches
            last_us = max(last_us, int(pdf["ts"].astype("int64").max()) // 1000)
        prev = self._state.get() if self._state.exists() else None
        if prev is not None:
            n += prev[0]
            total += prev[1]
            last_us = max(last_us, prev[2])
        self._state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "last_seen": [pd.Timestamp(last_us, unit="us")],
            }
        )

    def close(self) -> None:
        pass


def running_profiles(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming per-user running profiles over the ``events`` schema
    (``ts``, ``user_id``, ``value``); one updated row per active key per
    micro-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningProfileProcessor(ttl_ms),
        PROFILE_OUT_SCHEMA,
        outputMode="update",
        timeMode="processingTime",
    )
