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
requires a ``google.protobuf`` runtime. ``_protobuf_compat.
ensure_protobuf()`` (run by ``session.build_spark``) locates a public
runtime when none is pip-installed; the end-to-end tests
(``tests/test_streaming.py``: running profiles across a checkpointed
restart, and TTL expiry) execute the full worker↔state-server path.
Execution also requires the RocksDB state store — see
``rocksdb_state`` below.
"""

from __future__ import annotations

import contextlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_ROCKSDB_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    # Spark 4.1's checkpoint file-checksum manager deadlocks local-mode
    # RocksDB snapshot uploads (executor tasks park forever in
    # ChecksumCheckpointFileManager.awaitResult inside
    # RocksDBFileManager.saveCheckpointToDfs — observed via jstack);
    # the checksum is an integrity add-on, not a correctness dependency.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
    # per-batch checkpointing ships the RocksDB CHANGELOG, not a full
    # snapshot zip — O(churn) per batch instead of O(state); snapshots
    # still happen in background maintenance. Besides being the right
    # 100 TB posture, locally each snapshot file op goes through
    # Hadoop's ChecksumFs, which forks a shell per rename (observed:
    # minutes-long micro-batches on a 32-core box without this).
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


@contextlib.contextmanager
def rocksdb_state(spark):
    """Run a ``with`` block under the RocksDB state store provider.

    TWS keeps each named state/timer handle in its own column family,
    which Spark's default ``HDFSBackedStateStoreProvider`` does not
    support — starting a TWS query under it fails with
    STATE_STORE_MULTIPLE_COLUMN_FAMILIES. Streaming queries capture SQL
    confs at ``.start()``, so wrapping only the start call is enough;
    the previous confs are restored for later queries (the rest of the
    suite's stateful queries keep the in-memory default)."""
    prev: dict[str, str | None] = {}
    for k, v in _ROCKSDB_CONFS.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


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
    micro-batch.

    timeMode is ``none`` unless TTL is requested: with a time mode, TWS
    answers "should run another batch" affirmatively on every trigger
    (processing-time timers might fire), which turns an
    ``availableNow`` drain into an unbounded micro-batch loop (observed:
    200+ empty epochs for a 1-file source before timeout)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningProfileProcessor(ttl_ms),
        PROFILE_OUT_SCHEMA,
        outputMode="update",
        timeMode="none" if ttl_ms is None else "processingTime",
    )
