"""Streaming throughput micro-bench: measures sustained rows/sec of the
two structured-streaming hot paths against the rate source.

The reference's design goal is qualitative "near-real-time"
(/root/reference/README.md:4, no published numbers); this tool puts a
measured number behind this engine's streaming surface:

* ``tumbling`` — watermarked tumbling-window count
  (streaming/nrt.py::tumbling_counts shape) — stateful agg, bounded
  state, the aggregation path every silver rollup takes.
* ``sessions`` — ``applyInPandasWithState`` custom sessionization
  (streaming/nrt.py::stateful_sessions) — the Python-state path; Arrow
  batches cross the boundary, so this measures the worst-case
  (non-JVM) streaming operator.

Run: ``python tools/stream_bench.py [seconds_per_case]``. Prints one
JSON line per case with the mean processedRowsPerSecond across
micro-batches after the first (warm-up) batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.session import build_spark
from nrtwithdeltalake_spark.streaming.nrt import stateful_sessions

RATE = int(os.environ.get("STREAM_BENCH_RATE", "500000"))  # rows/sec offered


def _rate_events(spark, n_users: int = 10_000):
    """Rate source shaped like the events table (ts, user_id, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(RATE))
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            F.pmod(F.col("value"), F.lit(n_users)).alias("user_id"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )


def _run(name: str, stream_df, seconds: int, output_mode: str = "update") -> dict:
    q = (
        stream_df.writeStream.format("noop")
        .option("checkpointLocation", f"/tmp/stream_bench_ckpt_{name}_{time.time_ns()}")
        .outputMode(output_mode)
        .start()
    )
    time.sleep(seconds)
    rates = []
    for p in q.recentProgress[1:]:  # drop warm-up batch
        r = p["processedRowsPerSecond"]
        if r:
            rates.append(r)
    try:
        # stopping mid-batch can abort an in-flight state-store commit;
        # the resulting StreamingQueryException is expected teardown noise
        # (rates are already collected), not a measurement failure
        q.stop()
    except Exception:
        pass
    mean = sum(rates) / len(rates) if rates else 0.0
    return {
        "case": name,
        "offered_rows_per_sec": RATE,
        "processed_rows_per_sec": round(mean, 1),
        "batches": len(rates),
    }


def main() -> None:
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = build_spark(app_name="stream_bench")
    spark.sparkContext.setLogLevel("ERROR")

    ev = _rate_events(spark)
    tumbling = (
        ev.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "5 seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    print(json.dumps(_run("tumbling", tumbling, seconds)))

    sessions = stateful_sessions(_rate_events(spark), gap_seconds=5)
    print(json.dumps(_run("sessions", sessions, seconds, output_mode="append")))

    # transformWithStateInPandas path (typed state handles + RocksDB
    # store, executable since round 9): same per-key running-profile
    # shape as a feature store next to an NRT corpus. Measures the
    # protobuf state-server round-trip, the third stateful mechanism
    # after JVM windowed agg and applyInPandasWithState.
    try:
        from nrtwithdeltalake_spark._protobuf_compat import ensure_protobuf
        from nrtwithdeltalake_spark.streaming import tws

        if ensure_protobuf():
            ev3 = _rate_events(spark).select(
                "ts", "user_id", "value",
                F.lit(0).cast("long").alias("event_id"),
                F.lit("e").alias("event_type"),
                F.lit("{}").alias("props"),
            )
            with tws.rocksdb_state(spark):
                print(
                    json.dumps(
                        _run("tws_profiles", tws.running_profiles(ev3), seconds)
                    )
                )
        else:
            print(json.dumps({"case": "tws_profiles", "skipped": "no protobuf"}))
    except Exception as e:  # record, don't mask the two core cases
        print(json.dumps({"case": "tws_profiles", "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
