"""Structured Streaming restatement of the reference's NRT loop.

The reference achieves "near-real-time" by externally re-running a
notebook that polls watermarks and merges deltas
(``/root/reference/COPY_MSQL_TO_SILVER.py:259-260`` — serial, scheduler-
driven). The idiomatic Spark equivalent (SURVEY.md §2.2 streaming row,
§7 step 4):

* a file/CDF source streamed with ``readStream``;
* event-time windows (tumbling / sliding / session) with ``withWatermark``
  bounding state for late data;
* ``foreachBatch`` invoking the same ``VersionedTable.merge`` the batch
  pipeline uses — one merge function serving both entry points, giving
  exactly-once-per-key upserts on top of at-least-once micro-batches
  (merge idempotency by PK, the invariant SURVEY.md §7 hard-part 5
  requires).

State sizing at scale: watermark delay bounds window state; session
windows additionally bound state by gap timeout (hard-part 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pipeline.tables import VersionedTable

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # parquet TIMESTAMP(NANOS) → long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (one file per micro-batch;
    in production: Kafka / CDF tail — same downstream code)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # withWatermark requires TIMESTAMP (ltz), not ntz; the session tz is
    # pinned UTC above so wall-clock values match the batch (ntz) path.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Tumbling 1-hour window counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w").start.alias("w_start"),
            "event_type",
            "n",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Sliding 1-hour window, 15-minute slide."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w").start.alias("w_start"), "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` idle."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w").start.alias("sess_start"),
            F.col("w").end.alias("sess_end"),
            "user_id",
            "n_events",
        )
    )


def run_stream_to_table(
    stream_df: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
    output_mode: str = "update",
) -> None:
    """The NRT sink: every micro-batch MERGEs into a versioned table —
    the reference's loadToSilverZone as a ``foreachBatch`` function.
    Replayed batches (restart from checkpoint) converge by merge
    idempotency."""
    spark = stream_df.sparkSession

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        if VersionedTable.exists(target_path):
            VersionedTable(spark, target_path).merge(batch_df, keys)
        else:
            VersionedTable.create(spark, target_path, batch_df)

    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
