"""Parquet source catalog for the driver test tables.

Replaces the reference's JDBC subquery scan (O1,
``/root/reference/COPY_MSQL_TO_SILVER.py:86-89``): instead of shipping SQL
strings to SQL Server over a single-partition JDBC cursor, every table is a
columnar parquet scan that Catalyst can prune/push filters into. At 100 TB
each of these would be a partitioned parquet/lakehouse table; the API here is
path-based so nothing changes but the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (region and
# nation are bounded by geography; supplier scales but stays ~1% of lineitem).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


# Columns the fixture generator has stored as parquet TIMESTAMP(NANOS) in
# some generations (plain TIMESTAMP_NTZ in others). When NANOS, Spark reads
# them as long (spark.sql.legacy.parquet.nanosAsLong=true) and we convert to
# timestamp by integer-dividing to microseconds — the same ns→µs truncation
# DuckDB does, keeping oracle comparisons exact; the LongType check below
# makes the handling a no-op for the plain-timestamp generations.
NANOS_TS_COLUMNS = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning + predicate pushdown are Catalyst's.

    Sets two runtime confs defensively so queries behave identically on a
    caller-provided session (the driver's verify harness builds its own):
    UTC session timezone (ltz→ntz casts and epoch extraction must match the
    tz-naive DuckDB oracle) and nanosAsLong (events.ts is TIMESTAMP(NANOS),
    rejected by the parquet reader otherwise).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in NANOS_TS_COLUMNS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANOS_TS_COLUMNS.get(name, ()):
        field = df.schema[c]
        if isinstance(field.dataType, T.LongType):
            # integer div, not `/`: ns-since-epoch exceeds double precision.
            # Cast to ntz so all engine timestamps match the (naive) DuckDB
            # oracle and the other tables' parquet timestamp_ntz columns.
            df = df.withColumn(
                c,
                F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz"),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
