"""Shared expression helpers for oracle-exact cross-engine queries.

Numeric policy: the driver hash-compares Spark results against a DuckDB
oracle. Double-precision SUMs are order-dependent, so any aggregate over
money/quantity doubles is computed in **decimal** (exact integer arithmetic in
both engines), rounded in decimal space (both engines round half-away-from-
zero — verified), then cast to double (exact: magnitudes < 2^53). Row-level
+,-,*,/ and sqrt on doubles are IEEE-deterministic and need no treatment;
libm functions (ln/exp/pow) are rounded to 6 dp.

Scale note (100 TB): decimal aggregation is marginally slower than double in
Tungsten but stays inside whole-stage codegen; it also eliminates
non-deterministic cents-level drift between runs — a property a production
billing pipeline wants anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def fan_out(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition a narrow scan UP to the cluster's parallelism — but
    only when the scan itself yields fewer tasks than that.

    The test tables are single-row-group parquet files, so their scans
    are one task; per-row-heavy expressions (regex packs, shingle/
    minhash arrays, vector math) would otherwise run on one core. One
    cheap shuffle buys full parallelism. At 100 TB inputs span
    thousands of splits and the scan already out-parallelizes the
    cluster — there the repartition would COALESCE thousands of scan
    tasks down to cluster parallelism and shuffle the full payload, so
    the gate below skips it whenever the planned scan partition count
    (actual splits after maxPartitionBytes/openCost packing, ~4 ms of
    driver-side planning per call) already meets ``defaultParallelism``.
    Never fan out plain scan→agg plans (map-side partial aggregation on
    the scan is strictly better)."""
    target = spark.sparkContext.defaultParallelism
    try:
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception:
        # non-file-backed or otherwise unplannable source: keep the
        # historical unconditional fan-out
        pass
    return df.repartition(target)

# Decimal shapes chosen so products stay exact within precision 38:
# price(15,2) * rate(5,4) -> (20,6); * rate(5,4) again -> (25,10).
DEC_PRICE = "decimal(15,2)"
DEC_QTY = "decimal(12,2)"
DEC_RATE = "decimal(5,4)"

# SQL-side twins (DuckDB) of the decimal casts.
SQL_PRICE = "cast({c} as decimal(15,2))"
SQL_QTY = "cast({c} as decimal(12,2))"
SQL_RATE = "cast({c} as decimal(5,4))"
SQL_ONE = "cast(1 as decimal(5,4))"


def dprice(c: str) -> Column:
    return F.col(c).cast(DEC_PRICE)


def dqty(c: str) -> Column:
    return F.col(c).cast(DEC_QTY)


def drate(c: str) -> Column:
    return F.col(c).cast(DEC_RATE)


def one_rate() -> Column:
    return F.lit(1).cast(DEC_RATE)


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dprice("l_extendedprice") * (one_rate() - drate("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price() * (one_rate() + drate("l_tax"))


SQL_DISC_PRICE = (
    f"{SQL_PRICE.format(c='l_extendedprice')}"
    f"*({SQL_ONE}-{SQL_RATE.format(c='l_discount')})"
)
SQL_CHARGE = f"({SQL_DISC_PRICE})*({SQL_ONE}+{SQL_RATE.format(c='l_tax')})"


def money_sum(col: Column, alias: str, scale: int = 2) -> Column:
    """SUM in decimal, rounded, surfaced as double (bit-identical x-engine)."""
    return F.round(F.sum(col), scale).cast("double").alias(alias)


def sql_money_sum(expr: str, alias: str, scale: int = 2) -> str:
    return f"cast(round(sum({expr}),{scale}) as double) as {alias}"


def avg_double(col: Column, alias: str, scale: int = 4) -> Column:
    """AVG as (exact decimal sum -> double) / count: IEEE-identical x-engine."""
    return F.round(F.sum(col).cast("double") / F.count(F.lit(1)), scale).alias(alias)


def sql_avg_double(expr: str, alias: str, scale: int = 4) -> str:
    return f"round(cast(sum({expr}) as double)/count(*),{scale}) as {alias}"
