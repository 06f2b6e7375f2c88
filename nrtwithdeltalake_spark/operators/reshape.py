"""Reshape & semantics operators: melt/unpivot, null-safe joins, rare-
category collapse, distribution windows, seasonality, and an
order-independent table checksum.

These extend the engine's relational surface with the data-prep shapes a
user of the reference pipeline (silver-table consumers,
``/root/reference/COPY_MSQL_TO_SILVER.py:160-176`` projections) reaches
for next — every one DuckDB-oracled.

Scale posture per operator:

* ``q_melt_profile`` — ``DataFrame.unpivot`` (melt) plans an Expand that
  multiplies the scan K× (K = melted measures) BEFORE the first
  exchange. That is the inherent cost of materializing long form; when
  only per-measure aggregates are needed, the two-level
  (measure, value)-grain design of ``q_profile_columns`` is the
  cheaper path. Here the long form immediately collapses into a
  K-row aggregate, so the Expand feeds a map-side partial agg — no
  K×-sized shuffle ever exists.
* ``q_join_nullsafe`` — null-safe equality (``<=>`` / IS NOT DISTINCT
  FROM) joins AGGREGATED grains (one row per key per side), never raw
  facts: NULL<=>NULL matches cross-multiply, so the only scale-safe
  formulation collapses each side to key grain first. Spark plans a
  regular hash join on the null-safe key (no BNLJ).
* ``q_category_collapse`` — rare-tail binning. Threshold compare is
  exact integer arithmetic (``n*22 >= tot``), so no float boundary
  flake; the total is a 1-row broadcast, not a driver collect and not
  an unpartitioned window.
* ``q_window_cume_dist`` — cume_dist per group; requires the full
  group sorted in one partition (WindowExec), the documented cost of
  any exact distribution statistic. Groups here are bounded (5
  priorities); for unbounded groups the percentile-cutoff broadcast
  of ``q_rfm_segments`` is the scale path.
* ``q_seasonal_dow`` — day-of-week seasonality index. Day-of-week is
  computed timezone-free (days-since-Monday-epoch mod 7) so the
  result is identical under any session timezone (the driver probes
  with America/New_York). Two hash aggregates + a 35-row window.
* ``q_table_checksum`` — order-independent content fingerprint:
  row fp = first 15 hex digits of md5(canonical row string) as a
  60-bit int, table fp = exact decimal SUM of row fps. Commutative ⇒
  partitioning-independent; one map-side-combinable aggregate per
  table — THE cheap way to compare a 100 TB table across engines or
  after a migration (the reference's bronze→silver copies have no
  content validation at all). Doubles are canonicalized to
  decimal(15,2) strings and timestamps to second strings so both
  engines hash identical bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_melt_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt the four lineitem measures to (measure, value) long form,
    then profile each measure: the canonical wide→long reshape."""
    li = load_table(spark, sf_dir, "lineitem")
    narrow = li.select(
        "l_orderkey", *[F.col(c).cast("decimal(15,4)").alias(c) for c in _MEASURES]
    )
    long = narrow.unpivot("l_orderkey", _MEASURES, "measure", "value")
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).cast("double").alias("sum_v"),
        F.min("value").cast("double").alias("min_v"),
        F.max("value").cast("double").alias("max_v"),
    )


ORACLE_MELT_PROFILE = (
    "WITH long AS ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS measure, cast({c} AS decimal(15,4)) AS value FROM lineitem"
        for c in _MEASURES
    )
    + ") SELECT measure, count(*) AS n,"
    "  cast(round(sum(value),4) AS double) AS sum_v,"
    "  cast(min(value) AS double) AS min_v,"
    "  cast(max(value) AS double) AS max_v"
    " FROM long GROUP BY measure"
)


def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join of two aggregated grains: order and customer
    counts bucketed by nullable key (bucket 7 nulled out) — the NULL
    buckets MATCH each other (<=>), unlike a plain equi-join which
    would drop them."""
    ok = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.expr("nullif(o_custkey % 100, 7)").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ck = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.expr("nullif(c_custkey % 100, 7)").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )
    return (
        ok.join(ck, ok["k"].eqNullSafe(ck["ck"]))
        .select("k", "n_orders", "n_custs")
    )


ORACLE_JOIN_NULLSAFE = """
WITH ok AS (
  SELECT nullif(o_custkey % 100, 7) AS k, count(*) AS n_orders
  FROM orders GROUP BY 1
), ck AS (
  SELECT nullif(c_custkey % 100, 7) AS ck, count(*) AS n_custs
  FROM customer GROUP BY 1
)
SELECT ok.k, n_orders, n_custs
FROM ok JOIN ck ON ok.k IS NOT DISTINCT FROM ck.ck
"""


def q_category_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse rare categories into 'OTHER': brands with fewer than
    tot/22 parts merge. Exact integer threshold (n*22 >= tot); the
    grand total rides a 1-row broadcast."""
    b = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = b.agg(F.sum("n").alias("tot"))
    labeled = b.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("n") * 22 >= F.col("tot"), F.col("p_brand"))
        .otherwise(F.lit("OTHER"))
        .alias("brand"),
        "n",
    )
    return labeled.groupBy("brand").agg(
        F.sum("n").alias("n_parts"), F.count(F.lit(1)).alias("n_brands")
    )


ORACLE_CATEGORY_COLLAPSE = """
WITH b AS (
  SELECT p_brand, count(*) AS n FROM part GROUP BY 1
), t AS (SELECT sum(n) AS tot FROM b)
SELECT CASE WHEN n*22 >= tot THEN p_brand ELSE 'OTHER' END AS brand,
       CAST(sum(n) AS BIGINT) AS n_parts, count(*) AS n_brands
FROM b CROSS JOIN t
GROUP BY 1
"""


def q_window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist of order value within each priority class — exact
    empirical CDF position per row (k/n of identical integers on both
    engines, so the double is bit-identical)."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.cume_dist().over(w).alias("cd"),
    )


ORACLE_WINDOW_CUME_DIST = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       cume_dist() OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice) AS cd
FROM orders
"""


def q_seasonal_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality per event type: average value per
    (type, dow) and its index against the type's overall average.
    dow = days since Monday 1970-01-05, mod 7 — timezone-free, so the
    hostile non-UTC driver session changes nothing. Means are exact
    decimal sums finished in double; quantization is the tie-free
    floor(x*1e4+0.5)/1e4 on both engines."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type",
        F.expr("datediff(to_date(ts), date'1970-01-05') % 7").cast("bigint").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("n_vals"),
        F.sum(F.col("value").cast("decimal(15,2)")).alias("sv"),
    )
    w = Window.partitionBy("event_type")
    avg_ = F.col("sv").cast("double") / F.col("n_vals")
    tot_avg = F.sum("sv").over(w).cast("double") / F.sum("n_vals").over(w)
    return g.select(
        "event_type",
        "dow",
        "n",
        (F.floor(avg_ * 1e4 + F.lit(0.5)) / 1e4).alias("dow_avg"),
        (F.floor(avg_ / tot_avg * 1e4 + F.lit(0.5)) / 1e4).alias("seasonal_idx"),
    )


ORACLE_SEASONAL_DOW = """
WITH g AS (
  SELECT event_type,
         datediff('day', DATE '1970-01-05', ts::DATE) % 7 AS dow,
         count(*) AS n, count(value) AS n_vals,
         sum(cast(value AS decimal(15,2))) AS sv
  FROM events GROUP BY 1, 2
)
SELECT event_type, dow, n,
       floor((cast(sv AS double)/n_vals)*1e4 + 0.5)/1e4 AS dow_avg,
       floor(((cast(sv AS double)/n_vals)
              / (cast(sum(sv) OVER (PARTITION BY event_type) AS double)
                 / sum(n_vals) OVER (PARTITION BY event_type)))*1e4 + 0.5)/1e4
         AS seasonal_idx
FROM g
"""


def _row_fp(cols_sql: str) -> F.Column:
    """60-bit row fingerprint: first 15 hex digits of md5 over the
    canonical '|'-joined row string, as exact decimal."""
    return F.expr(
        f"cast(conv(substring(md5(cast(concat_ws('|', {cols_sql}) as binary)),"
        f" 1, 15), 16, 10) as decimal(38,0))"
    )


_CKSUM_LINEITEM = (
    "l_orderkey, l_partkey, l_suppkey, l_linenumber, "
    "cast(l_quantity as decimal(15,2)), cast(l_extendedprice as decimal(15,2)), "
    "cast(l_discount as decimal(15,2)), cast(l_tax as decimal(15,2)), "
    "l_returnflag, l_linestatus, date_format(l_shipdate, 'yyyy-MM-dd HH:mm:ss')"
)
_CKSUM_ORDERS = (
    "o_orderkey, o_custkey, o_orderstatus, "
    "cast(o_totalprice as decimal(15,2)), "
    "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss'), o_orderpriority"
)


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksum of lineitem and orders: a
    commutative SUM of 60-bit per-row md5 fingerprints — identical for
    any row order, partitioning, or engine reading the same content."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("table_name"), _row_fp(_CKSUM_LINEITEM).alias("fp")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("table_name"), _row_fp(_CKSUM_ORDERS).alias("fp")
    )
    return (
        li.unionByName(orders)
        .groupBy("table_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("fp").cast("decimal(38,0)").cast("string").alias("checksum"),
        )
    )


_DUCK_CKSUM_LINEITEM = (
    "l_orderkey, l_partkey, l_suppkey, l_linenumber, "
    "cast(l_quantity as decimal(15,2)), cast(l_extendedprice as decimal(15,2)), "
    "cast(l_discount as decimal(15,2)), cast(l_tax as decimal(15,2)), "
    "l_returnflag, l_linestatus, strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')"
)
_DUCK_CKSUM_ORDERS = (
    "o_orderkey, o_custkey, o_orderstatus, "
    "cast(o_totalprice as decimal(15,2)), "
    "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), o_orderpriority"
)

ORACLE_TABLE_CHECKSUM = f"""
WITH fps AS (
  SELECT 'lineitem' AS table_name,
         ('0x' || substr(md5(concat_ws('|', {_DUCK_CKSUM_LINEITEM})), 1, 15))::BIGINT AS fp
  FROM lineitem
  UNION ALL
  SELECT 'orders',
         ('0x' || substr(md5(concat_ws('|', {_DUCK_CKSUM_ORDERS})), 1, 15))::BIGINT
  FROM orders
)
SELECT table_name, count(*) AS n_rows, cast(sum(fp) AS varchar) AS checksum
FROM fps GROUP BY table_name
"""


QUERIES = {
    "q_melt_profile": q_melt_profile,
    "q_join_nullsafe": q_join_nullsafe,
    "q_category_collapse": q_category_collapse,
    "q_window_cume_dist": q_window_cume_dist,
    "q_seasonal_dow": q_seasonal_dow,
    "q_table_checksum": q_table_checksum,
}

ORACLES = {
    "q_melt_profile": ORACLE_MELT_PROFILE,
    "q_join_nullsafe": ORACLE_JOIN_NULLSAFE,
    "q_category_collapse": ORACLE_CATEGORY_COLLAPSE,
    "q_window_cume_dist": ORACLE_WINDOW_CUME_DIST,
    "q_seasonal_dow": ORACLE_SEASONAL_DOW,
    "q_table_checksum": ORACLE_TABLE_CHECKSUM,
}
