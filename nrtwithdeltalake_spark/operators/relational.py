"""Relational operator inventory (SURVEY.md §2.2), DataFrame-first.

Each query generalizes an operator the reference exercises (cited per
function); all are declarative DataFrame plans so Catalyst gets pushdown,
pruning, join-strategy choice and AQE for free — the reference instead
string-built SQL and shipped it to SQL Server over a single-partition JDBC
cursor (``/root/reference/COPY_MSQL_TO_SILVER.py:86-89``).

Scale posture: joins against bounded dimensions use ``F.broadcast``; big
fact-fact joins are hash-shuffles on the join key that AQE re-plans at
runtime; window queries partition by high-cardinality keys (custkey), so
state per partition stays small at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import (
    SQL_DISC_PRICE,
    SQL_CHARGE,
    avg_double,
    charge,
    disc_price,
    dprice,
    dqty,
    drate,
    money_sum,
    sql_avg_double,
    sql_money_sum,
)

# --------------------------------------------------------------------------
# scans / projection / filter  (O1, O7, O8, O14)
# --------------------------------------------------------------------------


def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan + projection; Catalyst prunes the parquet read to the
    4 referenced columns (reference reads SELECT * over JDBC,
    COPY_MSQL_TO_SILVER.py:160)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


ORACLE_SCAN_PROJECT = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
"""


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + computed projection; the ship-date predicate is the
    reference's incremental watermark filter generalized
    (COPY_MSQL_TO_SILVER.py:131,176); IS NOT NULL is O14 (:245).
    Predicates push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("timestamp_ntz'1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("timestamp_ntz'1997-01-01 00:00:00'"))
            & (F.col("l_discount") > 0.05)
            & F.col("l_returnflag").isNotNull()
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(disc_price(), 2).cast("double").alias("net_price"),
        )
    )


ORACLE_FILTER_PROJECT = f"""
SELECT l_orderkey, l_linenumber,
       cast(round({SQL_DISC_PRICE},2) as double) AS net_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount > 0.05
  AND l_returnflag IS NOT NULL
"""


# --------------------------------------------------------------------------
# joins  (O10, O11, O18 + semi/anti ≡ MERGE matched/not-matched O6)
# --------------------------------------------------------------------------


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (O18, COPY_MSQL_TO_SILVER.py:242-244). orders is the
    big side; customer joins by key — shuffle-hash/broadcast picked by AQE."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


ORACLE_JOIN_INNER = """
SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join to a derived aggregate + COALESCE defaults — the
    reference's entities ⟕ latest-watermark shape (O11/O16,
    COPY_MSQL_TO_SILVER.py:231-248). Aggregate-before-join keeps the
    shuffled build side small at scale."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dprice("o_totalprice")).alias("tot"),
        )
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("cnt", F.lit(0)).alias("n_urgent"),
        F.coalesce(F.round("tot", 2).cast("double"), F.lit(0.0)).alias("urgent_total"),
    )


ORACLE_JOIN_LEFT = """
SELECT c_custkey,
       coalesce(cnt, 0) AS n_urgent,
       coalesce(cast(round(tot,2) as double), 0.0) AS urgent_total
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt,
         sum(cast(o_totalprice as decimal(15,2))) AS tot
  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
) u ON c_custkey = u.o_custkey
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi ≡ EXISTS ≡ the MERGE matched branch (O6,
    COPY_MSQL_TO_SILVER.py:207-209). Semi-join only shuffles keys."""
    cust = load_table(spark, sf_dir, "customer")
    finished = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return cust.join(
        finished, cust.c_custkey == finished.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


ORACLE_JOIN_SEMI = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti ≡ NOT EXISTS ≡ the MERGE not-matched branch (O6)."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


ORACLE_JOIN_ANTI = """
SELECT c_custkey, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: lineitems shipped within 90 days of their order
    date — generalizes the reference's theta watermark predicate
    (O8, COPY_MSQL_TO_SILVER.py:131). The equi key keeps it a hash join;
    the range predicate is a post-join filter, so no O(n²) blowup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return j.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines_90d"),
        money_sum(disc_price(), "rev_90d"),
    )


ORACLE_JOIN_RANGE = f"""
SELECT o_orderkey, count(*) AS n_lines_90d,
       {sql_money_sum(SQL_DISC_PRICE, 'rev_90d')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderkey
"""


# --------------------------------------------------------------------------
# aggregation  (O9 + grouped/distinct/rollup/cube per §2.2)
# --------------------------------------------------------------------------


def q_agg_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global scalar aggregate — generalizes the watermark MAX (O9,
    COPY_MSQL_TO_SILVER.py:131), including its string-formatted output."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(dqty("l_quantity"), "sum_qty"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("max_ship"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("min_ship"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


ORACLE_AGG_SCALAR = f"""
SELECT count(*) AS n_rows,
       {sql_money_sum("cast(l_quantity as decimal(12,2))", 'sum_qty')},
       strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship,
       strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
       count(DISTINCT l_partkey) AS n_parts
FROM lineitem
"""


def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation: partial (map-side) aggregation
    then a tiny shuffle — the canonical scale-out agg plan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.expr("timestamp_ntz'2001-09-02 00:00:00'")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(dqty("l_quantity"), "sum_qty"),
        money_sum(dprice("l_extendedprice"), "sum_base_price"),
        money_sum(disc_price(), "sum_disc_price"),
        money_sum(charge(), "sum_charge"),
        avg_double(dqty("l_quantity"), "avg_qty"),
        avg_double(dprice("l_extendedprice"), "avg_price"),
        avg_double(drate("l_discount"), "avg_disc", 6),
        F.count(F.lit(1)).alias("count_order"),
    )


ORACLE_AGG_GROUP = f"""
SELECT l_returnflag, l_linestatus,
       {sql_money_sum("cast(l_quantity as decimal(12,2))", 'sum_qty')},
       {sql_money_sum("cast(l_extendedprice as decimal(15,2))", 'sum_base_price')},
       {sql_money_sum(SQL_DISC_PRICE, 'sum_disc_price')},
       {sql_money_sum(SQL_CHARGE, 'sum_charge')},
       {sql_avg_double("cast(l_quantity as decimal(12,2))", 'avg_qty')},
       {sql_avg_double("cast(l_extendedprice as decimal(15,2))", 'avg_price')},
       {sql_avg_double("cast(l_discount as decimal(5,4))", 'avg_disc', 6)},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped distinct aggregation (expand + two-phase agg under the hood)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_cust"),
        money_sum(dprice("o_totalprice"), "total"),
    )


ORACLE_AGG_DISTINCT = f"""
SELECT o_orderpriority, count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_cust,
       {sql_money_sum("cast(o_totalprice as decimal(15,2))", 'total')}
FROM orders GROUP BY o_orderpriority
"""


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping markers (declared for §2.2 completeness;
    Spark expands to a union of grouping sets in one shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(dprice("o_totalprice"), "total"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
        )
        .select("o_orderstatus", "o_orderpriority", "n", "total", "gid")
    )


ORACLE_AGG_ROLLUP = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       {sql_money_sum("cast(o_totalprice as decimal(15,2))", 'total')},
       cast(grouping(o_orderstatus)*2 + grouping(o_orderpriority) as bigint) AS gid
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(dqty("l_quantity"), "sum_qty"),
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("long").alias("gid"),
        )
        .select("l_returnflag", "l_linestatus", "n", "sum_qty", "gid")
    )


ORACLE_AGG_CUBE = f"""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       {sql_money_sum("cast(l_quantity as decimal(12,2))", 'sum_qty')},
       cast(grouping(l_returnflag)*2 + grouping(l_linestatus) as bigint) AS gid
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# window functions  (O12, O13) + running frames
# --------------------------------------------------------------------------

def _w_latest():
    # built lazily: window specs need an active session
    return Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )


def q_window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW_NUMBER latest-first per key — the reference's watermark-resolution
    idiom verbatim (O12, COPY_MSQL_TO_SILVER.py:241)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(_w_latest()).cast("long").alias("rn"),
    )


ORACLE_WINDOW_ROWNUM = """
SELECT o_orderkey, o_custkey,
       cast(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) as bigint) AS rn
FROM orders
"""


def q_window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group: RN = 1 (O13, COPY_MSQL_TO_SILVER.py:248) — latest
    order per customer, formatted like the reference's watermark strings."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("rn", F.row_number().over(_w_latest()))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("latest_odate"),
        )
    )


ORACLE_WINDOW_LATEST = """
SELECT o_custkey, o_orderkey AS latest_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_odate
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      FROM orders) WHERE rn = 1
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key (rows frame); decimal keeps the prefix sums
    exact so they hash-match the oracle at every row."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum(dprice("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("run_total"),
    )


ORACLE_WINDOW_RUNNING = """
SELECT o_orderkey, o_custkey,
       cast(round(sum(cast(o_totalprice as decimal(15,2)))
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2)
            as double) AS run_total
FROM orders
"""


# --------------------------------------------------------------------------
# sort / limit / top-k
# --------------------------------------------------------------------------


def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    + driver merge, no full sort at scale. Unique tiebreak keeps the set
    deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


ORACLE_TOPK = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via the O12/O13 window pattern."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderpriority", "o_orderkey", "o_totalprice", F.col("rn").cast("long").alias("rn")
        )
    )


ORACLE_TOPK_PER_GROUP = """
SELECT o_orderpriority, o_orderkey, o_totalprice, cast(rn as bigint) AS rn
FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey) rn
      FROM orders) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# set operations  (O25)
# --------------------------------------------------------------------------


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with a provenance marker (O25, dbrconfigData.sql:9-23)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("urgent").alias("src")
    )
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_orderkey", F.lit("low").alias("src")
    )
    return a.unionAll(b)


ORACLE_UNION_ALL = """
SELECT o_orderkey, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, 'low' AS src FROM orders WHERE o_orderpriority = '5-LOW'
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers holding both open and finished
    orders."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o.intersect(f)


ORACLE_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): ordering customers with no urgent order."""
    orders = load_table(spark, sf_dir, "orders")
    all_c = orders.select(F.col("o_custkey").alias("custkey"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.subtract(urgent)  # EXCEPT DISTINCT semantics


ORACLE_EXCEPT = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


# --------------------------------------------------------------------------
# the reference's control-plane query, restated (O11-O19)
# --------------------------------------------------------------------------


def q_latest_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's entities ⟕ latest-closed-watermark query
    (COPY_MSQL_TO_SILVER.py:223-249) restated on test tables: customers as
    entities, finished orders as committed loads; COALESCE sentinel default
    '2000-01-01' (O16, :231) and CASE WHEN presence flag (O15)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    closed = (
        orders.filter(F.col("o_orderstatus") == "F")  # ≡ LoadEndDatetime IS NOT NULL
        .withColumn("rn", F.row_number().over(_w_latest()))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderdate")
    )
    j = cust.join(closed, cust.c_custkey == closed.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce(
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
            F.lit("2000-01-01 00:00:00"),
        ).alias("watermark"),
        F.when(F.col("o_orderdate").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("has_wm"),
    )


ORACLE_LATEST_WATERMARK = """
SELECT c_custkey,
       coalesce(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                '2000-01-01 00:00:00') AS watermark,
       cast(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END as bigint) AS has_wm
FROM customer
LEFT JOIN (
  SELECT o_custkey, o_orderdate
  FROM (SELECT o_custkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        FROM orders WHERE o_orderstatus = 'F')
  WHERE rn = 1
) w ON c_custkey = w.o_custkey
"""


# --------------------------------------------------------------------------
# time bucketing + sessionization (batch twins of the streaming surface)
# --------------------------------------------------------------------------


def q_window_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate on events — batch twin of the
    Structured Streaming query (SURVEY.md §2.2 streaming row)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.alias("w_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value").cast("decimal(12,2)"), "sum_value"),
        )
    )


ORACLE_WINDOW_TUMBLING = f"""
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, event_type,
       count(*) AS n,
       {sql_money_sum("cast(value as decimal(12,2))", 'sum_value')}
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: new session when the per-user gap exceeds 30 min
    (lag + cumulative sum — batch twin of session_window)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ntz → ltz → epoch seconds (ntz has no direct long cast); session tz is
    # pinned UTC so this matches DuckDB's epoch()
    epoch = F.col("ts").cast("timestamp").cast("long")
    flagged = ev.select(
        "user_id",
        F.when(
            epoch - F.lag(epoch).over(w) > 1800,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    return flagged.groupBy("user_id").agg(
        (F.sum("new_sess") + 1).cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_SESSIONIZE = """
SELECT user_id, cast(sum(new_sess) + 1 as bigint) AS n_sessions,
       count(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
) GROUP BY user_id
"""


QUERIES = {
    "q_scan_project": q_scan_project,
    "q_filter_project": q_filter_project,
    "q_join_inner": q_join_inner,
    "q_join_left": q_join_left,
    "q_join_semi": q_join_semi,
    "q_join_anti": q_join_anti,
    "q_join_range": q_join_range,
    "q_agg_scalar": q_agg_scalar,
    "q_agg_group": q_agg_group,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_rollup": q_agg_rollup,
    "q_agg_cube": q_agg_cube,
    "q_window_rownum": q_window_rownum,
    "q_window_latest_per_key": q_window_latest_per_key,
    "q_window_running": q_window_running,
    "q_topk": q_topk,
    "q_topk_per_group": q_topk_per_group,
    "q_union_all": q_union_all,
    "q_intersect": q_intersect,
    "q_except": q_except,
    "q_latest_watermark": q_latest_watermark,
    "q_window_tumbling_agg": q_window_tumbling_agg,
    "q_sessionize": q_sessionize,
}

ORACLES = {
    "q_scan_project": ORACLE_SCAN_PROJECT,
    "q_filter_project": ORACLE_FILTER_PROJECT,
    "q_join_inner": ORACLE_JOIN_INNER,
    "q_join_left": ORACLE_JOIN_LEFT,
    "q_join_semi": ORACLE_JOIN_SEMI,
    "q_join_anti": ORACLE_JOIN_ANTI,
    "q_join_range": ORACLE_JOIN_RANGE,
    "q_agg_scalar": ORACLE_AGG_SCALAR,
    "q_agg_group": ORACLE_AGG_GROUP,
    "q_agg_distinct": ORACLE_AGG_DISTINCT,
    "q_agg_rollup": ORACLE_AGG_ROLLUP,
    "q_agg_cube": ORACLE_AGG_CUBE,
    "q_window_rownum": ORACLE_WINDOW_ROWNUM,
    "q_window_latest_per_key": ORACLE_WINDOW_LATEST,
    "q_window_running": ORACLE_WINDOW_RUNNING,
    "q_topk": ORACLE_TOPK,
    "q_topk_per_group": ORACLE_TOPK_PER_GROUP,
    "q_union_all": ORACLE_UNION_ALL,
    "q_intersect": ORACLE_INTERSECT,
    "q_except": ORACLE_EXCEPT,
    "q_latest_watermark": ORACLE_LATEST_WATERMARK,
    "q_window_tumbling_agg": ORACLE_WINDOW_TUMBLING,
    "q_sessionize": ORACLE_SESSIONIZE,
}
