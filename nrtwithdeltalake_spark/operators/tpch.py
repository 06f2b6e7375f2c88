"""TPC-H-shaped multi-join/aggregate queries (beyond Q3/Q5 in
relational_ext): the standard OLAP shapes a user of the reference's
silver tables would run downstream of the pipeline (the reference itself
stops at MERGE; SURVEY.md §2.2 joins/aggregations rows).

Adapted to the driver's synthetic schema (TESTDATA.md): lineitem lacks
shipmode/commitdate/receiptdate, so Q4/Q12's lateness predicate becomes
``l_shipdate > o_orderdate`` (same EXISTS / conditional-agg shape).

Scale notes per query are in the docstrings; shared rule: dimension
tables (part, customer, nation) broadcast; the lineitem⋈orders shuffle
is the only big exchange, and each query pre-reduces lineitem to the
join grain first where the aggregate allows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import (
    SQL_DISC_PRICE,
    disc_price,
    money_sum,
    sql_money_sum,
)


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority count over orders with at least one late
    line (EXISTS → left-semi join). The semi-join shuffles only
    (orderkey) pairs; the priority aggregate reduces to 5 rows
    map-side."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returned-item revenue per customer, top 20. lineitem is
    pre-filtered to 'R' rows and pre-aggregated to order grain before
    touching orders, so the big join carries one row per returned order;
    customer/nation broadcast. Top-20 runs as TakeOrderedAndProject —
    no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_order = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.sum(disc_price()).alias("ord_rev"))
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(money_sum(F.col("ord_rev"), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_TPCH_Q10 = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       {sql_money_sum(SQL_DISC_PRICE, 'revenue')}
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one shipdate year. part broadcasts
    (it's a dimension); both sums are decimal partials inside one
    aggregate, and the final ratio is a single-row divide. Conditional
    aggregation (CASE inside SUM) is the shape — no second scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("timestamp_ntz'1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("timestamp_ntz'1997-01-01 00:00:00'"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(
        F.lit(0).cast("decimal(20,6)")
    )
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(disc_price()).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


ORACLE_TPCH_Q14 = f"""
SELECT round(100.0 * cast(sum(CASE WHEN p_type = 'PROMO'
                                   THEN {SQL_DISC_PRICE}
                                   ELSE cast(0 as decimal(20,6)) END) as double)
             / cast(sum({SQL_DISC_PRICE}) as double), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: large-volume orders (per-order quantity sum over threshold),
    joined back to customer. The HAVING runs on the pre-aggregated
    order grain — the filter discards ~all orders before any join, so
    the joins are near-free at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(12,2)")), 2)
             .cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 140)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate"),
            "o_totalprice",
            "total_qty",
        )
    )


ORACLE_TPCH_Q18 = """
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
       o_totalprice, total_qty
FROM (
  SELECT l_orderkey,
         cast(round(sum(cast(l_quantity as decimal(12,2))), 2) as double)
             AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING total_qty > 140
) big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES = {
    "q_tpch_q4": q_tpch_q4,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q18": q_tpch_q18,
}

ORACLES = {
    "q_tpch_q4": ORACLE_TPCH_Q4,
    "q_tpch_q10": ORACLE_TPCH_Q10,
    "q_tpch_q14": ORACLE_TPCH_Q14,
    "q_tpch_q18": ORACLE_TPCH_Q18,
}
