"""Flagship query: revenue + latest order per market segment.

Exercises the full slice scan → filter → join → agg → window → join →
format in one plan (SURVEY.md §7 step 1), combining the reference's two
signature idioms: the watermark-resolution ROW_NUMBER latest-per-key
(O12-O13, ``/root/reference/COPY_MSQL_TO_SILVER.py:241,248``) and
second-precision string-formatted watermarks (O17, ``:131,237``).

Plan shape at scale: lineitem⋈orders is the one big shuffle;
customer joins via its key; the per-segment aggregate and the
latest-order window both reduce to 5 segments, so the final join is a
broadcast of a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import SQL_DISC_PRICE, disc_price, sql_money_sum


def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    # pre-aggregate lineitem to order grain first: the later segment
    # rollup then needs plain count(*), not countDistinct — dropping the
    # distinct's Expand + (segment, orderkey) shuffle of the full fact
    # table, the part that dominates at scale. Decimal partials stay
    # exact, so the rounded total is bit-identical to single-level
    # aggregation.
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(disc_price()).alias("ord_rev")
    )
    revenue = (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("ord_rev"), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )

    # latest-per-group as max(struct(ts, key)): identical semantics to the
    # ROW_NUMBER rn=1 idiom (ORDER BY date DESC, key DESC — struct compare
    # is lexicographic) but partial-aggregatable map-side, so it never
    # shuffle-sorts the full orders table the way a window would. The
    # window form itself is exercised by q_window_latest_per_key.
    latest = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("m"))
        .select(
            "c_mktsegment",
            F.col("m.o_orderkey").alias("latest_orderkey"),
            F.date_format("m.o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "latest_odate"
            ),
        )
    )
    return revenue.join(latest, "c_mktsegment")


ORACLE_FLAGSHIP = f"""
WITH revenue AS (
  SELECT c_mktsegment,
         {sql_money_sum(SQL_DISC_PRICE, 'revenue')},
         count(DISTINCT o_orderkey) AS n_orders
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
), latest AS (
  SELECT c_mktsegment, o_orderkey AS latest_orderkey,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_odate
  FROM (
    SELECT c_mktsegment, o_orderkey, o_orderdate,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY o_orderdate DESC, o_orderkey DESC) rn
    FROM orders JOIN customer ON o_custkey = c_custkey
  ) WHERE rn = 1
)
SELECT revenue.c_mktsegment, revenue.revenue, revenue.n_orders,
       latest.latest_orderkey, latest.latest_odate
FROM revenue JOIN latest USING (c_mktsegment)
"""

QUERIES = {"q_flagship": q_flagship}
ORACLES = {"q_flagship": ORACLE_FLAGSHIP}
