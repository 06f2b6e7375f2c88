"""Robust / order-statistic aggregation shapes.

Three operators that show up in every data-quality pipeline and whose
*plan shape* is the point:

* ``q_agg_argmax`` — "value of the row that maximizes X" without a
  window: ``max(struct(ordering..., payload...))`` is partial-
  aggregatable (each map task keeps one struct, the reduce merges),
  so there is no sort and the exchange carries one row per group per
  partition. The window formulation (ROW_NUMBER rn=1) shuffles every
  row; this one shuffles one row per (group × partition). Ties are
  impossible by construction: the ordering struct ends in a unique
  key, which also makes the result deterministic — the property
  ``max_by``/``arg_max`` alone do not give you.
* ``q_winsorize`` — two-pass outlier clipping: pass 1 computes
  per-group p05/p95 (group-count-sized result), pass 2 broadcasts the
  bounds back and aggregates the clipped column. The standard
  "aggregate → broadcast → re-aggregate" decomposition for any
  statistic that needs a corpus constant (same skeleton as
  q_agg_histogram's bounds and q_tfidf_topk's IDF).
* ``q_sample_per_group`` — deterministic K-per-group sample ranked by
  a content hash (md5): reproducible across runs, engines and retries
  — unlike ``TABLESAMPLE``/``rand()`` — which is what makes sampled
  QA checks on a 100 TB table re-runnable and diffable. Hash ranking
  costs one window over each group; for huge groups swap in the
  rank-pushdown (WindowGroupLimit prunes per-partition) that
  q_topk_per_group's plan guardrail pins.

Numeric policy per helpers.py: clip bounds are interpolated
percentiles rounded to 4 dp; the clipped sum runs in decimal so the
result is partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return-flag: the order/line that carries the maximum
    extended price (and the price itself), via max(struct) — no window,
    no sort, fully partial-aggregatable."""
    li = load_table(spark, sf_dir, "lineitem")
    top = F.max(
        F.struct(
            F.col("l_extendedprice").alias("p"),
            F.col("l_orderkey").alias("k"),
            F.col("l_linenumber").alias("n"),
        )
    ).alias("top")
    return (
        li.groupBy("l_returnflag")
        .agg(top)
        .select(
            "l_returnflag",
            F.col("top.p").alias("max_price"),
            F.col("top.k").alias("max_orderkey"),
            F.col("top.n").alias("max_linenumber"),
        )
    )


# Oracle states the same deterministic semantics as the lexicographic
# struct max: price desc, then orderkey desc, then linenumber desc.
ORACLE_AGG_ARGMAX = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC
         ) AS rn
  FROM lineitem
)
SELECT l_returnflag, l_extendedprice AS max_price,
       l_orderkey AS max_orderkey, l_linenumber AS max_linenumber
FROM ranked WHERE rn = 1
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group price stats: clip l_extendedprice to the
    group's [p05, p95], then count clipped rows and sum the clipped
    column (decimal-exact). Bounds are a 3-row aggregate broadcast back
    onto the fact scan — the fact side shuffles once (for its own
    aggregation), never for the bounds."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.05)"), 4).alias("lo"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("hi"),
    )
    clipped = li.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        "lo",
        "hi",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
        .cast("decimal(21,6)")
        .alias("w_price"),
        (
            (F.col("l_extendedprice") < F.col("lo"))
            | (F.col("l_extendedprice") > F.col("hi"))
        )
        .cast("int")
        .alias("is_clipped"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_clipped").alias("n_clipped"),
        F.round(F.sum("w_price"), 2).cast("double").alias("winsorized_sum"),
    )


ORACLE_WINSORIZE = """
WITH bounds AS (
  SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.05), 4) AS lo,
         round(quantile_cont(l_extendedprice, 0.95), 4) AS hi
  FROM lineitem GROUP BY l_returnflag
), clipped AS (
  SELECT li.l_returnflag,
         cast(least(greatest(l_extendedprice, lo), hi) AS decimal(21,6))
           AS w_price,
         cast(l_extendedprice < lo OR l_extendedprice > hi AS int)
           AS is_clipped
  FROM lineitem li JOIN bounds b ON li.l_returnflag = b.l_returnflag
)
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(is_clipped) AS BIGINT) AS n_clipped,
       cast(round(sum(w_price), 2) AS double) AS winsorized_sum
FROM clipped GROUP BY l_returnflag
"""


def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (Greenwald-Khanna via
    ``percentile_approx``) next to the exact interpolated values. The
    exact path (q_agg_percentile) materializes and sorts each group; the
    sketch carries a bounded ~accuracy-sized state through partial
    aggregation — at 100 TB the sketch is the only viable plan, and
    unlike the exact percentile it is re-aggregatable across partitions,
    days, and tables. Estimates are engine-specific → rows-only check;
    tests assert the rank-error contract against the exact values."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("approx_p95"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("exact_p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("exact_p95"),
    )


def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3-per-group sample: rank rows inside each group by
    the md5 of their content and keep the first three. Same rows on
    every run, every engine, every retry — the reproducibility contract
    a sampled data-quality audit needs. The hash covers every output
    column (the synthetic lineitem has duplicate (orderkey, linenumber)
    pairs), so hash ties can only occur between rows identical in all
    output columns — interchangeable by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws(
            "|", F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_quantity").cast("string"),
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy(h.asc())
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "rk",
        )
    )


ORACLE_SAMPLE_PER_GROUP = """
WITH ranked AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY md5(cast(l_orderkey AS varchar) || '|'
                        || cast(l_linenumber AS varchar) || '|'
                        || cast(l_quantity AS varchar))
         ) AS rk
  FROM lineitem
)
SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity, rk
FROM ranked WHERE rk <= 3
"""


def q_agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per return flag from
    EXACT integer power sums — the third/fourth-moment extension of
    q_agg_stddev's policy.

    l_quantity is an exact 2-dp value, so ``qi = int(q*100)`` is lossless
    and skewness/kurtosis are scale-invariant (x → 100x changes
    neither), letting all four power sums accumulate in integer space:
    Σqi fits bigint at any realistic cardinality; Σqi²..Σqi⁴ accumulate
    as decimal(38,0) (per-row qi⁴ ≤ 6.25e14 fits bigint, but bigint
    SUMs of the higher powers overflow — silently, in non-ANSI mode —
    past ~10⁸ rows; the decimal accumulator is exact to 1e38, i.e.
    ~1e23 rows). Finalization is a handful of double ops
    on one row per group, mirrored operation-for-operation in the
    oracle; the only non-basic op is sqrt (IEEE correctly-rounded, so
    still bit-identical — no libm pow).

    Scale: a single map-side-combinable hash aggregate; the exchange
    carries 4 numbers per (group × partition). Compare Spark's builtin
    ``skewness``/``kurtosis``, which accumulate central moments in
    double and drift with partition count."""
    li = load_table(spark, sf_dir, "lineitem")
    qi = (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("bigint")
    agg = (
        li.select(F.col("l_returnflag"), qi.alias("qi"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qi").alias("s1"),
            F.sum((F.col("qi") * F.col("qi")).cast("decimal(38,0)")).alias("s2"),
            F.sum(
                (F.col("qi") * F.col("qi") * F.col("qi")).cast("decimal(38,0)")
            ).alias("s3"),
            F.sum(
                (F.col("qi") * F.col("qi") * F.col("qi") * F.col("qi")).cast(
                    "decimal(38,0)"
                )
            ).alias("s4"),
        )
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s3 = F.col("s3").cast("double")
    s4 = F.col("s4").cast("double")
    m1 = s1 / n
    m2 = s2 / n - m1 * m1
    m3 = s3 / n - F.lit(3.0) * m1 * (s2 / n) + F.lit(2.0) * m1 * m1 * m1
    m4 = (
        s4 / n
        - F.lit(4.0) * m1 * (s3 / n)
        + F.lit(6.0) * (m1 * m1) * (s2 / n)
        - F.lit(3.0) * (m1 * m1) * (m1 * m1)
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skew_pop"),
        F.round(m4 / (m2 * m2) - F.lit(3.0), 6).alias("kurt_excess"),
    ).orderBy("l_returnflag")


ORACLE_AGG_SKEW_KURT = """
WITH q AS (
  SELECT l_returnflag,
         cast(cast(l_quantity AS decimal(12,2)) * 100 AS bigint) AS qi
  FROM lineitem
), sums AS (
  SELECT l_returnflag, count(*) AS n,
         sum(qi) AS s1,
         sum(cast(qi * qi AS decimal(38,0))) AS s2,
         sum(cast(qi * qi * qi AS decimal(38,0))) AS s3,
         sum(cast(qi * qi * qi * qi AS decimal(38,0))) AS s4
  FROM q GROUP BY l_returnflag
), fin AS (
  SELECT l_returnflag, n,
         cast(n AS double) AS nd, cast(s1 AS double) AS d1,
         cast(s2 AS double) AS d2, cast(s3 AS double) AS d3,
         cast(s4 AS double) AS d4
  FROM sums
), mom AS (
  SELECT l_returnflag, n,
         d1 / nd AS m1,
         d2 / nd - (d1 / nd) * (d1 / nd) AS m2,
         d3 / nd - 3.0 * (d1 / nd) * (d2 / nd)
           + 2.0 * (d1 / nd) * (d1 / nd) * (d1 / nd) AS m3,
         d4 / nd - 4.0 * (d1 / nd) * (d3 / nd)
           + 6.0 * ((d1 / nd) * (d1 / nd)) * (d2 / nd)
           - 3.0 * ((d1 / nd) * (d1 / nd)) * ((d1 / nd) * (d1 / nd)) AS m4
  FROM fin
)
SELECT l_returnflag, n,
       round(m3 / (m2 * sqrt(m2)), 6) AS skew_pop,
       round(m4 / (m2 * m2) - 3.0, 6) AS kurt_excess
FROM mom ORDER BY l_returnflag
"""


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (minimize o_totalprice, maximize o_orderdate) — "no strictly better
    trade-off exists" (dominance: other price ≤ AND date ≥, strict in
    at least one). The multi-objective shortlist query every
    procurement/pricing pipeline runs.

    Plan shape — the point of the operator: dominance needs NO pairwise
    join AND no single-partition sort. Collapse to the price grain (max
    date per price), then compute the running max of dates over
    ascending prices as a DISTRIBUTED prefix scan: range-partition the
    price grain, run the running-max window per partition in parallel,
    collect only the ≤N per-partition maxima, prefix-max them on the
    driver, and broadcast the per-partition offsets back (the textbook
    two-phase scan — the same shape a cumulative sum takes at scale,
    where a naive ``Window.orderBy`` would move every row to ONE
    partition). Re-join on price: an order is dominated iff the best
    date at a strictly lower price ≥ its date, or a same-price row has
    a strictly later date. The driver sees N_PART values, never data;
    the oracle pins equivalence with the quadratic NOT EXISTS
    definition."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    per_price = orders.groupBy("o_totalprice").agg(
        F.max("o_orderdate").alias("best_at_price")
    )
    # the scale dial: one range partition per ~4 cores keeps each local
    # window a real slab of work while the driver prefix-max stays ≤N_PART
    # values (32 cores → 8, a 1000-executor cluster → thousands — still
    # metadata-sized on the driver)
    n_part = max(2, spark.sparkContext.defaultParallelism // 4)
    ranged = per_price.repartitionByRange(n_part, "o_totalprice").withColumn(
        "pid", F.spark_partition_id()
    ).persist()
    w = (
        Window.partitionBy("pid")
        .orderBy("o_totalprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("local_prev", F.max("best_at_price").over(w))
    pid_max = sorted(
        (r["pid"], r["m"])
        for r in ranged.groupBy("pid")
        .agg(F.max("best_at_price").alias("m"))
        .collect()
    )
    prefix_rows, run = [], None
    for pid, m in pid_max:
        prefix_rows.append((pid, run))
        run = m if run is None or m > run else run
    prefix = spark.createDataFrame(
        prefix_rows, "pid int, prefix timestamp"
    )
    # ranged stays persisted: the pid assignment must be the SAME rows
    # the driver prefix was computed from (range boundaries come from a
    # sampling pass; the cache pins them)
    grid = local.join(F.broadcast(prefix), "pid").withColumn(
        "best_below", F.greatest("local_prev", "prefix")
    )
    joined = orders.join(grid, "o_totalprice")
    dominated = (
        F.col("best_below").isNotNull()
        & (F.col("best_below") >= F.col("o_orderdate"))
    ) | (F.col("best_at_price") > F.col("o_orderdate"))
    return joined.filter(~dominated).select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "o_orderdate"
        ),
    )


ORACLE_SKYLINE = """
SELECT o.o_orderkey, o.o_totalprice,
       strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders x
  WHERE x.o_totalprice <= o.o_totalprice
    AND x.o_orderdate >= o.o_orderdate
    AND (x.o_totalprice < o.o_totalprice
         OR x.o_orderdate > o.o_orderdate)
)
"""


def q_agg_histogram_eqdepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: exact quartile cutoffs
    (the optimizer-statistics histogram shape — equal row mass per
    bucket, unlike q_agg_histogram's equal-width buckets), then one
    partial-aggregatable count/min/max pass per bucket.

    Plan shape: the cutoffs are a 1-row exact-percentile aggregate
    broadcast back onto the fact scan (same device as q_winsorize);
    the bucket assignment is a codegen CASE, and the final aggregate
    has 4 groups — the fact table shuffles once, 4-row exchange. The
    exact ``percentile`` buffer grows with distinct values; the 100 TB
    swap is ``approx_percentile`` cutoffs (same plan otherwise).
    Cutoffs are rounded to 4 dp in both engines (the tested
    percentile ≡ quantile_cont equivalence), so bucket membership
    compares against identical doubles."""
    orders = load_table(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("q1"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("q2"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("q3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") < F.col("q1"), 0)
        .when(F.col("o_totalprice") < F.col("q2"), 1)
        .when(F.col("o_totalprice") < F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        orders.join(F.broadcast(cuts))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").alias("min_v"),
            F.max("o_totalprice").alias("max_v"),
        )
    )


ORACLE_AGG_HISTOGRAM_EQDEPTH = """
WITH cuts AS (
  SELECT round(quantile_cont(o_totalprice, 0.25), 4) AS q1,
         round(quantile_cont(o_totalprice, 0.5), 4) AS q2,
         round(quantile_cont(o_totalprice, 0.75), 4) AS q3
  FROM orders
)
SELECT CASE WHEN o_totalprice < q1 THEN 0
            WHEN o_totalprice < q2 THEN 1
            WHEN o_totalprice < q3 THEN 2
            ELSE 3 END AS bucket,
       count(*) AS n_rows,
       min(o_totalprice) AS min_v,
       max(o_totalprice) AS max_v
FROM orders CROSS JOIN cuts
GROUP BY 1
"""


QUERIES = {
    "q_skyline": q_skyline,
    "q_agg_histogram_eqdepth": q_agg_histogram_eqdepth,
    "q_agg_argmax": q_agg_argmax,
    "q_winsorize": q_winsorize,
    "q_sample_per_group": q_sample_per_group,
    "q_agg_approx_percentile": q_agg_approx_percentile,
    "q_agg_skew_kurt": q_agg_skew_kurt,
}

ORACLES = {
    "q_skyline": ORACLE_SKYLINE,
    "q_agg_histogram_eqdepth": ORACLE_AGG_HISTOGRAM_EQDEPTH,
    "q_agg_argmax": ORACLE_AGG_ARGMAX,
    "q_winsorize": ORACLE_WINSORIZE,
    "q_sample_per_group": ORACLE_SAMPLE_PER_GROUP,
    "q_agg_skew_kurt": ORACLE_AGG_SKEW_KURT,
}
