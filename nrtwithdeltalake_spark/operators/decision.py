"""Decision-support statistics: A/B testing, Pareto concentration, RFM
segmentation — the queries an analyst runs on the reference's silver
`orders` data to decide something (north-star additions; the reference
itself computes only MAX watermarks, SURVEY.md §2.1 O9).

All three are deliberately scale-first formulations:

* ``q_ab_test_welch`` — Welch's unequal-variance t between two order
  cohorts in ONE conditional aggregate (no pivot, no join, one row
  out). The moments are exact decimal sums, so the statistic is
  bit-stable under any partitioning; the handful of libm ops run on
  the single result row.
* ``q_pareto_share`` — "how many parts carry 80% of revenue":
  per-part decimal revenue (fact grain collapses at the first
  aggregate), then one ordered window over the PART grain only. The
  80% comparison runs in decimal (×10 vs ×8) — no float cumsum drift.
* ``q_rfm_segments`` — recency/frequency/monetary quintile segments
  WITHOUT a global ntile window: per-customer aggregate → one scalar
  row of 12 exact-percentile cutoffs (rounded 6 dp) broadcast back →
  bucket via strict comparisons → segment counts. At 100 TB a global
  ntile over customers is a single-partition sort; the
  cutoff-broadcast formulation is two hash aggregates and a broadcast
  — the same aggregate→broadcast→re-aggregate skeleton as
  q_winsorize/q_agg_histogram. (Semantics are percentile-bucket, not
  equal-count ntile: ties on a cutoff land in the lower bucket on
  both engines.)

Numeric policy (helpers.py): money in decimal(15,2) end-to-end;
cutoffs/means rounded once where floats enter; oracles mirror the
expression trees 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_A = "1-URGENT"
_B = "5-LOW"


def q_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-test on o_totalprice between 1-URGENT and 5-LOW orders:
    exact decimal moments from one conditional aggregate, statistic
    assembled on the single output row."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(15,2)")
    pricesq = price * price
    isa = F.col("o_orderpriority") == _A
    isb = F.col("o_orderpriority") == _B
    agg = orders.filter(isa | isb).agg(
        F.sum(F.when(isa, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(isb, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(isa, price)).alias("s_a"),
        F.sum(F.when(isb, price)).alias("s_b"),
        F.sum(F.when(isa, pricesq)).alias("ss_a"),
        F.sum(F.when(isb, pricesq)).alias("ss_b"),
    )
    d = agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_a").cast("double").alias("nad"),
        F.col("n_b").cast("double").alias("nbd"),
        F.col("s_a").cast("double").alias("sad"),
        F.col("s_b").cast("double").alias("sbd"),
        F.col("ss_a").cast("double").alias("ssad"),
        F.col("ss_b").cast("double").alias("ssbd"),
    ).select(
        "n_a",
        "n_b",
        (F.col("sad") / F.col("nad")).alias("mean_a"),
        (F.col("sbd") / F.col("nbd")).alias("mean_b"),
        (
            (F.col("ssad") - F.col("sad") * F.col("sad") / F.col("nad"))
            / (F.col("nad") - F.lit(1.0))
            / F.col("nad")
        ).alias("se2_a"),
        (
            (F.col("ssbd") - F.col("sbd") * F.col("sbd") / F.col("nbd"))
            / (F.col("nbd") - F.lit(1.0))
            / F.col("nbd")
        ).alias("se2_b"),
        "nad",
        "nbd",
    )
    return d.select(
        "n_a",
        "n_b",
        F.round("mean_a", 2).alias("mean_a"),
        F.round("mean_b", 2).alias("mean_b"),
        F.round(
            (F.col("mean_a") - F.col("mean_b"))
            / F.sqrt(F.col("se2_a") + F.col("se2_b")),
            6,
        ).alias("t_stat"),
        F.round(
            (
                (F.col("se2_a") + F.col("se2_b"))
                * (F.col("se2_a") + F.col("se2_b"))
            )
            / (
                F.col("se2_a") * F.col("se2_a") / (F.col("nad") - F.lit(1.0))
                + F.col("se2_b") * F.col("se2_b") / (F.col("nbd") - F.lit(1.0))
            ),
            3,
        ).alias("df_welch"),
    )


ORACLE_AB_TEST_WELCH = """
WITH agg AS (
  SELECT
    sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS n_a,
    sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS n_b,
    sum(CASE WHEN o_orderpriority = '1-URGENT'
        THEN cast(o_totalprice AS decimal(15,2)) END) AS s_a,
    sum(CASE WHEN o_orderpriority = '5-LOW'
        THEN cast(o_totalprice AS decimal(15,2)) END) AS s_b,
    sum(CASE WHEN o_orderpriority = '1-URGENT'
        THEN cast(o_totalprice AS decimal(15,2))
             * cast(o_totalprice AS decimal(15,2)) END) AS ss_a,
    sum(CASE WHEN o_orderpriority = '5-LOW'
        THEN cast(o_totalprice AS decimal(15,2))
             * cast(o_totalprice AS decimal(15,2)) END) AS ss_b
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), d AS (
  SELECT cast(n_a AS bigint) AS n_a, cast(n_b AS bigint) AS n_b,
         cast(n_a AS double) AS nad, cast(n_b AS double) AS nbd,
         cast(s_a AS double) AS sad, cast(s_b AS double) AS sbd,
         cast(ss_a AS double) AS ssad, cast(ss_b AS double) AS ssbd
  FROM agg
), e AS (
  SELECT n_a, n_b, nad, nbd,
         sad / nad AS mean_a, sbd / nbd AS mean_b,
         (ssad - sad * sad / nad) / (nad - 1.0) / nad AS se2_a,
         (ssbd - sbd * sbd / nbd) / (nbd - 1.0) / nbd AS se2_b
  FROM d
)
SELECT n_a, n_b,
       round(mean_a, 2) AS mean_a, round(mean_b, 2) AS mean_b,
       round((mean_a - mean_b) / sqrt(se2_a + se2_b), 6) AS t_stat,
       round(((se2_a + se2_b) * (se2_a + se2_b))
             / (se2_a * se2_a / (nad - 1.0)
                + se2_b * se2_b / (nbd - 1.0)), 3) AS df_welch
FROM e
"""


def q_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 question: how many parts carry 80% of discounted
    revenue. Fact grain collapses at the first hash agg; the ordered
    window runs over the part grain only; the threshold comparison is
    exact decimal (cum×10 < total×8)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(15,2)")
        * (F.lit(1).cast("decimal(5,4)") - F.col("l_discount").cast("decimal(5,4)"))
    ).alias("rev")
    per_part = li.groupBy("l_partkey").agg(rev)
    w_cum = (
        Window.orderBy(F.desc("rev"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    ranked = per_part.select(
        "l_partkey",
        "rev",
        F.sum("rev").over(w_cum).alias("cum"),
        F.sum("rev").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_parts_total"),
    )
    return ranked.filter(
        (F.col("cum") - F.col("rev")) * F.lit(10) < F.col("total") * F.lit(8)
    ).agg(
        F.count(F.lit(1)).alias("n_parts_80"),
        F.max("n_parts_total").alias("n_parts_total"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.max("n_parts_total").cast("double"),
            6,
        ).alias("share_of_parts"),
    )


ORACLE_PARETO_SHARE = """
WITH per_part AS (
  SELECT l_partkey,
         sum(cast(l_extendedprice AS decimal(15,2))
             * (cast(1 AS decimal(5,4)) - cast(l_discount AS decimal(5,4))))
           AS rev
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, rev,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(rev) OVER () AS total,
         count(*) OVER () AS n_parts_total
  FROM per_part
)
SELECT count(*) AS n_parts_80,
       max(n_parts_total) AS n_parts_total,
       round(cast(count(*) AS double) / cast(max(n_parts_total) AS double), 6)
         AS share_of_parts
FROM ranked
WHERE (cum - rev) * 10 < total * 8
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segments over customers: per-customer aggregate →
    12 exact-percentile cutoffs in one broadcast scalar row → strict->
    comparison bucketing → segment counts. No global ntile sort."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.max(F.col("o_orderdate").cast("date")),
            F.lit("1992-01-01").cast("date"),
        )
        .cast("double")
        .alias("r"),
        F.count(F.lit(1)).cast("double").alias("f"),
        F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
        .cast("double")
        .alias("m"),
    )
    cuts = per_cust.agg(
        *[
            F.round(F.expr(f"percentile({c}, {q})"), 6).alias(f"{c}{int(q * 100)}")
            for c in ("r", "f", "m")
            for q in (0.2, 0.4, 0.6, 0.8)
        ]
    )
    def bucket(c: str) -> F.Column:
        b = F.lit(1)
        for q in (20, 40, 60, 80):
            b = b + F.when(F.col(c) > F.col(f"{c}{q}"), 1).otherwise(0)
        return b
    seg = per_cust.crossJoin(F.broadcast(cuts)).select(
        F.concat_ws(
            "-",
            bucket("r").cast("string"),
            bucket("f").cast("string"),
            bucket("m").cast("string"),
        ).alias("segment")
    )
    return (
        seg.groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("segment"))
        .limit(15)
    )


ORACLE_RFM_SEGMENTS = """
WITH per_cust AS (
  SELECT o_custkey,
         cast(datediff('day', DATE '1992-01-01',
                       cast(max(o_orderdate) AS date)) AS double) AS r,
         cast(count(*) AS double) AS f,
         cast(sum(cast(o_totalprice AS decimal(15,2))) AS double) AS m
  FROM orders GROUP BY o_custkey
), cuts AS (
  SELECT round(quantile_cont(r, 0.2), 6) AS r20,
         round(quantile_cont(r, 0.4), 6) AS r40,
         round(quantile_cont(r, 0.6), 6) AS r60,
         round(quantile_cont(r, 0.8), 6) AS r80,
         round(quantile_cont(f, 0.2), 6) AS f20,
         round(quantile_cont(f, 0.4), 6) AS f40,
         round(quantile_cont(f, 0.6), 6) AS f60,
         round(quantile_cont(f, 0.8), 6) AS f80,
         round(quantile_cont(m, 0.2), 6) AS m20,
         round(quantile_cont(m, 0.4), 6) AS m40,
         round(quantile_cont(m, 0.6), 6) AS m60,
         round(quantile_cont(m, 0.8), 6) AS m80
  FROM per_cust
), seg AS (
  SELECT concat_ws('-',
           cast(1 + (CASE WHEN r > r20 THEN 1 ELSE 0 END)
                  + (CASE WHEN r > r40 THEN 1 ELSE 0 END)
                  + (CASE WHEN r > r60 THEN 1 ELSE 0 END)
                  + (CASE WHEN r > r80 THEN 1 ELSE 0 END) AS varchar),
           cast(1 + (CASE WHEN f > f20 THEN 1 ELSE 0 END)
                  + (CASE WHEN f > f40 THEN 1 ELSE 0 END)
                  + (CASE WHEN f > f60 THEN 1 ELSE 0 END)
                  + (CASE WHEN f > f80 THEN 1 ELSE 0 END) AS varchar),
           cast(1 + (CASE WHEN m > m20 THEN 1 ELSE 0 END)
                  + (CASE WHEN m > m40 THEN 1 ELSE 0 END)
                  + (CASE WHEN m > m60 THEN 1 ELSE 0 END)
                  + (CASE WHEN m > m80 THEN 1 ELSE 0 END) AS varchar)
         ) AS segment
  FROM per_cust CROSS JOIN cuts
)
SELECT segment, count(*) AS n_customers
FROM seg GROUP BY segment
ORDER BY n_customers DESC, segment ASC
LIMIT 15
"""


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between document language and
    source: contingency cells from ONE hash agg over the fact grain;
    margins and the total are re-aggregations of the tiny cell table
    (never the facts); expected counts and the statistic assemble on
    ≤ |lang|×|source| rows. Per-cell contributions are quantized to
    micro-units and summed as integers, so the statistic is independent
    of cell visit order (the bm25/centroid trick)."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("obs"))
    row_m = cells.groupBy("lang").agg(F.sum("obs").alias("row_n"))
    col_m = cells.groupBy("source").agg(F.sum("obs").alias("col_n"))
    tot = cells.agg(
        F.sum("obs").alias("n"),
        F.countDistinct("lang").alias("n_lang"),
        F.countDistinct("source").alias("n_source"),
    )
    joined = (
        cells.join(F.broadcast(row_m), "lang")
        .join(F.broadcast(col_m), "source")
        .crossJoin(F.broadcast(tot))
    )
    exp = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("n").cast("double")
    )
    contrib = (
        (F.col("obs").cast("double") - exp) * (F.col("obs").cast("double") - exp) / exp
    )
    micro = F.floor(contrib * F.lit(1000000.0)).cast("bigint")
    return joined.select(
        micro.alias("micro"), "n", "n_lang", "n_source"
    ).groupBy("n", "n_lang", "n_source").agg(
        (F.sum("micro").cast("double") / F.lit(1000000.0)).alias("chi2")
    ).select(
        "n",
        "chi2",
        ((F.col("n_lang") - 1) * (F.col("n_source") - 1)).alias("dof"),
    )


ORACLE_CHI2_INDEPENDENCE = """
WITH cells AS (
  SELECT lang, source, count(*) AS obs FROM documents GROUP BY lang, source
), row_m AS (
  SELECT lang, sum(obs) AS row_n FROM cells GROUP BY lang
), col_m AS (
  SELECT source, sum(obs) AS col_n FROM cells GROUP BY source
), tot AS (
  SELECT sum(obs) AS n, count(DISTINCT lang) AS n_lang,
         count(DISTINCT source) AS n_source
  FROM cells
), scored AS (
  SELECT cast(floor(
           (cast(obs AS double)
            - cast(row_n AS double) * cast(col_n AS double) / cast(n AS double))
           * (cast(obs AS double)
              - cast(row_n AS double) * cast(col_n AS double) / cast(n AS double))
           / (cast(row_n AS double) * cast(col_n AS double) / cast(n AS double))
           * 1000000.0) AS bigint) AS micro,
         cast(n AS bigint) AS n,
         n_lang, n_source
  FROM cells
  JOIN row_m USING (lang)
  JOIN col_m USING (source)
  CROSS JOIN tot
)
SELECT n, cast(sum(micro) AS double) / 1000000.0 AS chi2,
       (n_lang - 1) * (n_source - 1) AS dof
FROM scored GROUP BY n, n_lang, n_source
"""



def q_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change per order priority — the
    period-comparison report every analytics stack ships. Week buckets
    are timezone-free (days since Monday 1970-01-05, div 7); revenue is
    an exact decimal sum; the WoW ratio is finished in double and
    quantized tie-free. The lag window runs over the (priority, week)
    AGGREGATE grain — at 100 TB the fact table collapses map-side
    first, the window sees thousands of rows, not billions."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.groupBy(
        "o_orderpriority",
        F.expr(
            "datediff(to_date(o_orderdate), date'1970-01-05') div 7"
        ).cast("bigint").alias("week"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(15,2)")).alias("rev"))
    w = Window.partitionBy("o_orderpriority").orderBy("week")
    prev = F.lag("rev").over(w)
    return g.select(
        "o_orderpriority",
        "week",
        F.round("rev", 2).cast("double").alias("rev"),
        F.round(prev, 2).cast("double").alias("prev_rev"),
        (
            F.floor(
                (
                    (F.col("rev").cast("double") - prev.cast("double"))
                    / prev.cast("double")
                )
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("wow_pct"),
    )


ORACLE_PERIOD_OVER_PERIOD = """
WITH g AS (
  SELECT o_orderpriority,
         datediff('day', DATE '1970-01-05', o_orderdate::DATE) // 7 AS week,
         sum(cast(o_totalprice AS decimal(15,2))) AS rev
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, week,
       cast(round(rev, 2) AS double) AS rev,
       cast(round(lag(rev) OVER w, 2) AS double) AS prev_rev,
       floor(((cast(rev AS double) - cast(lag(rev) OVER w AS double))
              / cast(lag(rev) OVER w AS double)) * 1e4 + 0.5) / 1e4 AS wow_pct
FROM g
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY week)
"""


# Benford expectations are math constants — injected as identical
# literals on both engines so no libm call crosses the oracle boundary.
_BENFORD = {1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181, 6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757}


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic
    data-quality screen (fabricated or truncated monetary data bends
    the leading-digit curve). First digit comes from the decimal(15,2)
    string form (identical text both engines — never float-multiply
    then truncate, which rounds differently across engines); shares are
    integer-ratio doubles; expected shares are injected constants. The
    share window runs over the 9-row digit aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(15,2)").cast("string"), 1, 1
    ).cast("int")
    g = (
        orders.filter(F.col("o_totalprice") >= 1)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()
    expected = F.element_at(
        F.array(*[F.lit(_BENFORD[d]) for d in range(1, 10)]), F.col("digit")
    )
    share = F.col("n").cast("double") / F.sum("n").over(w).cast("double")
    return g.select(
        "digit",
        "n",
        (F.floor(share * 1e6 + F.lit(0.5)) / 1e6).alias("obs_share"),
        expected.alias("exp_share"),
        (F.floor(F.abs(share - expected) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "abs_dev"
        ),
    )


ORACLE_BENFORD_DIGITS = """
WITH g AS (
  SELECT cast(substr(cast(cast(o_totalprice AS decimal(15,2)) AS varchar), 1, 1) AS int) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice >= 1 GROUP BY 1
), e(digit, exp_share) AS (VALUES (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691), (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153), (9, 0.045757))
SELECT g.digit, n,
       floor((cast(n AS double) / cast(sum(n) OVER () AS double)) * 1e6 + 0.5) / 1e6 AS obs_share,
       cast(exp_share AS double) AS exp_share,
       floor(abs(cast(n AS double) / cast(sum(n) OVER () AS double)
                 - cast(exp_share AS double)) * 1e6 + 0.5) / 1e6 AS abs_dev
FROM g JOIN e ON g.digit = e.digit
"""

QUERIES = {
    "q_ab_test_welch": q_ab_test_welch,
    "q_benford_digits": q_benford_digits,
    "q_chi2_independence": q_chi2_independence,
    "q_period_over_period": q_period_over_period,
    "q_pareto_share": q_pareto_share,
    "q_rfm_segments": q_rfm_segments,
}

ORACLES = {
    "q_ab_test_welch": ORACLE_AB_TEST_WELCH,
    "q_benford_digits": ORACLE_BENFORD_DIGITS,
    "q_chi2_independence": ORACLE_CHI2_INDEPENDENCE,
    "q_period_over_period": ORACLE_PERIOD_OVER_PERIOD,
    "q_pareto_share": ORACLE_PARETO_SHARE,
    "q_rfm_segments": ORACLE_RFM_SEGMENTS,
}
