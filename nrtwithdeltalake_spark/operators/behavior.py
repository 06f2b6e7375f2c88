"""Behavioral/event analytics over the events stream table: funnel
conversion, cohort retention, distribution ranks — the queries a user of
the reference's silver `events` data runs next (SURVEY.md §2.2 window /
streaming rows), plus the salted-join equivalence proof that promotes
``operators.skew`` into the oracle-checked surface.

All timestamps surface second-formatted (the reference's VARCHAR(21)
watermark convention, O17) while comparisons run on raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """click→purchase funnel: per user, first click and first purchase
    within 7 days of it. Two tiny per-user aggregates and one left join
    on user_id — each step is partial-aggregatable; nothing touches the
    raw event grain after the first groupBy. At scale the join keys are
    users (small), not events."""
    ev = load_table(spark, sf_dir, "events")
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        first_click.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("first_click"))
            & (F.col("p_ts") < F.col("first_click") + F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy("user_id", "first_click")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    return conv.select(
        "user_id",
        F.date_format("first_click", "yyyy-MM-dd HH:mm:ss").alias("first_click"),
        F.date_format("first_purchase", "yyyy-MM-dd HH:mm:ss").alias(
            "first_purchase"
        ),
        F.col("first_purchase").isNotNull().cast("long").alias("converted"),
    )


ORACLE_EVENTS_FUNNEL = """
WITH first_click AS (
  SELECT user_id, min(ts) AS first_click
  FROM events WHERE event_type = 'click' GROUP BY user_id
), conv AS (
  SELECT f.user_id, f.first_click, min(p.ts) AS first_purchase
  FROM first_click f
  LEFT JOIN events p
    ON p.user_id = f.user_id AND p.event_type = 'purchase'
   AND p.ts >= f.first_click AND p.ts < f.first_click + INTERVAL 7 DAY
  GROUP BY f.user_id, f.first_click
)
SELECT user_id,
       strftime(first_click, '%Y-%m-%d %H:%M:%S') AS first_click,
       strftime(first_purchase, '%Y-%m-%d %H:%M:%S') AS first_purchase,
       cast(first_purchase IS NOT NULL as bigint) AS converted
FROM conv
"""


def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week; a
    user counts as retained if active in the following week. Two
    aggregates over the user grain — the classic DAU/WAU analysis as a
    fully partial-aggregatable plan (no self-join of raw events: events
    collapse to (user, week) first)."""
    ev = load_table(spark, sf_dir, "events")
    user_weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    first_week = user_weeks.groupBy("user_id").agg(F.min("w").alias("w0"))
    next_week = user_weeks.select(
        F.col("user_id").alias("u2"), F.col("w").alias("w2")
    )
    return (
        first_week.join(
            next_week,
            (F.col("user_id") == F.col("u2"))
            & (F.col("w2") == F.col("w0") + F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy("w0")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("u2").isNotNull().cast("long")).cast("long").alias(
                "n_retained"
            ),
            F.round(
                F.sum(F.col("u2").isNotNull().cast("long")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("retention"),
        )
        .select(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            "n_users",
            "n_retained",
            "retention",
        )
    )


ORACLE_RETENTION_COHORT = """
WITH user_weeks AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
), first_week AS (
  SELECT user_id, min(w) AS w0 FROM user_weeks GROUP BY user_id
)
SELECT strftime(f.w0, '%Y-%m-%d') AS cohort_week,
       count(*) AS n_users,
       cast(sum(CASE WHEN n.user_id IS NOT NULL THEN 1 ELSE 0 END) as bigint)
           AS n_retained,
       round(cast(sum(CASE WHEN n.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  as double) / count(*), 6) AS retention
FROM first_week f
LEFT JOIN user_weeks n
  ON n.user_id = f.user_id AND n.w = f.w0 + INTERVAL 7 DAY
GROUP BY f.w0
"""


def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks (percent_rank, cume_dist) of order totals
    within each status — the quantile-position window family §2.2
    declares alongside ntile."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


ORACLE_WINDOW_PERCENT_RANK = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       round(percent_rank() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice, o_orderkey), 6)
           AS pct_rank,
       round(cume_dist() OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey), 6) AS cume
FROM orders
"""


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join, oracle-proven equivalent to the plain
    equi-join (the salt must be invisible in the result). events is the
    large/skewed side, spread by event_id hash; the customer slice
    replicates ×8. The oracle is the unsalted SQL join — identical
    output IS the correctness contract of ``operators.skew``."""
    from .skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    return salted_join(
        ev, cust, keys=["user_id"], left_unique_cols=["event_id"], n_salt=8
    ).select("event_id", "user_id", "event_type", "value", "c_mktsegment")


ORACLE_JOIN_SALTED = """
SELECT event_id, user_id, event_type, value, c_mktsegment
FROM events JOIN customer ON user_id = c_custkey
"""


def q_group_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max normalization via ``applyInPandas`` — the
    GROUPED_MAP pattern (whole group as one Arrow-backed pandas frame)
    for transforms that need full-group context. min/max are
    order-independent and the per-row rescale is IEEE double math, so
    the Python path stays oracle-exact; the final rounding runs
    Spark-side (numpy rounds half-even, Spark/DuckDB half-up on
    doubles). State per group is one frame — groups must fit an
    executor, which event-type partitions trivially do; high-cardinality
    grouping keys are the scalable choice for this operator."""
    ev = load_table(spark, sf_dir, "events")

    def rescale(pdf):
        lo = pdf["value"].min()
        rng = pdf["value"].max() - lo
        out = pdf[["event_id", "event_type", "value"]].copy()
        out["norm"] = (pdf["value"] - lo) / rng if rng > 0 else 0.0
        return out

    normed = ev.select("event_id", "event_type", "value").groupBy(
        "event_type"
    ).applyInPandas(
        rescale,
        "event_id long, event_type string, value double, norm double",
    )
    return normed.withColumn("norm", F.round("norm", 6))


ORACLE_GROUP_MINMAX_NORM = """
SELECT event_id, event_type, value,
       round(coalesce((value - min(value) OVER w)
                      / NULLIF(max(value) OVER w - min(value) OVER w, 0),
                      0.0), 6) AS norm
FROM events
WINDOW w AS (PARTITION BY event_type)
"""


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly flagging: per-event-type mean/std (decimal-exact
    power sums, helpers.py policy) broadcast back onto the stream;
    events with |z| > 2 surface with their score. The aggregate →
    broadcast → per-row-score decomposition is the standard
    observability shape: the fact side never re-shuffles for the
    statistics, so it runs at scan speed on 100 TB of events."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum((v * v).cast("decimal(30,4)")).alias("s2"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    bounds = stats.select(
        "event_type",
        (s1 / n).alias("mu"),
        F.greatest(F.sqrt(var), F.lit(1e-12)).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
        .filter(F.abs(F.col("z")) > 2)
        .orderBy("event_id")
    )


ORACLE_EVENTS_ANOMALY = """
WITH stats AS (
  SELECT event_type, count(*) AS n,
         sum(cast(value as decimal(18,2))) AS s1,
         sum(cast(cast(value as decimal(18,2))
                  * cast(value as decimal(18,2)) as decimal(30,4))) AS s2
  FROM events GROUP BY event_type
), bounds AS (
  SELECT event_type,
         cast(s1 as double) / cast(n as double) AS mu,
         greatest(sqrt((cast(s2 as double) - cast(s1 as double)
                        * cast(s1 as double) / cast(n as double))
                       / (cast(n as double) - 1.0)), 1e-12) AS sigma
  FROM stats
)
SELECT event_id, e.event_type, value,
       round((value - mu) / sigma, 4) AS z
FROM events e JOIN bounds b ON e.event_type = b.event_type
WHERE abs(round((value - mu) / sigma, 4)) > 2
ORDER BY event_id
"""


def q_events_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (Markov bigram counts):
    lag() over (user, time) pairs each event with its predecessor, then
    a hash aggregate counts (prev_type, event_type) cells. The window
    shuffles once on user_id with in-partition sort — the same exchange
    a sessionization pass uses, so at scale this piggybacks on an
    existing user-partitioned layout. Ordering ties broken by event_id
    (unique), keeping the lag deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type"),
    ).filter(F.col("prev_type").isNotNull())
    return (
        pairs.groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "event_type")
    )


ORACLE_EVENTS_TRANSITION = """
WITH pairs AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type,
         event_type
  FROM events
)
SELECT prev_type, event_type, count(*) AS n
FROM pairs WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, event_type
"""


def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap: events per (ISO weekday × 4 six-hour bins) as a
    wide conditional aggregation — one map-side-combinable hash agg over
    7 rows × 4 counter columns, no pivot machinery and no second shuffle
    (contrast q_pivot, which exercises the pivot operator itself).
    Weekday via Spark ``weekday()+1`` ≡ DuckDB ``isodow`` (1=Monday) —
    the engine-portable day numbering."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.hour("ts")
    binned = ev.select(
        (F.weekday("ts") + F.lit(1)).alias("isodow"), hr.alias("hr")
    )
    aggs = [
        F.sum(
            F.when((F.col("hr") >= lo) & (F.col("hr") < lo + 6), 1).otherwise(0)
        )
        .cast("bigint")
        .alias(f"h{lo:02d}")
        for lo in (0, 6, 12, 18)
    ]
    return binned.groupBy("isodow").agg(*aggs).orderBy("isodow")


ORACLE_EVENTS_HEATMAP = """
SELECT isodow(ts) AS isodow,
       cast(sum(CASE WHEN hour(ts) >= 0  AND hour(ts) < 6  THEN 1 ELSE 0 END)
            AS bigint) AS h00,
       cast(sum(CASE WHEN hour(ts) >= 6  AND hour(ts) < 12 THEN 1 ELSE 0 END)
            AS bigint) AS h06,
       cast(sum(CASE WHEN hour(ts) >= 12 AND hour(ts) < 18 THEN 1 ELSE 0 END)
            AS bigint) AS h12,
       cast(sum(CASE WHEN hour(ts) >= 18 AND hour(ts) < 24 THEN 1 ELSE 0 END)
            AS bigint) AS h18
FROM events
GROUP BY isodow(ts)
ORDER BY isodow
"""


def q_agg_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each event's value holds
    until the user's next event; TWAP = Σ(v·Δt)/Σ(Δt) over the user's
    active span. The duration weighting is one ``lead`` window (user-
    keyed shuffle) feeding a hash aggregate; v·Δt accumulates in decimal
    (2 dp value × integer seconds — exact, order-independent partials),
    and only the final division runs in floating point. The sensor/
    telemetry aggregation shape — plain AVG over-weights burst periods."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_l = F.col("ts").cast("timestamp").cast("long")
    stepped = ev.select(
        "user_id",
        F.col("value").cast("decimal(12,2)").alias("v"),
        (F.lead(ts_l).over(w) - ts_l).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_steps"),
            F.sum("dt").alias("active_seconds"),
            # floor-quantization, not round: tie-free cross-engine (see
            # q_resample_interp docstring)
            (
                F.floor(
                    F.sum(F.col("v") * F.col("dt")).cast("double")
                    / F.sum("dt")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("twap"),
        )
    )


ORACLE_AGG_TWAP = """
WITH stepped AS (
  SELECT user_id,
         cast(value as decimal(12,2)) AS v,
         lead(cast(floor(epoch(ts)) as bigint))
             OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - cast(floor(epoch(ts)) as bigint) AS dt
  FROM events
)
SELECT user_id,
       count(*) AS n_steps,
       cast(sum(dt) as bigint) AS active_seconds,
       floor(cast(sum(v * dt) as double) / cast(sum(dt) as bigint)
             * 1e6 + 0.5) / 1e6 AS twap
FROM stepped WHERE dt IS NOT NULL
GROUP BY user_id
"""


def q_agg_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (α = 0.5) — a RECURSIVE per-key
    statistic no window frame can express (each step depends on the
    previous result). Formulation: collect the user's (t, id, value)
    structs, total-order them with ``array_sort``, and fold with an
    ``aggregate`` lambda — sequential inside codegen, deterministic at
    any partitioning because the fold order is total. State per key is
    the event array: bounded per-user grains only (telemetry sessions);
    for unbounded keys use the applyInPandas path instead. α = 0.5 keeps
    every weight a power of two, so the float fold is exact-stepwise and
    engine-identical; output floor-quantized at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts").cast("timestamp").cast("long").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").cast("double").alias("v"),
            )
        )
    )
    fold = F.aggregate(
        F.col("arr"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["v"]).otherwise(
            x["v"] * F.lit(0.5) + acc * F.lit(0.5)
        ),
    )
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("arr"))
        .select(
            "user_id",
            F.size("arr").cast("long").alias("n_events"),
            (F.floor(fold * 1e6 + F.lit(0.5)) / 1e6).alias("ewma"),
        )
    )


ORACLE_AGG_EWMA = """
WITH g AS (
  SELECT user_id,
         list_sort(list({'t': cast(floor(epoch(ts)) as bigint),
                         'e': event_id,
                         'v': cast(value as double)})) AS arr
  FROM events GROUP BY user_id
)
SELECT user_id,
       cast(len(arr) as bigint) AS n_events,
       floor(list_reduce(list_transform(arr, s -> s.v),
                         (acc, x) -> acc * 0.5 + x * 0.5) * 1e6 + 0.5)
           / 1e6 AS ewma
FROM g
"""


def q_agg_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe twin of ``q_agg_ewma``: the same per-user EWMA
    (α = 0.5, total order by (t, event_id), floor-quantized at 6 dp)
    computed with ``applyInPandas`` instead of a ``collect_list`` fold.
    Why it scales where the array fold doesn't: ``collect_list`` builds
    one JVM array-of-structs per key inside a single aggregation buffer
    — a whale key (say 10⁸ events for one user at 100 TB) blows that
    task's heap. Here each group's raw columns arrive as Arrow-batched
    numpy vectors (~16 bytes/row columnar, no per-element object
    headers) and the fold itself carries O(1) state — two doubles — per
    step. The arithmetic is the IDENTICAL IEEE sequence
    (v·0.5 + acc·0.5, left to right), so results are bit-equal to
    ``q_agg_ewma`` and the same DuckDB oracle applies."""
    import math

    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("t"),
        F.col("event_id").alias("e"),
        F.col("value").cast("double").alias("v"),
    )

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["t", "e"], kind="mergesort")
        acc = None
        for v in pdf["v"].to_numpy():
            acc = float(v) if acc is None else float(v) * 0.5 + acc * 0.5
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "ewma": [math.floor(acc * 1e6 + 0.5) / 1e6],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        fold, "user_id long, n_events long, ewma double"
    )


_PATTERN = "c[ve]*p"  # click → purchase with only views/errors… see docstring


def q_events_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style event-sequence pattern matching: per user,
    count non-overlapping ``click → purchase`` conversions where only
    views or errors intervene (pattern ``c[ve]*p`` over the
    first-letter symbol stream — the five event types have distinct
    initials). Spark has no MATCH_RECOGNIZE; the restatement is the
    classic one: total-order the user's events (array_sort on
    (epoch, event_id) — deterministic at any partitioning), project to
    a symbol string in codegen, and run the regex once per user. Both
    engines' regex engines (Java, RE2) agree on leftmost non-overlapping
    matching for this pattern class (no backtracking ambiguity: the
    char-class star cannot consume the terminator).

    Scale: one shuffle on user_id; state per key is the symbol string —
    bytes per event. For unbounded per-user histories, sessionize first
    (`session_window` upstream) so the pattern runs per session; the
    per-group shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts").cast("timestamp").cast("long").alias("t"),
                F.col("event_id").alias("e"),
                F.substring("event_type", 1, 1).alias("sym"),
            )
        )
    )
    seq = F.expr("concat_ws('', transform(arr, x -> x.sym))")
    return (
        ev.groupBy("user_id")
        .agg(arr.alias("arr"))
        .select(
            "user_id",
            F.size("arr").cast("long").alias("n_events"),
            F.size(F.expr(f"regexp_extract_all(concat_ws('', "
                          f"transform(arr, x -> x.sym)), '{_PATTERN}', 0)"))
            .cast("long")
            .alias("n_conversions"),
            F.length(seq).cast("long").alias("seq_len"),
        )
    )


ORACLE_EVENTS_PATTERN = f"""
WITH g AS (
  SELECT user_id,
         list_sort(list({{'t': cast(floor(epoch(ts)) as bigint),
                         'e': event_id,
                         's': substr(event_type, 1, 1)}})) AS arr
  FROM events GROUP BY user_id
), s AS (
  SELECT user_id,
         len(arr) AS n_events,
         list_aggregate(list_transform(arr, x -> x['s']), 'string_agg', '')
             AS seq
  FROM g
)
SELECT user_id,
       cast(n_events as bigint) AS n_events,
       cast(len(regexp_extract_all(seq, '{_PATTERN}')) as bigint)
           AS n_conversions,
       cast(length(seq) as bigint) AS seq_len
FROM s
"""


def q_sessionize_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SESSION funnel analysis — the composition a product-analytics
    pipeline actually runs: gap-based session assignment (q_sessionize's
    lag+cumsum law) feeding pattern matching (q_events_pattern's symbol
    regex) at the session grain, so a conversion can never span a
    session break. Output per (user, session): size, duration,
    click→purchase conversions.

    One shuffle total: the session-assignment window, the per-session
    collect and the final aggregate all key on user_id (the groupBy key
    is a superset of the window partition key, so the exchange is
    reused) — and unlike the per-user variant, per-key state is bounded
    by the session gap regardless of history length."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    new_sess = (
        F.when(epoch - F.lag(epoch).over(w) > 1800, F.lit(1))
        .otherwise(F.lit(0))
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        epoch.alias("t"),
        F.substring("event_type", 1, 1).alias("sym"),
        new_sess.alias("new_sess"),
    )
    sessioned = flagged.select(
        "user_id",
        "event_id",
        "t",
        "sym",
        F.sum("new_sess")
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("session_id"),
    )
    arr = F.array_sort(F.collect_list(F.struct("t", "event_id", "sym")))
    seq = "concat_ws('', transform(arr, x -> x.sym))"
    return (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max("t") - F.min("t")).alias("duration_s"),
            arr.alias("arr"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            "duration_s",
            F.size(F.expr(f"regexp_extract_all({seq}, '{_PATTERN}', 0)"))
            .cast("long")
            .alias("n_conversions"),
        )
    )


ORACLE_SESSIONIZE_FUNNEL = f"""
WITH flags AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         substr(event_type, 1, 1) AS sym,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT user_id, event_id, t, sym,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS session_id
  FROM flags
), g AS (
  SELECT user_id, session_id,
         count(*) AS n_events,
         max(t) - min(t) AS duration_s,
         list_sort(list({{'t': t, 'e': event_id, 's': sym}})) AS arr
  FROM s GROUP BY user_id, session_id
)
SELECT user_id, cast(session_id as bigint) AS session_id, n_events,
       duration_s,
       cast(len(regexp_extract_all(
           list_aggregate(list_transform(arr, x -> x['s']),
                          'string_agg', ''), '{_PATTERN}')) as bigint)
           AS n_conversions
FROM g
"""


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: the 10 most common session-opening event
    sequences (first 5 events per session, '>'-joined) — the "how do
    users actually move through the product" query behind every journey
    map. Sessions use q_sessionize_funnel's gap law (30-min inactivity);
    the path truncation bounds row width regardless of session length.

    Plan: ONE user-keyed exchange serves the session-assignment window,
    the per-session row_number, and the per-session path aggregate
    (groupBy key is a superset of the window partition key); the path
    count shuffles path-bounded partial counts, and the top-10 resolves
    as TakeOrderedAndProject. The sequence is built from an array_sort
    of (t, event_id, type) structs — an explicit total order, so the
    path string is deterministic under timestamp ties on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    new_sess = (
        F.when(epoch - F.lag(epoch).over(w) > 1800, F.lit(1))
        .otherwise(F.lit(0))
    )
    sessioned = ev.select(
        "user_id",
        "event_id",
        "ts",
        epoch.alias("t"),
        F.col("event_type").alias("et"),
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    )
    heads = sessioned.withColumn("rn", rn).filter(F.col("rn") <= 5)
    arr = F.array_sort(F.collect_list(F.struct("t", "event_id", "et")))
    paths = (
        heads.groupBy("user_id", "session_id")
        .agg(arr.alias("arr"))
        .select(
            F.expr(
                "concat_ws('>', transform(arr, x -> x.et))"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


ORACLE_SESSION_PATHS = """
WITH flags AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS t,
         event_type AS et,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_id
  FROM flags
), h AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS rn
  FROM s
), p AS (
  SELECT string_agg(et, '>' ORDER BY t, event_id) AS path
  FROM h WHERE rn <= 5
  GROUP BY user_id, session_id
)
SELECT path, count(*) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 10
"""


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every click, the earliest
    at-or-after purchase by the same user (q_join_asof_forward's
    reversed running-min formulation — ONE user-keyed exchange, never
    the O(n²) [CURRENT ROW, UNBOUNDED FOLLOWING] frame), then the
    match rate and exact p50/p90 of the latency in seconds — the
    funnel-health scalar a growth dashboard tracks.

    The forward match scans the event stream ordered DESCENDING by
    (ts, event_id) with a running min of purchase times, so each row
    sees the minimum purchase epoch among events at-or-after itself;
    the tie rule (purchases later in (ts, event_id) order) is mirrored
    lexicographically in the oracle's correlated subquery. Latencies
    are integer seconds (exact on both engines); the percentile
    interpolation is the tested percentile ≡ quantile_cont pair."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    next_p = F.min(
        F.when(F.col("event_type") == "purchase", epoch)
    ).over(w_desc)
    clicks = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            epoch.alias("t"),
            "event_type",
            next_p.alias("p_t"),
        )
        .filter(F.col("event_type") == "click")
        .select("user_id", (F.col("p_t") - F.col("t")).alias("lat"))
    )
    return clicks.agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("lat").alias("n_matched"),
        F.round(F.expr("percentile(lat, 0.5)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(lat, 0.9)"), 4).alias("p90_s"),
    )


ORACLE_FUNNEL_LATENCY = """
WITH e AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
), c AS (
  SELECT cl.user_id,
         (SELECT min(p.t) FROM e p
          WHERE p.user_id = cl.user_id AND p.event_type = 'purchase'
            AND (p.ts > cl.ts
                 OR (p.ts = cl.ts AND p.event_id > cl.event_id))) - cl.t
           AS lat
  FROM e cl WHERE cl.event_type = 'click'
)
SELECT count(*) AS n_clicks,
       count(lat) AS n_matched,
       round(quantile_cont(lat, 0.5), 4) AS p50_s,
       round(quantile_cont(lat, 0.9), 4) AS p90_s
FROM c
"""


def q_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every
    purchase's value is split across the user's clicks in the prior 24
    hours — 100% to a lone touch, 50/50 to two, else 40% first / 40%
    last / 20% shared equally by the middles — then credited revenue
    rolls up by touch hour-of-day (the "when do converting touches
    happen" marketing table).

    Exactness contract: purchase values quantize to integer micro-units
    ONCE; position weights are integer basis points whose division
    remainder is assigned deterministically to the earliest middle
    touch, so each purchase's credits sum EXACTLY to its quantized
    value (conservation testable, no float leakage) and the final sums
    are order-independent bigint arithmetic on both engines.

    Plan: the touch join is a hash join on user_id with the time-range
    predicate as a post-join filter (per-user bounded; the bin-bucketed
    interval idiom of q_join_interval_binned is the swap if a single
    user's history stops fitting a partition); one purchase-keyed
    window ranks touches; one 24-row aggregate finishes."""
    ev = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        epoch.alias("p_t"),
        F.floor(F.col("value") * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("v_micro"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("c_id"),
        epoch.alias("c_t"),
    )
    touches = p.join(c, "user_id").filter(
        (F.col("c_t") < F.col("p_t"))
        & (F.col("c_t") >= F.col("p_t") - 86400)
    )
    w = Window.partitionBy("p_id")
    wo = w.orderBy("c_t", "c_id")
    ranked = touches.select(
        "p_id",
        "v_micro",
        "c_t",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    mid_share = F.expr("2000 div (n - 2)")
    mid_rem = F.lit(2000) - mid_share * (F.col("n") - 2)
    w_bp = (
        F.when(F.col("n") == 1, F.lit(10000))
        .when(F.col("n") == 2, F.lit(5000))
        .when(F.col("rn") == 1, F.lit(4000))
        .when(F.col("rn") == F.col("n"), F.lit(4000))
        .otherwise(mid_share + F.when(F.col("rn") == 2, mid_rem).otherwise(0))
    )
    # Telescoping split: credit_i = floor(v·CW_i/1e4) − floor(v·CW_{i−1}/1e4)
    # over the cumulative weight CW — per-purchase credits sum EXACTLY to
    # v_micro (CW_n = 10000), unlike independent floor divisions.
    weighted = ranked.select(
        F.expr("(c_t div 3600) % 24").alias("touch_hour"),
        "p_id",
        "v_micro",
        "c_t",
        "rn",
        w_bp.alias("w_bp"),
    )
    cw = F.sum("w_bp").over(
        Window.partitionBy("p_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    credited = weighted.withColumn("cw", cw).select(
        "touch_hour",
        (
            F.expr("(v_micro * cw) div 10000")
            - F.expr("(v_micro * (cw - w_bp)) div 10000")
        ).alias("cr"),
    )
    return (
        credited.groupBy("touch_hour")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("cr").alias("credited_micro"),
        )
    )


ORACLE_ATTRIBUTION_MULTITOUCH = """
WITH p AS (
  SELECT user_id, event_id AS p_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS p_t,
         cast(floor(value * 1e6 + 0.5) as bigint) AS v_micro
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS c_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS c_t
  FROM events WHERE event_type = 'click'
), touches AS (
  SELECT p.p_id, p.v_micro, c.c_t,
         row_number() OVER (PARTITION BY p.p_id ORDER BY c.c_t, c.c_id)
           AS rn,
         count(*) OVER (PARTITION BY p.p_id) AS n
  FROM p JOIN c ON p.user_id = c.user_id
  WHERE c.c_t < p.p_t AND c.c_t >= p.p_t - 86400
), weighted AS (
  SELECT (c_t // 3600) % 24 AS touch_hour, p_id, v_micro, rn,
         CASE WHEN n = 1 THEN 10000
              WHEN n = 2 THEN 5000
              WHEN rn = 1 THEN 4000
              WHEN rn = n THEN 4000
              ELSE (2000 // (n - 2))
                   + CASE WHEN rn = 2
                          THEN 2000 - (2000 // (n - 2)) * (n - 2)
                          ELSE 0 END
         END AS w_bp
  FROM touches
), cum AS (
  SELECT touch_hour, v_micro, w_bp,
         sum(w_bp) OVER (PARTITION BY p_id ORDER BY rn
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cw
  FROM weighted
)
SELECT touch_hour, count(*) AS n_touches,
       cast(sum((v_micro * cw) // 10000
                - (v_micro * (cw - w_bp)) // 10000) as bigint)
         AS credited_micro
FROM cum GROUP BY touch_hour
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics on events.user_id via
    ``skew.key_skew_report`` — the measurement that picks between plain
    shuffle, AQE skew splitting, and ``salted_join`` (q_join_salted) at
    100 TB. See the helper's docstring for the plan shape."""
    from .skew import key_skew_report

    return key_skew_report(load_table(spark, sf_dir, "events"), "user_id")


ORACLE_SKEW_REPORT = """
WITH per_key AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
)
SELECT count(*) AS n_keys,
       cast(sum(cnt) as bigint) AS n_rows,
       cast(max(cnt) as bigint) AS max_per_key,
       (cast(max(cnt) as bigint) * 10000) // cast(sum(cnt) as bigint)
         AS top_share_bp,
       floor(quantile_cont(cnt, 0.5) * 100 + 0.5) / 100.0 AS p50_per_key,
       floor(quantile_cont(cnt, 0.99) * 100 + 0.5) / 100.0 AS p99_per_key,
       floor(quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5) * 1e4 + 0.5)
         / 1e4 AS skew_ratio
FROM per_key
"""


QUERIES = {
    "q_events_pattern": q_events_pattern,
    "q_session_paths": q_session_paths,
    "q_funnel_latency": q_funnel_latency,
    "q_attribution_multitouch": q_attribution_multitouch,
    "q_skew_report": q_skew_report,
    "q_sessionize_funnel": q_sessionize_funnel,
    "q_events_anomaly": q_events_anomaly,
    "q_agg_twap": q_agg_twap,
    "q_agg_ewma": q_agg_ewma,
    "q_agg_ewma_bounded": q_agg_ewma_bounded,
    "q_events_transition": q_events_transition,
    "q_events_heatmap": q_events_heatmap,
    "q_group_minmax_norm": q_group_minmax_norm,
    "q_events_funnel": q_events_funnel,
    "q_retention_cohort": q_retention_cohort,
    "q_window_percent_rank": q_window_percent_rank,
    "q_join_salted": q_join_salted,
}

ORACLES = {
    "q_events_pattern": ORACLE_EVENTS_PATTERN,
    "q_session_paths": ORACLE_SESSION_PATHS,
    "q_funnel_latency": ORACLE_FUNNEL_LATENCY,
    "q_attribution_multitouch": ORACLE_ATTRIBUTION_MULTITOUCH,
    "q_skew_report": ORACLE_SKEW_REPORT,
    "q_sessionize_funnel": ORACLE_SESSIONIZE_FUNNEL,
    "q_events_anomaly": ORACLE_EVENTS_ANOMALY,
    "q_agg_twap": ORACLE_AGG_TWAP,
    "q_agg_ewma": ORACLE_AGG_EWMA,
    "q_agg_ewma_bounded": ORACLE_AGG_EWMA,
    "q_events_transition": ORACLE_EVENTS_TRANSITION,
    "q_events_heatmap": ORACLE_EVENTS_HEATMAP,
    "q_group_minmax_norm": ORACLE_GROUP_MINMAX_NORM,
    "q_events_funnel": ORACLE_EVENTS_FUNNEL,
    "q_retention_cohort": ORACLE_RETENTION_COHORT,
    "q_window_percent_rank": ORACLE_WINDOW_PERCENT_RANK,
    "q_join_salted": ORACLE_JOIN_SALTED,
}
