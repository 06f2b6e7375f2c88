"""Non-equi join strategies that survive 100 TB.

A pure range/interval predicate (no equi key) gives Catalyst nothing to
hash on: the physical plan degenerates to BroadcastNestedLoopJoin (or a
cartesian product), O(|L|·|R|) comparisons — fine for a broadcast-sized
side, fatal for two large inputs. The generalization of the reference's
theta watermark predicate (O8, COPY_MSQL_TO_SILVER.py:131) to
interval joins therefore needs a *derived equi key*:

* ``q_join_interval_binned`` — time-bin bucketing: each interval is
  exploded onto the fixed-width bins it overlaps, each point maps to
  exactly one bin, and the join becomes a hash equi-join on the bin id
  with the exact predicate re-checked post-join. Candidate work is
  O(points + intervals·bins_per_interval + true_matches) instead of
  O(points·intervals). The same trick backs every production
  interval-join implementation (Databricks range-join hints, Flink
  interval joins). Oracle-proven identical to the naive theta join.
* ``q_fuzzy_join`` — similarity self-join via blocking: candidate pairs
  are generated only inside (lang, length-band) blocks — a hash
  shuffle — and the expensive edit-distance verify runs per candidate,
  never per cross-pair. The standard entity-resolution /
  near-duplicate-key shape (cf. MinHash-LSH in operators/dedup.py,
  which is the same block→verify skeleton with hashed blocks).

A plan guardrail in tests/test_plans.py asserts the binned join contains
no nested-loop/cartesian node — the property that actually matters at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .helpers import fan_out

# Bin width (seconds) == the interval length: every interval spans at
# most two bins, so the explode factor is bounded by 2.
_BIN_S = 600


def q_join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident-window join: every ``error`` event from the on-call
    user cohort opens a 10-minute window; count and sum all events
    falling inside each window. Windows are exploded onto the ≤2
    600-second bins they overlap, points map to their single bin, and
    the join is a plain hash join on the bin id (+ exact range filter).
    Each (window, event) pair meets in exactly one bin — the event's —
    so no post-join dedup is needed."""
    events = load_table(spark, sf_dir, "events")
    windows = (
        events.filter(
            (F.col("event_type") == "error") & (F.col("user_id") % 7 == 0)
        )
        .select(
            F.col("event_id").alias("w_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp("w_start") / _BIN_S),
                    F.floor(F.unix_timestamp("w_end") / _BIN_S),
                )
            ),
        )
    )
    # no fan_out (r14): the probe side goes straight into a broadcast
    # join + partial-aggregatable count — shuffling the full (ts, value)
    # payload first measured 1.7-1.8x slower (1.00 s -> 0.54 s), and the
    # gated fan_out is a no-op at scale anyway.
    points = events.withColumn(
        "bin", F.floor(F.unix_timestamp("ts") / _BIN_S)
    )
    joined = points.join(windows, "bin").filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    return (
        joined.groupBy("w_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("w_id")
    )


ORACLE_JOIN_INTERVAL_BINNED = """
WITH windows AS (
  SELECT event_id AS w_id, ts AS w_start, ts + INTERVAL 10 MINUTE AS w_end
  FROM events WHERE event_type = 'error' AND user_id % 7 = 0
)
SELECT w_id, count(*) AS n_events,
       cast(round(sum(cast(value AS decimal(18,2))), 2) AS double) AS sum_value
FROM windows w JOIN events e
  ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY w_id
ORDER BY w_id
"""


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked similarity self-join (entity resolution): candidate
    pairs share (lang, 32-char length band) — the blocking key that
    turns the quadratic cross-join into a per-block one — and survive
    an edit-distance verify on the 30-char prefix. Shuffle cost is one
    hash exchange on the block key; comparison cost is Σ|block|², not
    |corpus|². Skewed blocks are AQE's problem first, salting's second
    (operators/skew.py)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), spark).select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 32).alias("band"),
        F.substring("text", 1, 30).alias("prefix"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("left_id"),
        F.col("b.doc_id").alias("right_id"),
        F.levenshtein("a.prefix", "b.prefix").alias("edit_dist"),
    )
    return pairs.filter(F.col("edit_dist") <= 12).orderBy(
        "left_id", "right_id"
    )


ORACLE_FUZZY_JOIN = """
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       levenshtein(left(a.text, 30), left(b.text, 30)) AS edit_dist
FROM documents a JOIN documents b
  ON a.lang = b.lang
 AND (a.n_chars // 32) = (b.n_chars // 32)
 AND a.doc_id < b.doc_id
WHERE levenshtein(left(a.text, 30), left(b.text, 30)) <= 12
ORDER BY left_id, right_id
"""


def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval OVERLAP join — the generalization of
    ``q_join_interval_binned`` where BOTH sides are windows: error
    incident windows (10 min) against purchase activity windows (5 min,
    even-user cohort); emit per incident the overlapping-window count
    and total overlap seconds.

    Both interval sets explode onto the fixed bins they cover and meet
    in a hash join on the bin id; unlike the point case a pair can meet
    in SEVERAL shared bins, so candidate pairs are deduped on
    (incident, window) before aggregating — the extra ``distinct`` (one
    pair-keyed exchange) is the price of interval×interval. Candidate
    work is O(Σ bins-per-interval × per-bin density + matches), never
    the nested-loop O(|A|·|B|) a raw overlap predicate plans as."""
    events = load_table(spark, sf_dir, "events")

    def windows(evt_filter, minutes, id_alias):
        return events.filter(evt_filter).select(
            F.col("event_id").alias(id_alias),
            F.col("ts").alias(f"{id_alias}_start"),
            (F.col("ts") + F.expr(f"INTERVAL {minutes} MINUTES")).alias(
                f"{id_alias}_end"
            ),
        )

    a = windows(
        (F.col("event_type") == "error") & (F.col("user_id") % 7 == 0), 10, "a_id"
    ).withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("a_id_start") / _BIN_S),
                F.floor(F.unix_timestamp("a_id_end") / _BIN_S),
            )
        ),
    )
    b = windows(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 2 == 0), 5, "b_id"
    ).withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("b_id_start") / _BIN_S),
                F.floor(F.unix_timestamp("b_id_end") / _BIN_S),
            )
        ),
    )
    pairs = (
        a.join(b, "bin")
        .filter(
            (F.col("a_id_start") < F.col("b_id_end"))
            & (F.col("b_id_start") < F.col("a_id_end"))
        )
        .select("a_id", "b_id", "a_id_start", "a_id_end", "b_id_start", "b_id_end")
        .distinct()
    )
    overlap_s = F.least(
        F.unix_timestamp("a_id_end"), F.unix_timestamp("b_id_end")
    ) - F.greatest(F.unix_timestamp("a_id_start"), F.unix_timestamp("b_id_start"))
    return (
        pairs.groupBy("a_id")
        .agg(
            F.count(F.lit(1)).alias("n_overlapping"),
            F.sum(overlap_s).alias("total_overlap_s"),
        )
        .orderBy("a_id")
    )


ORACLE_JOIN_INTERVAL_OVERLAP = """
WITH a AS (
  SELECT event_id AS a_id, ts AS a_start, ts + INTERVAL 10 MINUTE AS a_end
  FROM events WHERE event_type = 'error' AND user_id % 7 = 0
), b AS (
  SELECT event_id AS b_id, ts AS b_start, ts + INTERVAL 5 MINUTE AS b_end
  FROM events WHERE event_type = 'purchase' AND user_id % 2 = 0
)
SELECT a.a_id,
       count(*) AS n_overlapping,
       cast(sum(cast(floor(epoch(least(a.a_end, b.b_end))) as bigint)
                - cast(floor(epoch(greatest(a.a_start, b.b_start))) as bigint))
            as bigint) AS total_overlap_s
FROM a JOIN b ON a.a_start < b.b_end AND b.b_start < a.a_end
GROUP BY a.a_id
ORDER BY a.a_id
"""


QUERIES = {
    "q_join_interval_binned": q_join_interval_binned,
    "q_join_interval_overlap": q_join_interval_overlap,
    "q_fuzzy_join": q_fuzzy_join,
}

ORACLES = {
    "q_join_interval_binned": ORACLE_JOIN_INTERVAL_BINNED,
    "q_join_interval_overlap": ORACLE_JOIN_INTERVAL_OVERLAP,
    "q_fuzzy_join": ORACLE_FUZZY_JOIN,
}
