"""Skew mitigation utilities.

AQE's skew-join handling (enabled in ``session.build_spark``) splits
oversized sort-merge partitions at runtime and is the first line of
defense. These helpers cover the cases AQE cannot fix:

* ``salted_join`` — a join key so hot that even a split partition
  overwhelms one task (the classic power-law key: null-ish defaults,
  bot users, empty-string documents). The left (large) side spreads each
  hot key over ``n_salt`` subkeys; the right side is replicated
  ``n_salt`` times. Shuffle volume rises by ×n_salt on the small side
  only; the hot key's work spreads over n_salt tasks.
* ``two_phase_agg`` — aggregation skew: partial-aggregate on
  (keys + salt), then finalize on keys. Only decomposable aggregates
  (sum/count/min/max — anything with a merge function) are legal;
  the built-in hash aggregate already does this per-partition, so this
  helper only pays off when a single group exceeds one task's partial
  map (billions of rows in one group).

Both are deterministic (hash-based salt, no rand()) so reruns and
retried tasks produce identical results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_unique_cols: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with the left side salted over ``n_salt``
    subkeys. ``left_unique_cols`` must identify left rows well enough to
    spread them (a row id, event id, or the full row's hash source) —
    the salt is ``xxhash64(left_unique_cols) mod n_salt``, deterministic
    across retries. The right side is exploded ×``n_salt``; keep it the
    smaller input."""
    l_salted = left.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in left_unique_cols]), F.lit(n_salt)),
    )
    r_salted = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l_salted.join(r_salted, keys + [_SALT], how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_cols: list[str],
    n_salt: int = 64,
) -> DataFrame:
    """Aggregate with an intermediate salted phase: groupBy(keys + salt)
    applying ``partial_aggs``, then groupBy(keys) applying ``final_aggs``
    over the partials. The caller picks the decomposition, e.g.
    count → partial count + final sum; avg → (sum, count) partials."""
    salted = df.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt)),
    )
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )


def key_skew_report(df: DataFrame, key: str) -> DataFrame:
    """Key-distribution diagnostics for a prospective join/agg key — the
    "measure before you salt" report that decides between plain
    shuffle, AQE skew splitting, and ``salted_join``: key cardinality,
    the hottest key's share (exact basis points), and the p99/median
    per-key-count ratio (tie-free-quantized).

    One partial-aggregatable count pass collapses the fact grain to
    per-key counts; every statistic then lives on the key grain. The
    exact ``percentile`` over per-key counts is the only
    cardinality-bounded buffer; swap approx_percentile at extreme key
    counts (same plan otherwise)."""
    per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_per_key"),
        F.expr("(max(cnt) * 10000) div sum(cnt)").alias("top_share_bp"),
        F.expr("percentile(cnt, 0.5)").alias("__p50"),
        F.expr("percentile(cnt, 0.99)").alias("__p99"),
    ).select(
        "n_keys",
        "n_rows",
        "max_per_key",
        "top_share_bp",
        (
            F.floor(F.col("__p50") * 100 + F.lit(0.5)) / F.lit(100.0)
        ).alias("p50_per_key"),
        (
            F.floor(F.col("__p99") * 100 + F.lit(0.5)) / F.lit(100.0)
        ).alias("p99_per_key"),
        (
            F.floor(F.col("__p99") / F.col("__p50") * 1e4 + F.lit(0.5))
            / F.lit(1e4)
        ).alias("skew_ratio"),
    )
