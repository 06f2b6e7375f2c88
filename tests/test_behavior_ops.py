"""Semantic invariants for behavioral-analytics operators beyond the
registry oracle sweep."""

from __future__ import annotations

from nrtwithdeltalake_spark.operators import behavior


def test_session_paths_shape(spark, sf_dir):
    rows = behavior.q_session_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        segs = r.path.split(">")
        assert 1 <= len(segs) <= 5
        assert all(
            s in {"click", "view", "purchase", "signup", "error"} for s in segs
        ), r.path


def test_funnel_latency_invariants(spark, sf_dir):
    r = behavior.q_funnel_latency(spark, sf_dir).collect()[0]
    assert 0 <= r.n_matched <= r.n_clicks
    if r.n_matched:
        assert 0 <= r.p50_s <= r.p90_s


def test_attribution_conserves_purchase_value(spark, sf_dir):
    """Telescoping-split contract: total credited micro-value equals the
    exact sum of quantized values of purchases that HAVE at least one
    touch — no credit is created or destroyed by the weight split."""
    from pyspark.sql import functions as F

    from nrtwithdeltalake_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("timestamp").cast("long")
    p = ev.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        epoch.alias("p_t"),
        F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("long").alias("v"),
    )
    c = ev.filter("event_type = 'click'").select(
        "user_id", epoch.alias("c_t")
    )
    touched = (
        p.join(c, "user_id")
        .filter("c_t < p_t AND c_t >= p_t - 86400")
        .select("p_id", "v")
        .distinct()
    )
    expected = touched.agg(F.sum("v")).collect()[0][0] or 0
    out = behavior.q_attribution_multitouch(spark, sf_dir)
    total = out.agg(F.sum("credited_micro")).collect()[0][0] or 0
    assert total == expected


def test_ewma_bounded_matches_array_fold_on_hot_key(spark, tmp_path):
    """q_agg_ewma_bounded is the hot-key-safe twin of q_agg_ewma: on a
    deliberately skewed table (one user owning 50k events — the shape
    that blows the collect_list fold's task heap at 100 TB) the two
    formulations agree bit-for-bit, because the applyInPandas fold runs
    the identical IEEE sequence with O(1) state per step."""
    import datetime

    from pyspark.sql import functions as F

    from nrtwithdeltalake_spark.operators.behavior import (
        q_agg_ewma,
        q_agg_ewma_bounded,
    )

    t0 = datetime.datetime(2024, 1, 1)
    hot = spark.range(50_000).select(
        F.col("id").alias("event_id"),
        (F.lit(t0) + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.lit(7).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.sin(F.col("id").cast("double")) * 100).alias("value"),
        F.lit("{}").alias("props"),
    )
    cold = spark.range(50_000, 50_200).select(
        F.col("id").alias("event_id"),
        (F.lit(t0) + F.make_interval(secs=F.col("id").cast("double"))).alias("ts"),
        (F.col("id") % 40 + 100).alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.cos(F.col("id").cast("double")) * 100).alias("value"),
        F.lit("{}").alias("props"),
    )
    hot.unionByName(cold).write.parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    a = {r.user_id: (r.n_events, r.ewma) for r in q_agg_ewma(spark, sf).collect()}
    b = {
        r.user_id: (r.n_events, r.ewma)
        for r in q_agg_ewma_bounded(spark, sf).collect()
    }
    assert a == b
    assert a[7][0] == 50_000
