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
