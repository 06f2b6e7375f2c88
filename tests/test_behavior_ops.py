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
