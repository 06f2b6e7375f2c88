"""Semantic properties for the robust/order-statistics family beyond the
registry oracle sweep."""

from __future__ import annotations

from nrtwithdeltalake_spark.operators import robust


def test_eqdepth_histogram_equal_mass(spark, sf_dir):
    """Equi-depth contract: 4 buckets, together exhaustive, each within
    a whisker of 25% of rows (ties on the cutoff can shift a handful),
    and bucket ranges ordered and non-overlapping."""
    rows = sorted(
        robust.q_agg_histogram_eqdepth(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == [0, 1, 2, 3]
    total = sum(r.n_rows for r in rows)
    for r in rows:
        assert abs(r.n_rows - total / 4) <= max(2, 0.02 * total), rows
    for a, b in zip(rows, rows[1:]):
        assert a.max_v <= b.min_v, (a, b)
