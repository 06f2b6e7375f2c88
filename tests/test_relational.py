"""Every declared query with a SQL oracle must hash-match DuckDB — the
same check the driver runs at sf0.01 (here at sf0.001 for speed; the
queries are scale-free)."""

from __future__ import annotations

import pytest

from nrtwithdeltalake_spark.operators import registry

from .oracle import compare

QUERIES = registry.all_queries()
ORACLES = registry.all_oracles()
ORACLE_BACKED = sorted(set(QUERIES) & set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_match(spark, sf_dir, name):
    compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert fn(spark, sf_dir).count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "c_mktsegment",
        "revenue",
        "n_orders",
        "latest_orderkey",
        "latest_odate",
    }


def test_sketch_distinct_error_bounds(spark, sf_dir):
    """Sketch estimates must land within 5% of the exact distinct count
    (rsd=0.02 for HLL++; DataSketches HLL default is tighter)."""
    from nrtwithdeltalake_spark.operators import relational_ext as rx

    for r in rx.q_agg_approx_distinct(spark, sf_dir).collect():
        assert abs(r.approx_custs - r.exact_custs) <= max(2, 0.05 * r.exact_custs)

    exact = {
        r.o_orderpriority: r.exact_custs
        for r in rx.q_agg_approx_distinct(spark, sf_dir).collect()
    }
    for r in rx.q_agg_hll_union(spark, sf_dir).collect():
        e = exact[r.o_orderpriority]
        assert abs(r.approx_custs - e) <= max(2, 0.05 * e)


def test_approx_percentile_error_bounds(spark, sf_dir):
    """percentile_approx's contract is RANK error (≤ 1/accuracy), not
    value error: assert each estimate falls between the exact values at
    rank ±5 percentage points of the target — the correct translation
    of the sketch guarantee to value space (value deltas can be large
    wherever the distribution is locally flat-ranked but value-spread)."""
    from nrtwithdeltalake_spark.operators import robust
    from nrtwithdeltalake_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    bounds = {
        r.o_orderpriority: r
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.45)").alias("p45"),
            F.expr("percentile(o_totalprice, 0.55)").alias("p55"),
            F.expr("percentile(o_totalprice, 0.90)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
        )
        .collect()
    }
    for r in robust.q_agg_approx_percentile(spark, sf_dir).collect():
        b = bounds[r.o_orderpriority]
        assert b.p45 <= r.approx_p50 <= b.p55, r
        assert b.p90 <= r.approx_p95 <= b.p99, r


def test_profile_columns_approx_agrees_with_exact(spark, sf_dir):
    """Scale-path sanity: approx profile matches exact on every stat but
    n_distinct, and HLL distinct is within its ~5% default error."""
    from nrtwithdeltalake_spark.operators import relational_ext

    exact = {
        r.column_name: r
        for r in relational_ext.q_profile_columns(spark, sf_dir, exact=True).collect()
    }
    approx = {
        r.column_name: r
        for r in relational_ext.q_profile_columns(spark, sf_dir, exact=False).collect()
    }
    assert exact.keys() == approx.keys()
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_null, a.min_v, a.max_v, a.mean_v) == (
            e.n_rows, e.n_null, e.min_v, e.max_v, e.mean_v,
        )
        assert abs(a.n_distinct - e.n_distinct) <= max(2, 0.1 * e.n_distinct)


def test_oracle_output_types_survive_driver_canonicalizer(sf_dir):
    """No oracle's DuckDB output may contain HUGEINT / DECIMAL(38,0)
    (pandas materializes them as float64 → value-hash mismatch against
    Spark's int64) or LIST/STRUCT/MAP cells (the driver's sort_values
    canonicalizer crashes on unhashable cells). This is the r09 defect
    class (12 oracles), encoded so it can never ship again."""
    from tools.oracle_type_audit import audit

    offenders = audit(sf_dir)
    assert not offenders, (
        "driver-canonicalizer-incompatible oracle output types: "
        f"{offenders} — CAST final integer sums AS BIGINT / serialize "
        "arrays with array_join (see q_agg_array)"
    )


def test_rotation_order_fails_first_then_unsampled():
    """The driver-sample rotation must re-verify known-failed queries
    FIRST (advisor r09: pushing failures to the back means the official
    gate never re-samples a fix), then never-sampled, then clean."""
    import glob
    import json
    import os

    import __spark_entry__ as e

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        with open(p) as f:
            last.update(json.load(f))
    if not last:
        return  # round 1: nothing to rotate against
    names = list(e.queries())
    failed = {
        n
        for n, rec in last.items()
        if rec.get("err") != "no_oracle"
        and not (rec.get("hash_match") and rec.get("rows_match") and rec.get("schema_match") and rec.get("err") is None)
    }
    failed &= set(names)
    if failed:
        # every known-failed name must precede every clean sampled name
        clean = [n for n in names if n in last and n not in failed]
        worst_failed = max(names.index(n) for n in failed)
        first_clean = min((names.index(n) for n in clean), default=len(names))
        assert worst_failed < first_clean, (
            f"failed queries {sorted(failed)} must sort before previously-"
            "clean ones in the driver rotation"
        )


def test_rotation_order_clean_tier_is_lru(tmp_path):
    """VERDICT r11 #1: within the clean tier the rotation must order
    LEAST-recently-sampled first (not alphabetically), so every
    official record keeps refreshing. Pinned against synthetic
    artifact fixtures."""
    import json

    import __spark_entry__ as e

    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    bad = {**ok, "hash_match": False}
    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 1, "oracle_rows": None,
                 "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_aaa": ok, "q_old": ok, "q_ro_old": rows_only})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q_aaa": ok, "q_mid": ok})
    )
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({"q_aaa": ok, "q_new": ok, "q_broken": bad})
    )
    names = ["q_aaa", "q_broken", "q_mid", "q_new", "q_never",
             "q_old", "q_ro_old"]
    order = e._rotation_order(names, artifact_dir=str(tmp_path))
    # tier 0: the failed query; tier 1: never sampled; tier 2 (clean):
    # ascending by the round of the LATEST record — r01's q_old /
    # q_ro_old (rows-only counts as clean) before r02's q_mid before
    # r10's q_aaa/q_new, alphabetical only WITHIN a round
    assert order == ["q_broken", "q_never", "q_old", "q_ro_old",
                     "q_mid", "q_aaa", "q_new"]
    # a later FAILED record demotes a previously-clean query into the
    # re-verify tier and its recency updates (latest record wins)
    (tmp_path / "CORRECTNESS_r11.json").write_text(
        json.dumps({"q_old": bad, "q_broken": ok})
    )
    order = e._rotation_order(names, artifact_dir=str(tmp_path))
    assert order[:2] == ["q_old", "q_never"]
    assert order.index("q_ro_old") < order.index("q_mid") < order.index(
        "q_broken"
    )
    # two-digit round ordering is numeric, not lexicographic
    (tmp_path / "CORRECTNESS_r9.json").write_text(
        json.dumps({"q_nine": ok})
    )
    order = e._rotation_order(names + ["q_nine"],
                              artifact_dir=str(tmp_path))
    assert order.index("q_nine") < order.index("q_broken")  # r9 < r11
