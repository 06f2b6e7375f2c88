"""Per-file bloom-filter equality skipping (`pipeline/bloom.py`) — the
Databricks bloom-index analog: point lookups on HIGH-CARDINALITY,
UNCLUSTERED columns, where every file's [min, max] spans the whole
domain and footer stats prune nothing. A per-file digest proves
absence; pruning is strictly an IO reducer (false positives cost
bytes, Spark's residual filter keeps results exact)."""

from __future__ import annotations

import json
import os

import pytest

from nrtwithdeltalake_spark.pipeline import bloom
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable
from nrtwithdeltalake_spark.sources import datasource as ds



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    ds.register(spark)


# -- unit: the filter itself ----------------------------------------------


def test_no_false_negatives_and_sane_fpp():
    values = [f"doc-{i * 7919}" for i in range(5000)]
    m, k = bloom.params(len(values), fpp=0.01)
    bits = bloom.build_bits(values, m, k)
    cf = {"m": m, "k": k, "_bits": bytes(bits)}
    assert all(bloom.might_contain(cf, v) for v in values)  # never FN
    probes = [f"absent-{i}" for i in range(2000)]
    fp = sum(bloom.might_contain(cf, p) for p in probes)
    assert fp / len(probes) < 0.05  # target 1%, generous margin


def test_int_and_string_canon_distinct_and_null_passes():
    m, k = bloom.params(10)
    bits = bloom.build_bits([1, 2, "3"], m, k)
    cf = {"m": m, "k": k, "_bits": bytes(bits)}
    assert bloom.might_contain(cf, 1) and bloom.might_contain(cf, "3")
    assert bloom.canon(3) != bloom.canon("3")  # typed encodings
    assert bloom.might_contain(cf, None)  # un-canonizable: never skips
    assert bloom.might_contain(cf, 2.5)


# -- table integration ------------------------------------------------------


def _mk_sparse(spark, tmp_path, n_batches=4, rows=400, domain=10_000_000):
    """n_batches appends, each one file of pseudo-random ids spanning
    the FULL domain — min/max is useless, bloom is the only pruner.
    Batch b holds ids ≡ b (mod n_batches), so membership is exact."""
    p = str(tmp_path / "sparse")
    t = None
    for b in range(n_batches):
        ids = [(b + i * n_batches) * 7919 % domain for i in range(rows)]
        df = spark.createDataFrame(
            [(i, f"u{i}", b) for i in sorted(set(ids))],
            "user_id bigint, user_key string, batch int",
        ).coalesce(1)
        if t is None:
            t = VersionedTable.create(spark, p, df)
            t.set_properties(
                {"versioned.bloomFilterColumns": "user_id,user_key"}
            )
        else:
            t.append(df)
    return t


def test_sidecars_written_and_committed(spark, tmp_path):
    t = _mk_sparse(spark, tmp_path)
    c = t.get_commit()
    fstats = c.stats["file_stats"]
    # create ran before the property existed; every APPENDED file has a
    # committed sidecar pointer
    with_bloom = [f for f, e in fstats.items() if "__bloom__" in e]
    assert len(with_bloom) == 3
    for f in with_bloom:
        side = fstats[f]["__bloom__"]
        assert os.path.isfile(side)
        cols = bloom.load_sidecar(side)
        assert set(cols) == {"user_id", "user_key"}


def test_planning_prunes_to_matching_files_only(spark, tmp_path):
    t = _mk_sparse(spark, tmp_path)
    c = t.get_commit()
    # probe a value that exists in exactly one batch file
    probe = 3 * 7919 % 10_000_000  # batch 3's first id
    r = ds._PushdownBatchReader(t.path, None, None)
    r.pushed = [("user_id", "=", probe)]
    parts = [p for p in r.partitions() if p.file]
    assert 1 <= len(parts) < len(c.files)  # bloom pruned; fp may keep >1
    # unindexed files (created pre-property) always survive
    unindexed = {
        f
        for f, e in c.stats["file_stats"].items()
        if "__bloom__" not in e
    }
    assert unindexed <= {p.file for p in parts}
    # and the result is exact end-to-end
    got = (
        spark.read.format("versioned")
        .load(t.path)
        .filter(f"user_id = {probe}")
        .collect()
    )
    assert len(got) == 1 and got[0].batch == 3
    # string column prunes too
    r2 = ds._PushdownBatchReader(t.path, None, None)
    r2.pushed = [("user_key", "=", f"u{probe}")]
    assert len([p for p in r2.partitions() if p.file]) < len(c.files)


def test_in_list_keeps_every_cited_batch(spark, tmp_path):
    t = _mk_sparse(spark, tmp_path)
    v1 = 1 * 7919 % 10_000_000
    v2 = (2 + 4 * 4) * 7919 % 10_000_000  # batch 2
    got = (
        spark.read.format("versioned")
        .load(t.path)
        .filter(f"user_id IN ({v1}, {v2})")
        .collect()
    )
    assert {r.batch for r in got} == {1, 2}


def test_executor_side_probe_beyond_driver_budget(spark, tmp_path):
    """Above the planning budget (option bloomDriverPruneMax, default
    DRIVER_PRUNE_MAX) the driver attaches sidecar paths instead of
    reading them; the executor probe returns the same exact rows."""
    t = _mk_sparse(spark, tmp_path)
    probe = 2 * 7919 % 10_000_000
    r = ds._PushdownBatchReader(t.path, None, None, bloom_driver_max=0)
    r.pushed = [("user_id", "=", probe)]
    parts = [p for p in r.partitions() if p.file]
    assert len(parts) == len(t.get_commit().files)  # no driver pruning
    assert any(p.bloom_sidecar for p in parts)  # probe shipped instead
    got = (
        spark.read.format("versioned")
        .option("bloomDriverPruneMax", "0")
        .load(t.path)
        .filter(f"user_id = {probe}")
        .collect()
    )
    assert len(got) == 1 and got[0].batch == 2
    # the shared check proves absence directly against any sidecar
    side = next(p.bloom_sidecar for p in parts if p.bloom_sidecar)
    assert not bloom.file_may_match_bloom(
        side, [("user_id", "=", 9_999_999_999)]
    )


def test_wrong_value_scans_nothing_but_returns_empty_exactly(spark, tmp_path):
    t = _mk_sparse(spark, tmp_path)
    got = (
        spark.read.format("versioned")
        .load(t.path)
        .filter("user_id = 9999999999")
        .collect()
    )
    assert got == []


def test_compact_rebuilds_and_vacuum_reclaims_sidecars(spark, tmp_path):
    t = _mk_sparse(spark, tmp_path)
    old_sides = {
        e["__bloom__"]
        for e in t.get_commit().stats["file_stats"].values()
        if "__bloom__" in e
    }
    t.compact(target_file_bytes=1 << 30)
    new_stats = t.get_commit().stats["file_stats"]
    new_sides = {
        e["__bloom__"] for e in new_stats.values() if "__bloom__" in e
    }
    assert new_sides and new_sides.isdisjoint(old_sides)
    # compaction indexed EVERY rewritten file (including the
    # pre-property create file's rows)
    assert all("__bloom__" in e for e in new_stats.values())
    rep = t.vacuum(retain_last=1)
    assert rep["deleted_files"] > 0
    assert all(not os.path.exists(s) for s in old_sides)
    assert all(os.path.exists(s) for s in new_sides)
    # post-vacuum reads + pruning still work
    probe = 3 * 7919 % 10_000_000
    got = (
        spark.read.format("versioned")
        .load(t.path)
        .filter(f"user_id = {probe}")
        .collect()
    )
    assert len(got) == 1


def test_deep_clone_copies_sidecars(spark, tmp_path):
    t = _mk_sparse(spark, tmp_path)
    c = t.clone(str(tmp_path / "deep"), shallow=False)
    sides = [
        e["__bloom__"]
        for e in c.get_commit().stats["file_stats"].values()
        if "__bloom__" in e
    ]
    assert sides and all(s.startswith(c.bloom_dir) for s in sides)
    probe = 1 * 7919 % 10_000_000
    r = ds._PushdownBatchReader(c.path, None, None)
    r.pushed = [("user_id", "=", probe)]
    assert len([p for p in r.partitions() if p.file]) < len(
        c.get_commit().files
    )


def test_property_validation(spark, tmp_path):
    t = _mk_sparse(spark, tmp_path, n_batches=1)
    with pytest.raises(ValueError, match="reserved"):
        t.set_properties({"versioned.bloomFilterColumns": "__bloom__"})
    with pytest.raises(ValueError):
        t.set_properties({"versioned.bloomFilterFpp": "1.5"})
    with pytest.raises(ValueError, match="at least one"):
        t.set_properties({"versioned.bloomFilterColumns": " , "})


def test_float_columns_silently_not_indexed(spark, tmp_path):
    """Floats are excluded from indexing (representation-fragile canon)
    — configuring one simply indexes nothing for it, and equality reads
    stay exact through the residual filter."""
    p = str(tmp_path / "fl")
    t = VersionedTable.create(
        spark,
        p,
        spark.createDataFrame([(1, 1.5)], "id bigint, x double"),
    )
    t.set_properties({"versioned.bloomFilterColumns": "x,id"})
    t.append(spark.createDataFrame([(2, 2.5)], "id bigint, x double"))
    side = next(
        e["__bloom__"]
        for e in t.get_commit().stats["file_stats"].values()
        if "__bloom__" in e
    )
    assert set(bloom.load_sidecar(side)) == {"id"}
    got = (
        spark.read.format("versioned").load(p).filter("x = 2.5").collect()
    )
    assert len(got) == 1 and got[0].id == 2


def test_malformed_sidecar_geometry_keeps_file(tmp_path):
    """A sidecar whose declared m disagrees with the decoded bit length
    (or isn't a power of two) must load as None — i.e. the file STAYS
    in the scan — rather than raising IndexError mid-probe or, worse,
    yielding a false negative that wrongly skips a file."""
    d = str(tmp_path)
    bits = bloom.build_bits([1, 2, 3], 1024, 5)
    path = bloom.write_sidecar(d, "data-1.parquet", {"id": {"m": 1024, "k": 5, "_bits": bits}}, 3)
    assert bloom.load_sidecar(path) is not None

    raw = json.load(open(path))

    def rewrite(mutate):
        doc = json.loads(json.dumps(raw))
        mutate(doc["cols"]["id"])
        with open(path, "w") as f:
            json.dump(doc, f)

    # m disagrees with the decoded bit-array length
    rewrite(lambda e: e.update(m=2048))
    assert bloom.load_sidecar(path) is None
    assert bloom.file_may_match_bloom(path, (("id", "=", 999),)) is True
    # m not a power of two (breaks the &-mask indexing)
    rewrite(lambda e: e.update(m=1000))
    assert bloom.load_sidecar(path) is None
    # non-positive / non-int k
    rewrite(lambda e: e.update(k=0))
    assert bloom.load_sidecar(path) is None
    rewrite(lambda e: e.update(k="5"))
    assert bloom.load_sidecar(path) is None
    # intact sidecar still loads
    with open(path, "w") as f:
        json.dump(raw, f)
    assert bloom.load_sidecar(path) is not None
