"""CLONE (Delta's CREATE TABLE ... CLONE analog) — shallow (zero-copy)
and deep forks of a versioned table.

Scale contract under test: a shallow clone of a 100 TB table is
metadata-only (no data file is copied or read), both tables stay
copy-on-write-independent afterwards, and reclamation on either side
can never delete the other's live data.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nrtwithdeltalake_spark.pipeline.tables import VersionedTable



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _mk(spark, path, n=100, parts=4):
    return VersionedTable.create(
        spark,
        path,
        spark.range(n)
        .select(F.col("id"), (F.col("id") % 5).alias("g"))
        .repartition(parts),
    )


def test_shallow_clone_is_metadata_only(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    # zero data copied: the clone has no data files of its own
    assert not os.path.isdir(dst.data_dir) or not os.listdir(dst.data_dir)
    c = dst.get_commit()
    assert c.op == "clone" and c.version == 0
    assert set(c.files) == set(src.get_commit().files)
    assert dst.read().count() == 100
    assert sorted(r.id for r in dst.read().collect()) == list(range(100))
    # skipping stats and the field-id floor carried over
    assert c.stats.get("cloned_from") == src.path
    assert c.stats.get("shallow") is True


def test_clone_at_version_time_travels(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=10)
    src.append(spark.range(10, 20).select(F.col("id"), (F.col("id") % 5).alias("g")))
    dst = src.clone(str(tmp_path / "dst"), shallow=True, version=0)
    assert dst.read().count() == 10


def test_clone_refuses_existing_dest(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=5)
    src.clone(str(tmp_path / "dst"))
    with pytest.raises(RuntimeError, match="already exists"):
        src.clone(str(tmp_path / "dst"))


def test_clone_and_source_are_write_independent(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=10)
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    # write to the clone: copy-on-write rewrites land in the CLONE's tree
    dst.merge(spark.createDataFrame([(1, 99)], "id long, g long"), ["id"])
    assert {r.g for r in src.read().filter("id = 1").collect()} == {1}
    assert {r.g for r in dst.read().filter("id = 1").collect()} == {99}
    # write to the source: the clone's snapshot is pinned
    src.merge(spark.createDataFrame([(2, 77)], "id long, g long"), ["id"])
    assert {r.g for r in dst.read().filter("id = 2").collect()} == {2}


def test_clone_vacuum_never_deletes_source_files(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=20)
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    # make the clone's v0 (source-referencing) history reclaimable
    dst.overwrite(spark.range(3).select(F.col("id"), F.lit(0).alias("g")))
    out = dst.vacuum(retain_last=1)
    # nothing outside the clone's own tree was touched
    assert out["deleted_files"] == 0
    assert src.read().count() == 20  # source fully intact
    # source vacuum likewise only ever touches its own tree, and with
    # v0 still live here it deletes nothing
    src.vacuum(retain_last=1)
    assert src.read().count() == 20


def test_source_vacuum_can_strand_shallow_clone(spark, tmp_path):
    """The documented Delta caveat: vacuuming the SOURCE past the cloned
    snapshot strands a shallow clone — reads fail loudly, not wrongly."""
    src = _mk(spark, str(tmp_path / "src"), n=20)
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    src.overwrite(spark.range(2).select(F.col("id"), F.lit(0).alias("g")))
    src.vacuum(retain_last=1)  # reclaims the files the clone references
    with pytest.raises(Exception):
        dst.read().collect()


def test_deep_clone_survives_source_vacuum(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=20)
    dst = src.clone(str(tmp_path / "dst"), shallow=False)
    assert os.listdir(dst.data_dir)  # bytes actually copied
    src.overwrite(spark.range(2).select(F.col("id"), F.lit(0).alias("g")))
    src.vacuum(retain_last=1)
    assert dst.read().count() == 20


def test_clone_carries_field_ids_rename_works(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=10)
    src.rename_column("g", "grp")
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    # pre-clone renamed column resolves by field id from source files
    assert sorted(r.grp for r in dst.read().filter("id < 2").collect()) == [0, 1]
    # a post-clone rename on the clone keeps resolving old physical names
    dst.rename_column("grp", "bucket")
    assert dst.read().filter("bucket = 3").count() == 2
    # and the source is untouched by the clone's rename
    assert "grp" in src.read().columns


def test_clone_carries_constraints(spark, tmp_path):
    from nrtwithdeltalake_spark.pipeline.tables import ConstraintViolationError

    src = _mk(spark, str(tmp_path / "src"), n=5)
    src.add_constraint("g_bound", "g < 100")
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    assert dst.constraints() == {"g_bound": "g < 100"}
    with pytest.raises(ConstraintViolationError, match="g_bound"):
        dst.append(spark.createDataFrame([(999, 999)], "id long, g long"))


def test_clone_carries_txn_watermarks(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=5)
    src.append(
        spark.createDataFrame([(50, 0)], "id long, g long"),
        txn_app="ingest",
        txn_version=7,
    )
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    # a replayed idempotent write must NOT double-apply into the clone
    v = dst.append(
        spark.createDataFrame([(50, 0)], "id long, g long"),
        txn_app="ingest",
        txn_version=7,
    )
    assert v == 0  # structural no-op
    assert dst.read().filter("id = 50").count() == 1


def test_clone_change_feed_bootstraps(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"), n=5)
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    # crossing the clone commit refuses loudly (no CDF exists for it)
    with pytest.raises(ValueError, match="clone commit"):
        dst.change_feed(-1).collect()
    # consumers watermark from the clone version onward
    dst.append(spark.createDataFrame([(100, 0)], "id long, g long"))
    feed = dst.change_feed(0)
    assert [(r.id, r._change_type) for r in feed.collect()] == [
        (100, "insert")
    ]


def test_clone_file_stats_support_pruning(spark, tmp_path):
    src = VersionedTable.create(
        spark,
        str(tmp_path / "src"),
        spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("g")),
    )
    src.compact(cluster_by=["id"])
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    assert dst.get_commit().stats.get("file_stats")


def test_vacuum_retain_hours(spark, tmp_path):
    """Delta's RETAIN n HOURS form: recent versions survive regardless
    of count; retain_hours=0 falls back to the version floor."""
    import json as _json

    t = _mk(spark, str(tmp_path / "t"), n=10, parts=1)
    t.overwrite(spark.range(3).select(F.col("id"), F.lit(0).alias("g")))
    t.overwrite(spark.range(4).select(F.col("id"), F.lit(1).alias("g")))
    # backdate v0/v1 by 48h so only v2 is "recent"
    for v in (0, 1):
        p = t._commit_path(v)
        c = _json.loads(open(p).read())
        c["ts"] = c["ts"] - 48 * 3600
        open(p, "w").write(_json.dumps(c))
    # retain_last=1 would reclaim v0+v1, but 72h retention keeps all
    out = t.vacuum(retain_last=1, retain_hours=72)
    assert out["deleted_files"] == 0
    assert t.read(version=0).count() == 10  # time travel intact
    # 24h retention: v0/v1 (48h old) expire, v2 survives
    out = t.vacuum(retain_last=1, retain_hours=24)
    assert out["deleted_files"] > 0
    assert t.read().count() == 4
    with pytest.raises(Exception):
        t.read(version=0).collect()


def test_clone_carries_deletion_vectors(spark, tmp_path):
    """A shallow clone of a table with LIVE deletion vectors keeps the
    deleted rows masked — the clone references both the data files and
    the DV sidecars; a clone of the clone still masks."""
    src = _mk(spark, str(tmp_path / "src"), n=20, parts=2)
    src.delete("id < 5", use_dv=True)
    dst = src.clone(str(tmp_path / "dst"), shallow=True)
    assert dst.get_commit().dv_files == src.get_commit().dv_files
    assert sorted(r.id for r in dst.read().collect()) == list(range(5, 20))
    # deep clone REMAPS the sidecars' file references to its own tree —
    # a byte-copy would mask nothing and resurrect the deleted rows
    deep = src.clone(str(tmp_path / "deep"), shallow=False)
    assert all(f.startswith(deep.path) for f in deep.get_commit().dv_files)
    assert sorted(r.id for r in deep.read().collect()) == list(range(5, 20))
    grand = dst.clone(str(tmp_path / "grand"), shallow=True)
    assert grand.read().count() == 15
    # compacting the clone materializes the vectors locally
    dst.compact()
    assert dst.get_commit().dv_files == []
    assert dst.read().count() == 15


def test_clone_at_old_version_skips_current_sidecars(spark, tmp_path):
    """Sidecars describe the CURRENT schema; cloning an older snapshot
    must not inherit a constraint its own schema can't even resolve."""
    src = _mk(spark, str(tmp_path / "src"), n=5)
    src.rename_column("g", "grp")
    src.add_constraint("grp_pos", "grp >= 0")
    dst = src.clone(str(tmp_path / "dst"), version=0)
    assert dst.constraints() == {}
    # writes to the clone work (v0 schema has 'g', not 'grp')
    dst.append(spark.createDataFrame([(9, 9)], "id long, g long"))
    latest = src.clone(str(tmp_path / "dst2"))  # latest DOES carry
    assert latest.constraints() == {"grp_pos": "grp >= 0"}


def test_vacuum_cleans_aged_orphans_only(spark, tmp_path):
    """Files no commit references (a crashed writer's debris) reclaim
    once older than the guard window; fresh ones — possibly an
    in-flight writer — survive, and committed data is untouched."""
    import time as _time

    t = _mk(spark, str(tmp_path / "t"), n=10, parts=1)
    orphan_dir = os.path.join(t.data_dir, "deadbeefcafe")
    os.makedirs(orphan_dir)
    old = os.path.join(orphan_dir, "part-00000-dead.parquet")
    fresh = os.path.join(orphan_dir, "part-00001-live.parquet")
    for p in (old, fresh):
        with open(p, "wb") as f:
            f.write(b"not really parquet")
    stale_t = _time.time() - 8 * 24 * 3600
    os.utime(old, (stale_t, stale_t))
    out = t.vacuum(clean_orphans_hours=7 * 24)
    assert out["orphans_deleted"] >= 1
    assert not os.path.exists(old)
    assert os.path.exists(fresh)  # age-guarded
    assert t.read().count() == 10  # committed files untouched
    # without the flag, orphans are never touched
    out2 = t.vacuum()
    assert out2["orphans_deleted"] == 0
    assert os.path.exists(fresh)


def test_clone_any_version_equals_time_travel(spark, tmp_path):
    """Property over a mixed op history: a clone pinned at version N
    reads exactly what time travel to N reads, for every N, both
    shallow and deep."""
    src = _mk(spark, str(tmp_path / "src"), n=10, parts=2)
    src.append(spark.range(10, 14).select(F.col("id"), F.lit(9).alias("g")))
    src.merge(
        spark.createDataFrame([(1, 77), (99, 77)], "id long, g long"), ["id"]
    )
    src.delete("id >= 12 and id < 14", use_dv=True)
    src.update("id = 0", {"g": F.lit(42)})
    for v in range(src.latest_version() + 1):
        for shallow in (True, False):
            dst = src.clone(
                str(tmp_path / f"c{v}_{int(shallow)}"),
                shallow=shallow,
                version=v,
            )
            want = sorted((r.id, r.g) for r in src.read(version=v).collect())
            got = sorted((r.id, r.g) for r in dst.read().collect())
            assert got == want, f"version {v} shallow={shallow}"


# ---------------------------------------------------------------------------
# CONVERT (Delta's CONVERT TO DELTA analog) — in-place adoption of a
# plain-parquet directory. Scale contract: metadata-only (footer reads,
# no data rewrite), data-skipping stats for free, and every gate that
# keeps an id-free table honest fires loudly.


def _plain_dir(spark, path, n=1000, parts=4):
    spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    ).repartitionByRange(parts, "k").write.parquet(str(path))
    return str(path)


def test_convert_in_place_reads_back_exact(spark, tmp_path):
    src = _plain_dir(spark, tmp_path / "plain")
    before = {(r.k, r.v, r.s) for r in spark.read.parquet(src).collect()}
    t = VersionedTable.convert(spark, src)
    assert t.latest_version() == 0
    assert {(r.k, r.v, r.s) for r in t.read().collect()} == before
    # metadata-only: the v0 commit references the ORIGINAL files in place
    c = t.get_commit(0)
    assert all(os.path.dirname(f) == os.path.abspath(src) for f in c.files)


def test_convert_footer_stats_drive_file_skipping(spark, tmp_path):
    src = _plain_dir(spark, tmp_path / "plain", n=1000, parts=4)
    t = VersionedTable.convert(spark, src)
    c = t.get_commit(0)
    # every file got footer-harvested k-bounds without any data scan
    assert len(c.stats["file_stats"]) == len(c.files)
    assert all("k" in s for s in c.stats["file_stats"].values())
    got = t.read_between("k", 0, 10)
    assert got.count() == 11
    # range-partitioned by k: an 11-key probe must prune to 1 file
    # (asserted through the recorded bounds, the same data read_between
    # prunes with)
    lo_hi = [
        (float(s["k"][0]), float(s["k"][1]))
        for s in c.stats["file_stats"].values()
    ]
    assert sum(1 for lo, hi in lo_hi if lo <= 10 and hi >= 0) == 1


def test_convert_then_mutate_full_lifecycle(spark, tmp_path):
    src = _plain_dir(spark, tmp_path / "plain", n=100)
    t = VersionedTable.convert(spark, src)
    t.append(spark.createDataFrame([(999, 1.0, "x")], "k bigint, v double, s string"))
    t.merge(
        spark.createDataFrame([(0, 42.0, "upd")], "k bigint, v double, s string"),
        ["k"],
    )
    assert t.read().count() == 101
    assert t.read().filter("k = 0").collect()[0].v == 42.0
    # time travel back to the adopted snapshot
    assert t.read(version=0).count() == 100
    # change feed: refuses across the convert commit, works after it
    with pytest.raises(ValueError, match="convert commit"):
        t.change_feed(starting_version=-1).count()
    assert t.change_feed(starting_version=0).count() >= 2


def test_convert_gates(spark, tmp_path):
    src = _plain_dir(spark, tmp_path / "plain", n=50)
    t = VersionedTable.convert(spark, src)
    # id-free schema: rename refuses with upgrade guidance
    with pytest.raises(ValueError, match="field id"):
        t.rename_column("v", "vv")
    # double-convert refuses
    with pytest.raises(RuntimeError, match="already exists"):
        VersionedTable.convert(spark, src)
    # Hive-partitioned layout refuses loudly
    part = tmp_path / "hive"
    spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    ).write.partitionBy("p").parquet(str(part))
    with pytest.raises(ValueError, match="subdirectories"):
        VersionedTable.convert(spark, str(part))
    # empty dir refuses
    empty = tmp_path / "empty"
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet files"):
        VersionedTable.convert(spark, str(empty))


def test_convert_sql_statement(spark, tmp_path):
    from nrtwithdeltalake_spark.pipeline.sqldml import execute_dml

    src = _plain_dir(spark, tmp_path / "plain", n=60)
    res = execute_dml(spark, f"CONVERT TO VERSIONED parquet.`{src}`")
    assert res["version"] == 0
    t = VersionedTable(spark, src)
    assert t.read().count() == 60


def test_convert_vacuum_ownership(spark, tmp_path):
    """Reclamation semantics across both convert modes: in-place
    adoption makes the directory's files TABLE-OWNED (vacuum reclaims
    them once their version expires), while adopting a FOREIGN
    source_dir references files outside the table root — vacuum must
    never delete those (same guard as shallow clones)."""
    # in-place: adopted originals are reclaimable history
    src = _plain_dir(spark, tmp_path / "inplace", n=100)
    t = VersionedTable.convert(spark, src)
    adopted = list(t.get_commit(0).files)
    t.overwrite(
        spark.createDataFrame([(1, 1.0, "new")], "k bigint, v double, s string")
    )
    rep = t.vacuum(retain_last=1)
    assert rep["deleted_files"] >= len(adopted)
    assert all(not os.path.exists(f) for f in adopted)
    assert t.read().count() == 1

    # foreign source_dir: originals survive the same vacuum
    foreign = _plain_dir(spark, tmp_path / "foreign", n=100)
    t2 = VersionedTable.convert(spark, str(tmp_path / "tbl2"), source_dir=foreign)
    adopted2 = list(t2.get_commit(0).files)
    t2.overwrite(
        spark.createDataFrame([(1, 1.0, "new")], "k bigint, v double, s string")
    )
    t2.vacuum(retain_last=1)
    assert all(os.path.exists(f) for f in adopted2)
    # and the foreign dir is still a readable plain-parquet dataset
    assert spark.read.parquet(foreign).count() == 100
