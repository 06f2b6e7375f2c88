"""Incremental OPTIMIZE (`compact(small_file_bytes=...)`) — Delta
OPTIMIZE's actual posture (`optimize.minFileSize`): re-pack ONLY files
below the threshold plus every DV-referenced file (so the commit still
clears all vectors); right-sized files carry through untouched with
their committed stats. At 100 TB a full-rewrite OPTIMIZE is a
non-starter — maintenance must cost O(small-file debt + DV debt), not
O(table)."""

from __future__ import annotations

import os

import pytest

from nrtwithdeltalake_spark.pipeline.sqldml import execute_dml
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _mk(spark, tmp_path, name="t"):
    """One big file (v0 create, 4000 rows) + three small append files
    (20 rows each)."""
    p = str(tmp_path / name)
    big = spark.createDataFrame(
        [(i, f"p{i}") for i in range(4000)], "id bigint, s string"
    ).coalesce(1)
    t = VersionedTable.create(spark, p, big)
    for b in range(3):
        t.append(
            spark.createDataFrame(
                [(10_000 + b * 100 + i, "x") for i in range(20)],
                "id bigint, s string",
            ).coalesce(1)
        )
    return t


def _big_file(t):
    return max(t.get_commit().files, key=os.path.getsize)


def test_small_files_packed_big_file_untouched(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = t.get_commit()
    big = _big_file(t)
    thresh = os.path.getsize(big)  # strictly-below keeps the big file
    v = t.compact(small_file_bytes=thresh)
    c = t.get_commit(v)
    assert big in c.files  # untouched: same path carries
    assert len(c.files) == 2  # big + one packed file
    assert c.stats["files_rewritten"] == 3 and c.stats["files_kept"] == 1
    # the big file's committed stats entry carried verbatim
    assert c.stats["file_stats"][big] == before.stats["file_stats"][big]
    # packed file got fresh footer stats
    packed = next(f for f in c.files if f != big)
    assert packed in c.stats["file_stats"]
    assert t.read().count() == 4000 + 60
    # old versions still read (time travel keeps the small files alive)
    assert t.read(version=before.version).count() == 4000 + 60


def test_dv_referenced_big_file_is_rewritten_and_vectors_clear(spark, tmp_path):
    t = _mk(spark, tmp_path)
    big = _big_file(t)
    t.delete("id = 7", use_dv=True)  # row lives in the big file
    assert t.get_commit().dv_files
    v = t.compact(small_file_bytes=1024)  # below every small file…
    c = t.get_commit(v)
    # …but the DV-referenced big file must still be rewritten, or the
    # cleared vector would resurrect row 7
    assert big not in c.files
    assert c.dv_files == []
    assert t.read().count() == 4000 + 60 - 1
    assert t.read().filter("id = 7").count() == 0


def test_noop_when_no_debt(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.compact()  # full pack first
    v = t.compact(small_file_bytes=1)  # nothing under 1 byte, no DVs
    assert v == v0 == t.latest_version()  # no empty commit published


def test_incremental_refuses_clustering(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="cluster"):
        t.compact(small_file_bytes=1 << 20, cluster_by=["id"])
    with pytest.raises(ValueError, match="cluster"):
        t.compact(small_file_bytes=1 << 20, zorder_by=["id", "s"])


def test_sql_optimize_uses_small_file_property(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqlt")
    big = _big_file(t)
    t.set_properties(
        {"versioned.optimize.smallFileBytes": str(os.path.getsize(big))}
    )
    execute_dml(spark, f"OPTIMIZE versioned.`{t.path}`")
    c = t.get_commit()
    assert big in c.files and len(c.files) == 2  # incremental path ran
    # ZORDER ignores the property: full clustered rewrite
    execute_dml(spark, f"OPTIMIZE versioned.`{t.path}` ZORDER BY (id)")
    assert big not in t.get_commit().files
    assert t.read().count() == 4000 + 60
    with pytest.raises(ValueError):
        t.set_properties({"versioned.optimize.smallFileBytes": "0"})


def test_incremental_compactor_in_mixed_writer_storm(spark, tmp_path):
    """The incremental compactor joins the mixed-writer storm: blind
    appenders and a DV deleter race it on one table. Its OCC guards are
    scoped to the REWRITTEN subset (kept files ride `base.files`), so
    concurrent appends commute while a racing DV commit surfaces and
    retries. Invariant: serial-equivalent final state, deleted rows
    never resurrect, dense version chain."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from nrtwithdeltalake_spark.pipeline.tables import CommitConflictError

    p = str(tmp_path / "storm")
    t = VersionedTable.create(
        spark,
        p,
        spark.createDataFrame(
            [(i, "base") for i in range(40)], "id long, v string"
        ).repartition(4),
    )

    def retry(fn):
        for _ in range(12):
            try:
                return fn()
            except CommitConflictError:
                _time.sleep(0.25)
        raise AssertionError("writer starved")

    def appender(w: int):
        VersionedTable(spark, p).append(
            spark.createDataFrame(
                [(1000 + w * 10 + i, f"a{w}") for i in range(4)],
                "id long, v string",
            )
        )

    def dv_deleter():
        retry(
            lambda: VersionedTable(spark, p).delete(
                "id >= 30 and id < 35", use_dv=True
            )
        )

    def inc_compactor():
        retry(
            lambda: VersionedTable(spark, p).compact(
                target_file_bytes=1 << 20, small_file_bytes=1 << 20
            )
        )

    jobs = [lambda w=w: appender(w) for w in range(2)] + [
        dv_deleter,
        inc_compactor,
    ]
    with ThreadPoolExecutor(max_workers=4) as ex:
        list(ex.map(lambda f: f(), jobs))

    rows = {r.id: r.v for r in VersionedTable(spark, p).read().collect()}
    want = {i: "base" for i in range(40) if not 30 <= i < 35}
    for w in range(2):
        want.update({1000 + w * 10 + i: f"a{w}" for i in range(4)})
    assert rows == want
    versions = [c.version for c in VersionedTable(spark, p).history()]
    assert versions == list(range(len(versions)))


def _mk_ranged(spark, tmp_path, name="rt", n=4000, files=4):
    df = spark.createDataFrame(
        [(i, f"p{i}") for i in range(n)], "id bigint, s string"
    ).repartitionByRange(files, "id")
    return VersionedTable.create(spark, str(tmp_path / name), df)


def test_where_scoped_compact_rewrites_only_matching_files(spark, tmp_path):
    """OPTIMIZE ... WHERE (Delta's scoped OPTIMIZE — how it's actually
    run at scale): only files whose committed [min, max] may hold
    matching rows are rewritten; out-of-range files carry untouched."""
    t = _mk_ranged(spark, tmp_path)
    before = set(t.get_commit().files)
    assert len(before) == 4
    v = t.compact(where=[("id", "<", 1000)])
    c = t.get_commit(v)
    kept = before & set(c.files)
    assert 2 <= len(kept) <= 3  # range boundaries may straddle one file
    assert c.stats["files_rewritten"] == 4 - len(kept)
    assert t.read().count() == 4000
    assert {r.id for r in t.read().filter("id < 10").collect()} == set(range(10))
    # a disjoint range is a no-op (selection empty, no commit)
    assert t.compact(where=[("id", ">=", 99999)]) == v


def test_where_scoped_compact_carries_vectors_for_outside_files(spark, tmp_path):
    """A scoped compact must NOT clear deletion vectors: a vector
    masking a row in an UNSELECTED file keeps masking it, and a vector
    over a SELECTED file is materialized into the replacement with the
    stale entry ignored — no resurrection, no double-delete."""
    t = _mk_ranged(spark, tmp_path)
    t.delete("id = 3500", use_dv=True)  # masked row OUTSIDE the range
    t.delete("id = 5", use_dv=True)  # masked row INSIDE the range
    assert t.get_commit().dv_files
    v = t.compact(where=[("id", "<", 1000)])
    c = t.get_commit(v)
    assert c.dv_files  # carried, not cleared
    assert t.read().count() == 4000 - 2
    assert t.read().filter("id in (5, 3500)").count() == 0
    # unscoped compact afterwards settles the whole DV debt
    t.compact()
    assert not t.get_commit().dv_files
    assert t.read().count() == 4000 - 2


def test_sql_optimize_where(spark, tmp_path):
    t = _mk_ranged(spark, tmp_path, "sqlw")
    before = set(t.get_commit().files)
    execute_dml(spark, f"OPTIMIZE versioned.`{t.path}` WHERE id < 1000")
    kept = before & set(t.get_commit().files)
    assert 0 < len(kept) < 4
    assert t.read().count() == 4000
    # WHERE composes with ZORDER (clustered rewrite of the range)
    execute_dml(
        spark,
        f"OPTIMIZE versioned.`{t.path}` WHERE id >= 2000 AND id < 3000 "
        "ZORDER BY (id)",
    )
    assert t.read().count() == 4000
    from nrtwithdeltalake_spark.pipeline.sqldml import UnsupportedSqlError

    with pytest.raises(UnsupportedSqlError, match="OPTIMIZE WHERE"):
        execute_dml(
            spark, f"OPTIMIZE versioned.`{t.path}` WHERE id < 10 OR id > 20"
        )


def test_merge_probe_range_prunes_candidate_files(spark, tmp_path):
    """The merge touched-file probe pre-prunes its scan set by the
    source batch's key [min, max] against committed file stats — the
    NRT design case where a CT batch's keys cluster in recent ranges,
    so a continuous merge probes the overlap, not the whole table.
    Strictly conservative: results are identical to the unpruned
    probe, and ANY null source key disables pruning (footer min/max
    ignore nulls but merge matches them null-safely)."""
    t = _mk_ranged(spark, tmp_path, "mp")  # 4 ranged files over id 0..3999
    src = spark.createDataFrame(
        [(10, "u10"), (20, "u20")], "id bigint, s string"
    )
    res = t.merge(src, ["id"])
    assert res["probe_candidate_files"] == 1  # only the 0..~1000 file
    rows = {r.id: r.s for r in t.read().filter("id in (10, 20, 3000)").collect()}
    assert rows == {10: "u10", 20: "u20", 3000: "p3000"}

    # out-of-range keys: probe set empty, pure insert, nothing rewritten
    before = set(t.get_commit().files)
    res = t.merge(
        spark.createDataFrame([(99999, "new")], "id bigint, s string"),
        ["id"],
    )
    assert res["probe_candidate_files"] == 0
    assert before <= set(t.get_commit().files)
    assert t.read().filter("id = 99999").count() == 1

    # a NULL source key disables pruning — and the null-keyed target
    # row (living in a file far from the batch's numeric range) still
    # matches exactly once, no duplicate
    t.append(
        spark.createDataFrame([(None, "null-row")], "id bigint, s string")
    )
    res = t.merge(
        spark.createDataFrame(
            [(None, "null-upd"), (15, "u15")], "id bigint, s string"
        ),
        ["id"],
    )
    assert res["probe_candidate_files"] == len(t.get_commit(res["version"] - 1).files)
    nulls = t.read().filter("id is null").collect()
    assert [r.s for r in nulls] == ["null-upd"]
    assert t.read().filter("id = 15").collect()[0].s == "u15"


def test_merge_probe_nan_key_disables_pruning(spark, tmp_path):
    """A NaN merge key poisons the source [min, max] bounds (F.max
    returns NaN when any value is NaN, and NaN compares False against
    every file stat) — pruning on that key must be SKIPPED, not
    applied, or every candidate file is wrongly dropped and the merge
    duplicates matched rows instead of updating them."""
    df = spark.createDataFrame(
        [(float(i), f"p{i}") for i in range(4000)], "k double, s string"
    ).repartitionByRange(4, "k")
    t = VersionedTable.create(spark, str(tmp_path / "nan"), df)
    src = spark.createDataFrame(
        [(float("nan"), "nan-row"), (10.0, "u10")], "k double, s string"
    )
    res = t.merge(src, ["k"])
    # NaN bound ⇒ no pruning: every file stays a probe candidate
    assert res["probe_candidate_files"] == len(
        t.get_commit(res["version"] - 1).files
    )
    # the finite key UPDATED (not duplicated) — the r10 defect would
    # have pruned all files and inserted a second k=10.0 row
    k10 = t.read().filter("k = 10.0").collect()
    assert len(k10) == 1 and k10[0].s == "u10"
    assert t.read().filter("isnan(k)").count() == 1
    assert t.read().count() == 4001

    # second NaN batch: Spark joins treat NaN = NaN, so the NaN row
    # must UPDATE in place, which requires its file to survive pruning
    res = t.merge(
        spark.createDataFrame([(float("nan"), "nan-upd")], "k double, s string"),
        ["k"],
    )
    nan_rows = t.read().filter("isnan(k)").collect()
    assert [r.s for r in nan_rows] == ["nan-upd"]
    assert t.read().count() == 4001


def test_unreadable_dv_sidecar_aborts_compact(spark, tmp_path):
    """An unreadable deletion-vector sidecar must abort maintenance
    loudly: continuing would commit dv_files=[] without rewriting that
    sidecar's referenced files, silently resurrecting deleted rows."""
    t = _mk_ranged(spark, tmp_path, "dvabort")
    t.delete("id = 5", use_dv=True)
    c = t.get_commit()
    assert c.dv_files
    os.rename(c.dv_files[0], c.dv_files[0] + ".gone")
    with pytest.raises(RuntimeError, match="deletion-vector sidecar"):
        t.compact(small_file_bytes=1 << 30)
    # restore ⇒ maintenance proceeds and settles the DV debt
    os.rename(c.dv_files[0] + ".gone", c.dv_files[0])
    t.compact(small_file_bytes=1 << 30)
    assert not t.get_commit().dv_files
    assert t.read().filter("id = 5").count() == 0
    assert t.read().count() == 4000 - 1


def test_compact_occ_retry_reuses_footer_harvest(spark, tmp_path, monkeypatch):
    """OCC retries re-attempt only the commit write; the footer/bloom
    harvest of the (unchanged) packed files must run once, not once
    per attempt — at 10⁵ files re-reading every packed footer per
    rebase turns a cheap retry into a second compaction."""
    t = _mk(spark, tmp_path, "hoist")
    calls = {"n": 0}
    orig = VersionedTable._with_new_file_stats

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(VersionedTable, "_with_new_file_stats", counting)
    orig_write = VersionedTable._write_commit
    state = {"raced": False}

    def racing_write(self, commit, *a, **kw):
        # inject ONE concurrent append between harvest and publish —
        # first attempt loses the version slot and must rebase
        if commit.op == "compact" and not state["raced"]:
            state["raced"] = True
            t2 = VersionedTable(self.spark, self.path)
            t2.append(
                self.spark.createDataFrame(
                    [(77777, "race")], "id bigint, s string"
                ).coalesce(1)
            )
        return orig_write(self, commit, *a, **kw)

    monkeypatch.setattr(VersionedTable, "_write_commit", racing_write)
    calls["n"] = 0
    t.compact(small_file_bytes=1 << 30)
    assert state["raced"]  # the retry path actually exercised
    # one harvest of the packed files + whatever the racing append did
    # (append harvests its own new file once) — compact itself must
    # not re-harvest on the retry
    assert calls["n"] <= 2
    assert t.read().filter("id = 77777").count() == 1
    assert t.read().count() == 4000 + 60 + 1
