"""SCD Type-2 golden scenario: history-preserving loads over
VersionedTable — versions open/close correctly, replay is a no-op, and
as-of reads reconstruct any past state."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.pipeline import scd2
from nrtwithdeltalake_spark.pipeline.scd2 import (
    IS_CURRENT,
    VALID_FROM,
    VALID_TO,
    scd2_apply,
    scd2_as_of,
    scd2_init,
)

T1, T2, T3 = "2024-01-01 00:00:00", "2024-02-01 00:00:00", "2024-03-01 00:00:00"
KEYS = ["cust_id"]
TRACKED = ["segment", "country"]



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _batch(spark, rows):
    return spark.createDataFrame(rows, "cust_id long, segment string, country string")


@pytest.fixture()
def dim(spark, tmp_path):
    b1 = _batch(
        spark,
        [(1, "retail", "US"), (2, "corp", "DE"), (3, "retail", "FR")],
    )
    return scd2_init(spark, str(tmp_path / "dim"), b1, KEYS, T1)


def test_scd2_initial_load_all_current(spark, dim):
    rows = {r["cust_id"]: r for r in dim.read().collect()}
    assert len(rows) == 3
    assert all(r[IS_CURRENT] for r in rows.values())
    assert all(r[VALID_FROM] == T1 and r[VALID_TO] is None for r in rows.values())


def test_scd2_change_closes_and_inserts(spark, dim):
    b2 = _batch(
        spark,
        [
            (1, "corp", "US"),     # changed (segment)
            (2, "corp", "DE"),     # unchanged
            (4, "retail", "JP"),   # new key
        ],
    )
    res = scd2_apply(dim, b2, KEYS, TRACKED, T2)
    assert res == {"new": 1, "changed": 1, "unchanged": 1, "stale": 0}
    snap = dim.read()
    assert snap.count() == 5  # 3 initial + 1 close stays + 1 new version + 1 new key
    k1 = sorted(
        snap.filter(F.col("cust_id") == 1).collect(),
        key=lambda r: r[VALID_FROM],
    )
    assert [(r["segment"], r[VALID_FROM], r[VALID_TO], r[IS_CURRENT]) for r in k1] == [
        ("retail", T1, T2, False),
        ("corp", T2, None, True),
    ]
    # untouched keys keep a single open version
    assert snap.filter((F.col("cust_id") == 2) & F.col(IS_CURRENT)).count() == 1
    k4 = snap.filter(F.col("cust_id") == 4).collect()
    assert len(k4) == 1 and k4[0][VALID_FROM] == T2 and k4[0][IS_CURRENT]


def test_scd2_replay_is_noop(spark, dim):
    b2 = _batch(spark, [(1, "corp", "US"), (4, "retail", "JP")])
    scd2_apply(dim, b2, KEYS, TRACKED, T2)
    v_after = dim.latest_version()
    before = sorted(map(tuple, dim.read().collect()))
    res = scd2_apply(dim, b2, KEYS, TRACKED, T2)
    assert res["new"] == 0 and res["changed"] == 0
    assert dim.latest_version() == v_after  # no commit at all
    assert sorted(map(tuple, dim.read().collect())) == before


def test_scd2_third_version_and_as_of(spark, dim):
    scd2_apply(dim, _batch(spark, [(1, "corp", "US")]), KEYS, TRACKED, T2)
    scd2_apply(dim, _batch(spark, [(1, "corp", "JP")]), KEYS, TRACKED, T3)
    snap = dim.read()
    hist = sorted(
        snap.filter(F.col("cust_id") == 1).collect(),
        key=lambda r: r[VALID_FROM],
    )
    assert [(r["segment"], r["country"], r[VALID_TO]) for r in hist] == [
        ("retail", "US", T2),
        ("corp", "US", T3),
        ("corp", "JP", None),
    ]
    # as-of reconstruction at each epoch
    at1 = scd2_as_of(snap, "2024-01-15 00:00:00").filter(F.col("cust_id") == 1)
    assert at1.collect()[0]["segment"] == "retail"
    at2 = scd2_as_of(snap, "2024-02-15 00:00:00").filter(F.col("cust_id") == 1)
    assert at2.collect()[0]["country"] == "US"
    at3 = scd2_as_of(snap, T3).filter(F.col("cust_id") == 1)
    assert at3.collect()[0]["country"] == "JP"
    # exactly one version valid per key at any probed instant
    for probe in ("2024-01-15 00:00:00", "2024-02-15 00:00:00", T3):
        counts = (
            scd2_as_of(snap, probe)
            .groupBy("cust_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert counts == 0


def test_scd2_rejects_duplicate_source_keys(spark, dim):
    bad = _batch(spark, [(7, "a", "US"), (7, "b", "US")])
    with pytest.raises(ValueError, match="unique per key"):
        scd2_apply(dim, bad, KEYS, TRACKED, T2)


def test_scd2_same_ts_rechange_is_stale_noop(spark, dim):
    """A differing row whose batch_ts does not advance past the open
    version is stale — dropped, never a backwards close (the
    monotonicity rule)."""
    scd2_apply(dim, _batch(spark, [(1, "corp", "US")]), KEYS, TRACKED, T2)
    v = dim.latest_version()
    res = scd2_apply(dim, _batch(spark, [(1, "corp", "BR")]), KEYS, TRACKED, T2)
    assert res["stale"] == 1 and res["changed"] == 0
    assert dim.latest_version() == v
    cur = dim.read().filter(F.col("cust_id") == 1).filter(F.col(IS_CURRENT))
    assert cur.collect()[0]["country"] == "US"


def test_scd2_stream_two_batches_and_replay(spark, tmp_path):
    """NRT SCD2: two micro-batches through run_scd2_stream build the
    same history the batch API builds, and re-running the stream over
    the same files (fresh checkpoint — a full replay) commits nothing
    new because batch timestamps derive from the data."""
    import datetime
    import os

    from pyspark.sql import functions as F2

    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable
    from nrtwithdeltalake_spark.streaming import nrt

    d = datetime.datetime.fromisoformat
    sdir = str(tmp_path / "src")
    os.makedirs(sdir)
    schema = "cust_id long, segment string, country string, ts timestamp"
    b1 = spark.createDataFrame(
        [
            (1, "retail", "US", d("2024-01-01 00:00:00")),
            (2, "corp", "DE", d("2024-01-01 00:00:00")),
            # two updates for key 1 inside one batch: only the latest
            # (corp@00:30) becomes history
            (1, "mid", "US", d("2024-01-01 00:10:00")),
            (1, "corp", "US", d("2024-01-01 00:30:00")),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")
    tgt = str(tmp_path / "dim")

    def run(ckpt):
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{sdir}/*.parquet")
        )
        nrt.run_scd2_stream(
            stream, tgt, ["cust_id"], ["segment", "country"], "ts",
            str(tmp_path / ckpt),
        )

    run("ckpt1")
    snap1 = VersionedTable(spark, tgt).read()
    k1 = snap1.filter(F2.col("cust_id") == 1).collect()
    assert len(k1) == 1 and k1[0]["segment"] == "corp" and k1[0][IS_CURRENT]

    b2 = spark.createDataFrame(
        [(1, "corp", "JP", d("2024-02-01 00:00:00"))], schema
    )
    b2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    run("ckpt1")  # same checkpoint: only the new file processes
    t = VersionedTable(spark, tgt)
    v_after = t.latest_version()
    hist = sorted(
        t.read().filter(F2.col("cust_id") == 1).collect(),
        key=lambda r: r[VALID_FROM],
    )
    assert [(r["country"], r[VALID_TO] is None) for r in hist] == [
        ("US", False),
        ("JP", True),
    ]
    # full replay from scratch: fresh checkpoint reprocesses every file;
    # data-derived batch timestamps make each apply a no-op
    run("ckpt_replay")
    assert VersionedTable(spark, tgt).latest_version() == v_after
    assert sorted(map(tuple, VersionedTable(spark, tgt).read().collect())) == sorted(
        map(tuple, t.read(v_after).collect())
    )


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.dictionaries(
            st.integers(1, 4), st.integers(0, 3), min_size=1, max_size=4
        ),
        min_size=1,
        max_size=3,
    )
)
def test_scd2_matches_pure_python_fold(spark_global, batches):
    """Property: for ANY sequence of update batches, the table's
    current slice, full version history, and as-of reconstruction at
    every batch instant all equal a trivial python fold of the same
    batches — SCD2 is just that fold, made durable."""
    import tempfile

    spark = spark_global
    ts = [f"2024-0{i + 1}-01 00:00:00" for i in range(len(batches) + 1)]
    init = {1: 99, 2: 99}
    d = tempfile.mkdtemp()
    t = scd2_init(
        spark,
        d + "/dim",
        spark.createDataFrame(
            [(k, v) for k, v in init.items()], "k long, v long"
        ),
        ["k"],
        ts[0],
    )
    # python model: history[k] = [(value, from, to_or_None)]
    hist = {k: [(v, ts[0], None)] for k, v in init.items()}
    for i, b in enumerate(batches):
        bt = ts[i + 1]
        scd2_apply(
            t,
            spark.createDataFrame(list(b.items()), "k long, v long"),
            ["k"],
            ["v"],
            bt,
        )
        for k, v in b.items():
            if k not in hist:
                hist[k] = [(v, bt, None)]
            elif hist[k][-1][0] != v:
                val, frm, _ = hist[k][-1]
                hist[k][-1] = (val, frm, bt)
                hist[k].append((v, bt, None))
    got = sorted(
        (r["k"], r["v"], r[VALID_FROM], r[VALID_TO], r[IS_CURRENT])
        for r in t.read().collect()
    )
    want = sorted(
        (k, v, frm, to, to is None)
        for k, vs in hist.items()
        for (v, frm, to) in vs
    )
    assert got == want
    # as-of at every batch instant matches the model state then
    snap = t.read()
    for i in range(len(batches) + 1):
        probe = ts[i]
        model = {
            k: v
            for k, vs in hist.items()
            for (v, frm, to) in vs
            if frm <= probe and (to is None or to > probe)
        }
        got_asof = {
            r["k"]: r["v"] for r in scd2_as_of(snap, probe).collect()
        }
        assert got_asof == model
