"""The `versioned` Python DataSource: batch reads (snapshot + time
travel + schema evolution), per-file partition parallelism, and the
commit-version-offset change-feed stream, including checkpoint resume."""

from __future__ import annotations

import pytest

from nrtwithdeltalake_spark.pipeline.tables import VersionedTable
from nrtwithdeltalake_spark.sources import datasource as ds


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    ds.register(spark)


def _mk(spark, tmp_path):
    p = str(tmp_path / "t")
    t = VersionedTable.create(
        spark,
        p,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
    )
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    return p, t


def test_batch_read_snapshot_and_time_travel(spark, tmp_path):
    p, t = _mk(spark, tmp_path)
    df = spark.read.format("versioned").option("path", p).load()
    assert sorted((r.id, r.v) for r in df.collect()) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
    ]
    # the scan parallelizes per data file
    assert df.rdd.getNumPartitions() == len(t.get_commit().files)
    v0 = (
        spark.read.format("versioned")
        .option("path", p)
        .option("version", 0)
        .load()
    )
    assert sorted(r.id for r in v0.collect()) == [1, 2]


def test_batch_read_schema_evolution_null_fill(spark, tmp_path):
    p, t = _mk(spark, tmp_path)
    t.add_column("score", "double")
    t.append(
        spark.createDataFrame([(4, "d", 1.5)], "id long, v string, score double")
    )
    df = spark.read.format("versioned").option("path", p).load()
    got = {r.id: r.score for r in df.collect()}
    assert got == {1: None, 2: None, 3: None, 4: 1.5}


def test_stream_changes_offsets_are_commit_versions(spark, tmp_path):
    p, t = _mk(spark, tmp_path)
    ck = str(tmp_path / "ck")
    batches = []

    def run():
        q = (
            spark.readStream.format("versioned")
            .option("path", p)
            .option("feed", "changes")
            .load()
            .writeStream.foreachBatch(
                lambda b, e: batches.append(
                    sorted(
                        (r.id, r._change_type, r._commit_version)
                        for r in b.collect()
                    )
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert batches == [
        [(1, "insert", 0), (2, "insert", 0), (3, "insert", 1)]
    ]
    batches.clear()
    t.delete("id = 1")
    t.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    run()  # checkpoint resume: exactly the two new commits
    flat = sorted(x for b in batches for x in b)
    assert flat == [(1, "delete", 2), (9, "insert", 3)]
    batches.clear()
    run()  # nothing new → no rows
    assert all(not b for b in batches)


def test_stream_requires_changes_feed(spark, tmp_path):
    p, _ = _mk(spark, tmp_path)
    with pytest.raises(Exception, match="feed"):
        (
            spark.readStream.format("versioned")
            .option("path", p)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
