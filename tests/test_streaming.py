"""Streaming tests (SURVEY.md §5 item 4): every streaming window query is
asserted against a batch recomputation of the same windows — the batch
DataFrame API is the oracle."""

from __future__ import annotations

import pytest

import os

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.sources.catalog import load_table
from nrtwithdeltalake_spark.streaming import nrt
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _run_to_memory(spark, stream_df, name, output_mode="complete"):
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_matches_batch(spark, sf_dir):
    got = _run_to_memory(
        spark, nrt.tumbling_counts(nrt.stream_events(spark, sf_dir)), "t_tumb"
    ).collect()
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").start.alias("w_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .collect()
    )
    assert sorted((r.w_start, r.event_type, r.n, r.sum_value) for r in got) == sorted(
        (r.w_start, r.event_type, r.n, r.sum_value) for r in want
    )


def test_sliding_stream_matches_batch(spark, sf_dir):
    got = _run_to_memory(
        spark, nrt.sliding_counts(nrt.stream_events(spark, sf_dir)), "t_slide"
    ).collect()
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("w_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted((r.w_start, r.event_type, r.n) for r in got) == sorted(
        (r.w_start, r.event_type, r.n) for r in want
    )
    # every event lands in exactly 4 sliding windows
    assert sum(r.n for r in got) == 4 * ev.count()


def test_session_stream_has_valid_sessions(spark, sf_dir):
    got = _run_to_memory(
        spark, nrt.session_counts(nrt.stream_events(spark, sf_dir)), "t_sess"
    ).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_events for r in got) == ev.count()
    assert all(r.sess_end > r.sess_start for r in got)
    # session count per user must equal the batch gap-based sessionization
    from nrtwithdeltalake_spark.operators.relational import q_sessionize

    want = {r.user_id: r.n_sessions for r in q_sessionize(spark, sf_dir).collect()}
    got_counts: dict = {}
    for r in got:
        got_counts[r.user_id] = got_counts.get(r.user_id, 0) + 1
    assert got_counts == want


def test_late_data_dropped_by_watermark(spark, tmp_path):
    """Rows older than the watermark delay must be dropped once the
    watermark has advanced past them (two micro-batches via file source)."""
    import datetime

    d = datetime.datetime.fromisoformat
    sdir = str(tmp_path / "stream_src")
    os.makedirs(sdir)
    batch1 = spark.createDataFrame(
        [
            (1, d("2024-01-01 10:05:00"), 1, "click", 1.0, "{}"),
            (2, d("2024-01-01 12:00:00"), 1, "click", 1.0, "{}"),  # advances wm
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    batch2 = spark.createDataFrame(
        [(3, d("2024-01-01 10:10:00"), 1, "click", 1.0, "{}")],  # late by ~2h
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    # one file per batch: with maxFilesPerTrigger=1, a multi-file batch1
    # could deliver the 12:00 row first and make 10:05 late within batch1
    batch1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")

    agg = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sdir}/*.parquet")
        .withWatermark("ts", "30 minutes")
        # group by the window struct itself — projecting .start inside the
        # groupBy severs watermark propagation and append mode is rejected
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w").start.alias("w_start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    batch2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    q.processAllAvailable()
    q.stop()
    rows = {r.w_start: r.n for r in spark.sql("SELECT * FROM t_late").collect()}
    # append mode emits only finalized windows: the 10:00 window closed when
    # the watermark passed 11:00, WITHOUT the late event_id=3
    assert rows.get(d("2024-01-01 10:00:00")) == 1


def test_foreachbatch_merge_sink(spark, sf_dir, tmp_path):
    """The NRT loop: stream → window agg → foreachBatch merge into a
    versioned table; final table equals the batch aggregation."""
    tgt = str(tmp_path / "silver_windows")
    nrt.run_stream_to_table(
        nrt.tumbling_counts(nrt.stream_events(spark, sf_dir)),
        tgt,
        keys=["w_start", "event_type"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    got = {
        (r.w_start, r.event_type): (r.n, r.sum_value)
        for r in VersionedTable(spark, tgt).read().collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        (r.w_start, r.event_type): (r.n, r.sum_value)
        for r in ev.groupBy(
            F.window("ts", "1 hour").start.alias("w_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
        )
        .collect()
    }
    assert got == want


def test_stateful_sessions_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful sessionization: a gap-exceeding event closes the
    prior session (emitted in-stream); timeouts close idle keys once the
    watermark passes last_ts + gap."""
    import datetime as dt

    sdir = str(tmp_path / "src")
    os.makedirs(sdir, exist_ok=True)

    def d(s):
        return dt.datetime.fromisoformat(s)

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batch1 = spark.createDataFrame(
        [
            (1, d("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
            (2, d("2024-01-01 10:10:00"), 1, "click", 1.0, "{}"),
            (3, d("2024-01-01 10:05:00"), 2, "view", 1.0, "{}"),
        ],
        schema,
    )
    batch2 = spark.createDataFrame(
        [(4, d("2024-01-01 13:00:00"), 1, "click", 1.0, "{}")], schema
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sdir}/*.parquet")
    )
    q = (
        nrt.stateful_sessions(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    batch2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM t_sess_state").collect()
    sess = {(r.user_id, r.sess_start, r.sess_end, r.n_events) for r in rows}
    # user 1's first session closed by the 13:00 event (gap > 30 min)
    assert (1, d("2024-01-01 10:00:00"), d("2024-01-01 10:10:00"), 2) in sess
    # user 2's idle session closed by event-time timeout (watermark at
    # 12:30 > 10:05 + gap)
    assert (2, d("2024-01-01 10:05:00"), d("2024-01-01 10:05:00"), 1) in sess
    assert all(r.sess_start <= r.sess_end and r.n_events >= 1 for r in rows)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Clicks joined to purchases of the same user within 30 minutes —
    streamed result must equal the batch join."""
    clicks = nrt.stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    purch = nrt.stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    got = _run_to_memory(
        spark,
        nrt.stream_stream_join(clicks, purch),
        "t_ssj",
        output_mode="append",
    ).collect()

    ev = load_table(spark, sf_dir, "events")
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("left_id"),
        F.col("ts").cast("timestamp").alias("lt"),
    )
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("right_id"),
        F.col("ts").cast("timestamp").alias("rt"),
    )
    want = (
        bc.join(bp, "u")
        .filter(
            (F.col("rt") >= F.col("lt"))
            & (F.col("rt") <= F.col("lt") + F.expr("INTERVAL 30 MINUTES"))
        )
        .collect()
    )
    assert len(got) > 0
    assert sorted((r.left_id, r.right_id) for r in got) == sorted(
        (r.left_id, r.right_id) for r in want
    )


def test_cdf_stream_end_to_end_nrt(spark, tmp_path):
    """The full NRT loop with no scheduler: bronze commits stream through
    the change feed into a silver merge; silver converges to bronze's
    latest state after each micro-batch."""
    bronze_path = str(tmp_path / "bronze")
    silver_path = str(tmp_path / "silver")

    df0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, amt double"
    )
    bronze = VersionedTable.create(spark, bronze_path, df0)

    stream = (
        nrt.stream_change_feed(spark, bronze_path)
        # CDC consumers replicating state take new-state rows only
        .filter(F.col("_change_type") != "update_preimage")
        .drop("_change_type")
    )

    def sink(batch_df, epoch_id):
        if not batch_df.take(1):
            return
        if VersionedTable.exists(silver_path):
            VersionedTable(spark, silver_path).merge(batch_df, ["k"])
        else:
            VersionedTable.create(spark, silver_path, batch_df)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    got0 = {(r.k, r.name, r.amt) for r in VersionedTable(spark, silver_path).read().collect()}
    assert got0 == {(1, "a", 10.0), (2, "b", 20.0)}

    # bronze upsert: update k=2, insert k=3 → streams into silver
    bronze.merge(
        spark.createDataFrame(
            [(2, "b2", 25.0), (3, "c", 30.0)], "k long, name string, amt double"
        ),
        ["k"],
    )
    q.processAllAvailable()
    q.stop()
    got1 = {(r.k, r.name, r.amt) for r in VersionedTable(spark, silver_path).read().collect()}
    assert got1 == {(1, "a", 10.0), (2, "b2", 25.0), (3, "c", 30.0)}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """stream_dedup: a replayed event_id inside the watermark window is
    emitted once; state for expired keys is dropped (bounded-state
    at-least-once → exactly-once guard)."""
    import datetime

    d = datetime.datetime.fromisoformat
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    sdir = str(tmp_path / "dd_src")
    os.makedirs(sdir)
    batch1 = spark.createDataFrame(
        [
            (1, d("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
            (2, d("2024-01-01 10:05:00"), 1, "click", 1.0, "{}"),
        ],
        schema,
    )
    # duplicate of event 1 (redelivery) + one new event
    batch2 = spark.createDataFrame(
        [
            (1, d("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
            (3, d("2024-01-01 10:20:00"), 1, "click", 1.0, "{}"),
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")

    deduped = nrt.stream_dedup(
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sdir}/*.parquet"),
        within="30 minutes",
    ).select("event_id")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .start()
    )
    q.processAllAvailable()
    batch2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    q.processAllAvailable()
    q.stop()
    got = sorted(r.event_id for r in spark.sql("SELECT * FROM t_dedup").collect())
    assert got == [1, 2, 3], got


def test_rollup_stream_refreshes_on_commits(spark, tmp_path):
    """run_rollup_stream: commits to the base table drive the continuous
    aggregate to the exact full-recompute state, via the CDF file tail."""
    from nrtwithdeltalake_spark.pipeline.rollup import IncrementalRollup

    base = VersionedTable.create(
        spark,
        str(tmp_path / "rbase"),
        spark.createDataFrame(
            [(1, "a", 2.0), (2, "b", 3.0)], "id long, grp string, v double"
        ),
    )
    base.append(
        spark.createDataFrame([(3, "a", 5.0)], "id long, grp string, v double")
    )
    roll = IncrementalRollup(
        spark,
        base,
        str(tmp_path / "rroll"),
        ["grp"],
        {"n": lambda: F.count(F.lit(1))},
    )
    nrt.run_rollup_stream(roll, str(tmp_path / "rckpt"))
    got = {r.grp: r.n for r in roll.read().collect()}
    assert got == {"a": 2, "b": 1}, got
    assert roll.last_refreshed_version() == base.latest_version()

    # a new commit, a new availableNow pass: rollup follows
    base.merge(
        spark.createDataFrame([(2, "b", 9.0, "D")], "id long, grp string, v double, op string"),
        keys=["id"],
        delete_condition="op = 'D'",
        exclude_cols=["op"],
    )
    nrt.run_rollup_stream(roll, str(tmp_path / "rckpt"))
    got = {r.grp: r.n for r in roll.read().collect()}
    assert got == {"a": 2}, got


def test_checksum_stream_tracks_commits(spark, tmp_path):
    """run_checksum_stream: every base commit drives the maintained
    fingerprint to the exact direct-recompute state via the CDF tail."""
    from nrtwithdeltalake_spark.pipeline.checksum_view import IncrementalChecksum

    base = VersionedTable.create(
        spark,
        str(tmp_path / "cbase"),
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
    )
    base.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    cs = IncrementalChecksum(spark, base, str(tmp_path / "ccs"))
    nrt.run_checksum_stream(cs, str(tmp_path / "cckpt"))
    assert cs.current() == cs.compute_now()
    assert cs.last_refreshed_version() == base.latest_version()

    base.merge(
        spark.createDataFrame([(2, "b2", "U"), (1, "a", "D")], "id long, v string, op string"),
        keys=["id"],
        delete_condition="op = 'D'",
        exclude_cols=["op"],
    )
    nrt.run_checksum_stream(cs, str(tmp_path / "cckpt"))
    assert cs.current() == cs.compute_now()
    assert cs.current()[0] == 2


def test_stream_enrich_matches_batch_join(spark, sf_dir):
    """Stream-static broadcast enrichment ≡ the same batch join, and the
    stream side is stateless (append mode, no watermark needed)."""
    dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_total"))
    )
    enriched = nrt.stream_enrich(
        nrt.stream_events(spark, sf_dir), dim, on="user_id"
    ).select("event_id", "user_id", "user_total")
    got = _run_to_memory(spark, enriched, "t_enrich", output_mode="append")
    want = (
        load_table(spark, sf_dir, "events")
        .join(dim, "user_id")
        .select("event_id", "user_id", "user_total")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_stream_stream_left_outer_join(spark, sf_dir):
    """leftOuter stream-stream join: matched pairs equal the inner
    batch join; unmatched clicks emit with null right columns once the
    watermark closes their window, and every emitted unmatched click
    truly has no purchase within the bound."""
    clicks = nrt.stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    purch = nrt.stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    got = _run_to_memory(
        spark,
        nrt.stream_stream_join(clicks, purch, how="leftOuter"),
        "t_ssj_lo",
        output_mode="append",
    ).collect()

    ev = load_table(spark, sf_dir, "events")
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("left_id"),
        F.col("ts").cast("timestamp").alias("lt"),
    )
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("right_id"),
        F.col("ts").cast("timestamp").alias("rt"),
    )
    want_pairs = sorted(
        (r.left_id, r.right_id)
        for r in bc.join(bp, "u")
        .filter(
            (F.col("rt") >= F.col("lt"))
            & (F.col("rt") <= F.col("lt") + F.expr("INTERVAL 30 MINUTES"))
        )
        .collect()
    )
    matched = sorted(
        (r.left_id, r.right_id) for r in got if r.right_id is not None
    )
    assert matched == want_pairs, "matched pairs must equal the inner join"

    # every emitted null-right row is a true negative in the batch join
    matched_left = {p[0] for p in want_pairs}
    unmatched = [r.left_id for r in got if r.right_id is None]
    assert unmatched, "outer join emitted no unmatched rows"
    assert not (set(unmatched) & matched_left)
    # and no click is emitted twice as unmatched
    assert len(unmatched) == len(set(unmatched))


def test_stream_stream_join_honors_within_parameter(spark, sf_dir):
    """ADVICE r1: the join's time bound must track `within` (it was once
    hardcoded to 30 minutes) — with a 5-minute bound the streamed result
    must equal the 5-minute batch join, not the 30-minute one."""
    clicks = nrt.stream_events(spark, sf_dir).filter(F.col("event_type") == "click")
    purch = nrt.stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    got = _run_to_memory(
        spark,
        nrt.stream_stream_join(clicks, purch, within="5 minutes"),
        "t_ssj_5m",
        output_mode="append",
    ).collect()

    ev = load_table(spark, sf_dir, "events")
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("left_id"),
        F.col("ts").cast("timestamp").alias("lt"),
    )
    bp = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("right_id"),
        F.col("ts").cast("timestamp").alias("rt"),
    )

    def pairs(bound):
        return sorted(
            (r.left_id, r.right_id)
            for r in bc.join(bp, "u")
            .filter(
                (F.col("rt") >= F.col("lt"))
                & (F.col("rt") <= F.col("lt") + F.expr(f"INTERVAL {bound}"))
            )
            .collect()
        )

    want5, want30 = pairs("5 MINUTES"), pairs("30 MINUTES")
    assert want5 != want30, "fixture can't distinguish the bounds"
    assert sorted((r.left_id, r.right_id) for r in got) == want5


def test_transform_with_state_running_profiles(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 stateful API): per-user
    profiles accumulate across micro-batches; the last emission per key
    must equal a batch recomputation over all batches.

    The TWS python worker talks to the JVM state server over protobuf;
    _protobuf_compat.ensure_protobuf() (invoked by build_spark, i.e. by
    the session fixture) locates a public runtime when none is
    pip-installed. Only if none can be found anywhere does this gate
    skip. TWS also requires the RocksDB state store (named column
    families), set per-query below."""
    import datetime as dt

    import pytest

    from nrtwithdeltalake_spark._protobuf_compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime found for the TWS worker")

    from nrtwithdeltalake_spark.streaming import tws

    def d(s):
        return dt.datetime.fromisoformat(s)

    sdir = str(tmp_path / "src")
    os.makedirs(sdir, exist_ok=True)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    batch1 = spark.createDataFrame(
        [
            (1, d("2024-01-01 10:00:00"), 1, "click", 2.0, "{}"),
            (2, d("2024-01-01 10:10:00"), 1, "view", 3.0, "{}"),
            (3, d("2024-01-01 10:05:00"), 2, "click", 5.0, "{}"),
        ],
        schema,
    )
    batch2 = spark.createDataFrame(
        [
            (4, d("2024-01-01 11:00:00"), 1, "buy", 7.0, "{}"),
            (5, d("2024-01-01 09:00:00"), 3, "click", 1.0, "{}"),
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")

    rows = []

    def run_once():
        """One availableNow run against the shared checkpoint: drains
        what's there, then self-stops — the second run proves TWS state
        survives a checkpointed restart. (availableNow, not
        processAllAvailable: a free-running stateful query fires empty
        micro-batches continuously, each paying state-checkpoint cost;
        foreachBatch, not the memory sink, which refuses checkpoint
        recovery.)"""
        stream = spark.readStream.schema(batch1.schema).parquet(
            f"{sdir}/*.parquet"
        )
        with tws.rocksdb_state(spark):
            q = (
                tws.running_profiles(stream)
                .writeStream.outputMode("update")
                .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
                .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
                .trigger(availableNow=True)
                .start()
            )
        assert q.awaitTermination(300), "TWS micro-batch did not finish"

    run_once()
    batch2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    run_once()
    # latest emission per user = final profile
    final = {}
    for r in rows:
        cur = final.get(r.user_id)
        if cur is None or r.n_events >= cur.n_events:
            final[r.user_id] = r
    want = {
        u: (n, t, last)
        for u, n, t, last in batch1.unionAll(batch2)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("t"),
            F.max("ts").alias("last"),
        )
        .collect()
    }
    assert set(final) == set(want)
    for u, r in final.items():
        n, t, last = want[u]
        assert (r.n_events, r.total_value, r.last_seen) == (n, t, last), u


def test_transform_with_state_ttl_expires_state(spark, tmp_path):
    """Engine-enforced state TTL: a key's profile written with a 1 ms
    TTL is gone by the next micro-batch, so the second batch restarts
    the count at 1 instead of accumulating — the bounded-state story a
    100 TB/day stream needs, executed for real."""
    import datetime as dt
    import time as _time

    import pytest

    from nrtwithdeltalake_spark._protobuf_compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime found for the TWS worker")

    from nrtwithdeltalake_spark.streaming import tws

    def d(s):
        return dt.datetime.fromisoformat(s)

    sdir = str(tmp_path / "src_ttl")
    os.makedirs(sdir, exist_ok=True)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    b1 = spark.createDataFrame(
        [(1, d("2024-01-01 10:00:00"), 1, "click", 2.0, "{}")], schema
    )
    b2 = spark.createDataFrame(
        [(2, d("2024-01-01 11:00:00"), 1, "buy", 7.0, "{}")], schema
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")

    rows = []

    def run_one_batch():
        """TTL requires processingTime timeMode, under which TWS asks
        for another batch on EVERY trigger — availableNow never
        terminates and processAllAvailable never latches quiescence.
        Trigger.Once runs exactly one micro-batch and stops, which is
        precisely what a deterministic expiry test needs."""
        stream = spark.readStream.schema(b1.schema).parquet(
            f"{sdir}/*.parquet"
        )
        with tws.rocksdb_state(spark):
            q = (
                tws.running_profiles(stream, ttl_ms=1)
                .writeStream.outputMode("update")
                .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
                .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
                .trigger(once=True)
                .start()
            )
        assert q.awaitTermination(300), "TWS micro-batch did not finish"

    run_one_batch()
    _time.sleep(2)  # let the 1 ms TTL lapse in wall-clock time
    b2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    run_one_batch()

    per_batch = [
        (r.n_events, r.total_value) for r in rows if r.user_id == 1
    ]
    assert per_batch[0] == (1, 2.0)
    # state expired between batches: the second emission restarts at 1
    # (an un-TTL'd profile would read (2, 9.0))
    assert per_batch[-1] == (1, 7.0), per_batch


def test_transform_with_state_plan_builds(spark, tmp_path):
    """TWS plan construction needs no protobuf (worker-only dependency):
    the streaming plan must analyze with the declared output schema."""
    import os as _os

    from nrtwithdeltalake_spark.streaming import tws

    sdir = str(tmp_path / "src_plan")
    _os.makedirs(sdir, exist_ok=True)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
        f"{sdir}/b0.parquet"
    )
    stream = spark.readStream.schema(schema).parquet(f"{sdir}/*.parquet")
    df = tws.running_profiles(stream, ttl_ms=3600_000)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
        "last_seen",
    ]


def test_dedup_ingest_stream_gate(spark, tmp_path):
    """Dedup-at-ingest: micro-batch 1 bootstraps corpus + index
    (intra-batch exact dup dropped); batch 2's duplicate of a batch-1
    doc is rejected while its novel doc lands; the final corpus has no
    duplicate texts."""
    from nrtwithdeltalake_spark.streaming import dedup_stream

    sdir = str(tmp_path / "docs_src")
    os.makedirs(sdir, exist_ok=True)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b1 = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s1", 35),
            (2, "one two three four five six seven", "en", "s1", 33),
            (3, "alpha beta gamma delta epsilon zeta", "en", "s2", 35),  # dup of 1
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [
            (10, "one two three four five six seven", "en", "s3", 33),  # dup of 2
            (11, "totally novel content words here now", "en", "s3", 36),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")

    corpus = str(tmp_path / "corpus")
    idx_root = str(tmp_path / "dedup_index")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sdir}/*.parquet")
    )
    dedup_stream.run_dedup_ingest(
        stream, corpus, idx_root, str(tmp_path / "ckpt_dedup")
    )
    got1 = {r.doc_id for r in VersionedTable(spark, corpus).read().collect()}
    assert got1 == {1, 2}  # intra-batch dup 3 dropped at bootstrap

    b2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{sdir}/*.parquet")
    )
    dedup_stream.run_dedup_ingest(
        stream, corpus, idx_root, str(tmp_path / "ckpt_dedup")
    )
    rows = VersionedTable(spark, corpus).read().collect()
    assert {r.doc_id for r in rows} == {1, 2, 11}  # 10 rejected as dup of 2
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts))  # invariant: no duplicate text


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_dedup_ingest_intra_batch_steady_state(spark, tmp_path):
    """A NON-bootstrap micro-batch containing an exact-dup pair and a
    near-dup pair of brand-new texts must still yield one corpus row per
    group (previously only the bootstrap branch intra-batch deduped)."""
    from nrtwithdeltalake_spark.streaming import dedup_stream

    corpus = str(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")
    b1 = _mkdocs(
        spark, [(1, "alpha beta gamma delta epsilon zeta", "en", "s1", 35)]
    )
    dedup_stream.dedup_ingest_batch(b1, corpus, idx_root)

    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(15)) + " CHANGED " + " ".join(
        f"w{i}" for i in range(16, 30)
    )
    b2 = _mkdocs(
        spark,
        [
            (20, "one two three four five six seven", "en", "s3", 33),
            (21, "one two three four five six seven", "en", "s3", 33),  # exact dup of 20
            (22, base, "en", "s3", len(base)),
            (23, near, "en", "s3", len(near)),  # near dup of 22
            (24, "alpha beta gamma delta epsilon zeta", "en", "s3", 35),  # dup of corpus 1
        ],
    )
    dedup_stream.dedup_ingest_batch(b2, corpus, idx_root)
    rows = VersionedTable(spark, corpus).read().collect()
    assert {r.doc_id for r in rows} == {1, 20, 22}
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts))


def test_dedup_ingest_replay_idempotent_full_commit(spark, tmp_path):
    """Replaying a fully-committed micro-batch (checkpoint lost /
    foreachBatch redelivery) adds no rows to corpus or index."""
    from nrtwithdeltalake_spark.streaming import dedup_stream

    corpus = str(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")
    paths = dedup_stream.index_paths(idx_root)
    b1 = _mkdocs(
        spark, [(1, "alpha beta gamma delta epsilon zeta", "en", "s1", 35)]
    )
    b2 = _mkdocs(
        spark,
        [
            (10, "one two three four five six seven", "en", "s3", 33),
            (11, "totally novel content words here now", "en", "s3", 36),
        ],
    )
    dedup_stream.dedup_ingest_batch(b1, corpus, idx_root)
    dedup_stream.dedup_ingest_batch(b2, corpus, idx_root)
    before = {
        k: VersionedTable(spark, p).read().count() for k, p in paths.items()
    }
    before["corpus"] = VersionedTable(spark, corpus).read().count()
    dedup_stream.dedup_ingest_batch(b2, corpus, idx_root)  # replay
    after = {
        k: VersionedTable(spark, p).read().count() for k, p in paths.items()
    }
    after["corpus"] = VersionedTable(spark, corpus).read().count()
    assert after == before


def test_dedup_ingest_recovers_partial_append(spark, tmp_path):
    """Crash between the exact-index append and the rest: replay must
    complete sigs/bands/corpus for the interrupted docs exactly once
    (the self-match recovery path)."""
    from nrtwithdeltalake_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )
    from nrtwithdeltalake_spark.streaming import dedup_stream

    corpus = str(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")
    paths = dedup_stream.index_paths(idx_root)
    b1 = _mkdocs(
        spark, [(1, "alpha beta gamma delta epsilon zeta", "en", "s1", 35)]
    )
    dedup_stream.dedup_ingest_batch(b1, corpus, idx_root)

    b2 = _mkdocs(
        spark,
        [
            (10, "one two three four five six seven", "en", "s3", 33),
            (11, "totally novel content words here now", "en", "s3", 36),
        ],
    )
    # simulate the interrupted attempt: exact-index append lands, crash
    index = {k: VersionedTable(spark, p).read() for k, p in paths.items()}
    novel = dedup_stream.intra_batch_dedup(
        dedup_stream.select_novel(b2, incremental_dedup(b2, index))
    )
    VersionedTable(spark, paths["exact"]).append(build_dedup_index(novel)["exact"])

    dedup_stream.dedup_ingest_batch(b2, corpus, idx_root)  # replay
    crows = VersionedTable(spark, corpus).read().collect()
    assert {r.doc_id for r in crows} == {1, 10, 11}
    assert len(crows) == 3  # exactly once
    sigs = VersionedTable(spark, paths["sigs"]).read()
    assert sigs.filter(F.col("corpus_id").isin([10, 11])).count() == 2
    exact = VersionedTable(spark, paths["exact"]).read()
    assert exact.count() == 3  # one row per corpus doc, no double-append
    bands = VersionedTable(spark, paths["bands"]).read()
    assert (
        bands.filter(F.col("corpus_id").isin([10, 11]))
        .select("corpus_id")
        .distinct()
        .count()
        == 2
    )


def test_joinview_stream_refreshes_on_either_side(spark, tmp_path):
    """run_joinview_stream: commits on EITHER base table drive the
    enriched view to the exact full-re-join state via the union CDF
    tail; the (fact, dim) watermark pair advances with each pass."""
    from nrtwithdeltalake_spark.pipeline.joinview import IncrementalJoinView

    fact = VersionedTable.create(
        spark,
        str(tmp_path / "jfact"),
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 20, 2.0)], "id long, fk long, v double"
        ),
    )
    dim = VersionedTable.create(
        spark,
        str(tmp_path / "jdim"),
        spark.createDataFrame([(10, "ten"), (20, "twenty")], "dk long, label string"),
    )
    view = IncrementalJoinView(
        spark,
        fact,
        dim,
        str(tmp_path / "jview"),
        fact_pk=["id"],
        fact_fk=["fk"],
        dim_key=["dk"],
        how="inner",
    )
    ckpt = str(tmp_path / "jckpt")
    nrt.run_joinview_stream(view, ckpt)
    assert {r.id: r.label for r in view.read().collect()} == {
        1: "ten",
        2: "twenty",
    }

    # fact-side commit
    fact.append(
        spark.createDataFrame([(3, 10, 3.0)], "id long, fk long, v double")
    )
    nrt.run_joinview_stream(view, ckpt)
    assert {r.id for r in view.read().collect()} == {1, 2, 3}

    # dim-side commit: trickle-down through the stream loop
    dim.merge(
        spark.createDataFrame([(10, "TEN")], "dk long, label string"),
        keys=["dk"],
    )
    nrt.run_joinview_stream(view, ckpt)
    labels = {r.id: r.label for r in view.read().collect()}
    assert labels[1] == "TEN" and labels[3] == "TEN"
    assert view.reflected_versions() == (
        fact.latest_version(),
        dim.latest_version(),
    )


def test_dedup_bands_mirror_join_no_index_shuffle(spark, tmp_path):
    """VERDICT r6 item: the steady-state classify join probes the
    BUCKETED bands mirror — with broadcast disabled, the join plans
    exactly ONE exchange (the small batch side); the corpus index side
    arrives bucket-partitioned on (band, bkey) with no reshuffle. Also
    pins mirror ⊇ authoritative-versioned-bands after multiple batches
    (superset is the safe direction: extras die in the sig verify)."""
    from nrtwithdeltalake_spark.plans import inspect
    from nrtwithdeltalake_spark.streaming import dedup_stream

    corpus = str(tmp_path / "corpus")
    idx_root = str(tmp_path / "idx")
    mirror = dedup_stream.bands_mirror_name(idx_root)
    try:
        b1 = _mkdocs(
            spark, [(1, "alpha beta gamma delta epsilon zeta", "en", "s1", 35)]
        )
        dedup_stream.dedup_ingest_batch(b1, corpus, idx_root)
        b2 = _mkdocs(
            spark,
            [(2, "one two three four five six seven eight", "en", "s2", 39)],
        )
        dedup_stream.dedup_ingest_batch(b2, corpus, idx_root)

        assert spark.catalog.tableExists(mirror)
        versioned = {
            (r.corpus_id, r.band, r.bkey)
            for r in VersionedTable(
                spark, dedup_stream.index_paths(idx_root)["bands"]
            ).read().collect()
        }
        mirrored = {
            (r.corpus_id, r.band, r.bkey)
            for r in spark.table(mirror).collect()
        }
        assert versioned <= mirrored

        # the steady-state probe plan: batch band keys vs the mirror
        b3 = _mkdocs(
            spark, [(3, "nine ten eleven twelve thirteen", "en", "s3", 31)]
        )
        sigs = (
            b3.select("doc_id", F.split("text", " ").alias("__tk"))
            .select("doc_id", dedup_stream._shingle_hashes().alias("__sh"))
            .withColumn("__hb", dedup_stream._mod_hashes("__sh"))
            .select("doc_id", dedup_stream._minhash_sig("__hb").alias("sig"))
        )
        bbands = dedup_stream._band_keys(sigs)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = bbands.join(spark.table(mirror), ["band", "bkey"]).select(
                "doc_id", "corpus_id"
            )
            assert inspect.num_shuffles(probe) == 1, inspect.formatted_plan(probe)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # rebuild re-packs the mirror to exactly the authoritative rows
        dedup_stream.rebuild_bands_mirror(spark, idx_root)
        assert {
            (r.corpus_id, r.band, r.bkey)
            for r in spark.table(mirror).collect()
        } == versioned
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {mirror}")


def test_tws_profiles_merge_into_versioned_table(spark, tmp_path):
    """Capstone NRT flow: transformWithState running profiles (update
    deltas) land in a versioned table via the foreachBatch MERGE sink
    with Delta-style (txn_app, epoch) tokens — across a checkpointed
    restart the table equals a batch recomputation, no duplicates, and
    replayed epochs are skipped by the txn guard."""
    import datetime as dt

    import pytest

    from nrtwithdeltalake_spark._protobuf_compat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime found for the TWS worker")

    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable
    from nrtwithdeltalake_spark.streaming import tws
    from nrtwithdeltalake_spark.streaming.nrt import run_stream_to_table

    def d(s):
        return dt.datetime.fromisoformat(s)

    sdir = str(tmp_path / "src_cap")
    os.makedirs(sdir, exist_ok=True)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    b1 = spark.createDataFrame(
        [
            (1, d("2024-01-01 10:00:00"), 1, "click", 2.0, "{}"),
            (2, d("2024-01-01 10:10:00"), 2, "view", 3.0, "{}"),
        ],
        schema,
    )
    b2 = spark.createDataFrame(
        [(3, d("2024-01-01 11:00:00"), 1, "buy", 7.0, "{}")], schema
    )
    b1.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b1.parquet")

    tbl = str(tmp_path / "profiles_tbl")
    ckpt = str(tmp_path / "ckpt_cap")

    def run():
        stream = spark.readStream.schema(b1.schema).parquet(f"{sdir}/*.parquet")
        with tws.rocksdb_state(spark):
            run_stream_to_table(
                tws.running_profiles(stream),
                tbl,
                ["user_id"],
                ckpt,
                txn_app="tws_profiles_cap",
            )

    run()
    b2.coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b2.parquet")
    run()  # checkpointed restart: state + sink both resume

    t = VersionedTable(spark, tbl)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in t.read().collect()
    }
    assert got == {1: (2, 9.0), 2: (1, 3.0)}
    assert t.read().count() == 2  # one profile row per user, no dups
    # the txn ledger recorded the sink's epochs (exactly-once guard)
    assert t.txn_version("tws_profiles_cap") is not None


def test_auto_optimize_amortizes_small_file_debt(spark, tmp_path):
    """Databricks auto-compaction analog: a continuously-merging stream
    with auto_optimize runs an INCREMENTAL compact on cadence, so the
    table's live file count stays bounded instead of growing one file
    per micro-batch — and the data stays exactly the merge result."""
    sdir = str(tmp_path / "src")
    os.makedirs(sdir)
    for b in range(4):
        spark.createDataFrame(
            [(b * 10 + i, f"v{b}") for i in range(5)], "k bigint, s string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b{b}.parquet")
    tgt = str(tmp_path / "tgt")
    stream = (
        spark.readStream.schema("k bigint, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sdir}/*.parquet")
    )
    nrt.run_stream_to_table(
        stream,
        tgt,
        keys=["k"],
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
        auto_optimize_small_bytes=1 << 20,
        auto_optimize_every=2,
    )
    t = VersionedTable(spark, tgt)
    ops = [c.op for c in t.history()]
    assert "compact" in ops  # the cadence fired inside the sink
    # every small file re-packed at the last cadence bounds live files
    assert len(t.get_commit().files) <= 3 < 4
    assert t.read().count() == 20
    assert t.read().filter("s = 'v3'").count() == 5
