"""Unit tests for the public expression library and skew utilities —
each helper asserted against a plain-Spark recomputation (salting and
decimal tricks must be invisible in results)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nrtwithdeltalake_spark import functions as nf
from nrtwithdeltalake_spark.operators.skew import salted_join, two_phase_agg


def test_vec_cosine_known_values(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 2.0], [2.0, 4.0])],
        "id long, a array<double>, b array<double>",
    )
    got = {
        r.id: (r.dot, r.cos)
        for r in df.select(
            "id",
            nf.vec_dot("a", "b").alias("dot"),
            nf.vec_cosine("a", "b").alias("cos"),
        ).collect()
    }
    assert got[1] == (0.0, 0.0)
    assert got[2][0] == 10.0
    assert math.isclose(got[2][1], 1.0)


def test_chunk_spans_cover_text_with_overlap(spark):
    df = spark.createDataFrame([("x" * 600,)], "text string")
    chunks = df.select(
        F.explode(nf.chunk_spans("text", length=256, stride=224)).alias("c")
    ).collect()
    # spans at 1, 225, 449 → lengths 256, 256, 152
    assert [len(r.c) for r in chunks] == [256, 256, 152]
    assert sum(len(r.c) - 32 for r in chunks[:-1]) + len(chunks[-1].c) == 600


def test_salted_join_equals_plain_join(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("rid"), (F.col("id") % 3).alias("k")
    )
    right = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    plain = left.join(right, ["k"]).select("rid", "k", "v")
    salted = salted_join(left, right, ["k"], ["rid"], n_salt=8).select(
        "rid", "k", "v"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (2, 99)], "rid long, k long")
    right = spark.createDataFrame([(10, "hit")], "k long, v string")
    rows = {
        r.rid: r.v
        for r in salted_join(left, right, ["k"], ["rid"], n_salt=4, how="left")
        .select("rid", "v")
        .collect()
    }
    assert rows == {1: "hit", 2: None}


def test_two_phase_agg_equals_plain_agg(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v")
    )
    plain = {
        r.k: (r.s, r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    two = {
        r.k: (r.s, r.n)
        for r in two_phase_agg(
            df,
            ["k"],
            {"ps": F.sum("v"), "pn": F.count(F.lit(1))},
            {"s": F.sum("ps"), "n": F.sum("pn")},
            salt_cols=["v"],
            n_salt=16,
        ).collect()
    }
    assert two == plain


def test_vec_cosine_pandas_matches_catalyst(spark):
    df = spark.createDataFrame(
        [(i, [float(i + 1), 2.0, 3.0], [4.0, 5.0, float(i + 6)]) for i in range(50)],
        "id long, a array<double>, b array<double>",
    )
    got = df.select(
        "id",
        nf.vec_cosine("a", "b").alias("c_sql"),
        nf.vec_cosine_pandas()("a", "b").alias("c_py"),
    ).collect()
    assert all(math.isclose(r.c_sql, r.c_py, rel_tol=1e-12) for r in got)


def test_quantize_zero_vector_guard(spark, tmp_path):
    """All-zero embeddings must quantize to zeros (epsilon floor), not
    trap on ANSI round(inf)."""
    from nrtwithdeltalake_spark.operators.similarity import q_embed_quantize

    p = str(tmp_path / "emb")
    spark.createDataFrame(
        [(0, [0.0] * 64, 0), (1, [1.0] * 64, 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{p}/embeddings.parquet")
    rows = {r.vec_id: r for r in q_embed_quantize(spark, p).collect()}
    # q8 is array_join-serialized for the driver's pandas canonicalizer
    q0 = [int(x) for x in rows[0].q8.split(",")]
    q1 = [int(x) for x in rows[1].q8.split(",")]
    assert all(q == 0 for q in q0)
    assert rows[0].scale < 1e-10
    assert all(q == 127 for q in q1)


def test_sessionize_boundary_gap_not_a_new_session(spark, tmp_path):
    """A gap of exactly 1800 s must NOT open a new session (> is strict),
    1801 s must."""
    import datetime as dt

    from nrtwithdeltalake_spark.operators.relational import q_sessionize

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    p = str(tmp_path / "ev")
    spark.createDataFrame(
        [
            (1, base, 1, "c", 1.0, "{}"),
            (2, base + dt.timedelta(seconds=1800), 1, "c", 1.0, "{}"),
            (3, base, 2, "c", 1.0, "{}"),
            (4, base + dt.timedelta(seconds=1801), 2, "c", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{p}/events.parquet")
    got = {r.user_id: r.n_sessions for r in q_sessionize(spark, p).collect()}
    assert got == {1: 1, 2: 2}


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    st.lists(  # events: (key, t)
        st.tuples(st.integers(0, 3), st.integers(0, 50)),
        min_size=1,
        max_size=15,
    ),
    st.lists(  # orders: (key, t, okey)
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        min_size=0,
        max_size=15,
    ),
)
def test_asof_join_matches_python_oracle(spark_global, events, orders):
    """Property: the union+window as-of ≡ brute-force latest-at-or-before
    with (max t, then max okey) tie-break, on random keys/times."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def ts(x):
        return base + dt.timedelta(minutes=x)

    ev_rows = [(i, ts(t), k, "c", 1.0, "{}") for i, (k, t) in enumerate(events)]
    o_rows = [
        (ok, k, "O", 1.0, ts(t), "P") for (k, t, ok) in orders
    ]
    import tempfile, os
    d = tempfile.mkdtemp()
    spark_global.createDataFrame(
        ev_rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    spark_global.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    from nrtwithdeltalake_spark.operators.relational_ext import q_join_asof

    got = {
        r.event_id: (r.asof_orderkey, r.asof_odate)
        for r in q_join_asof(spark_global, d).collect()
    }
    for i, (k, t) in enumerate(events):
        cands = [(tt, oo) for (kk, tt, oo) in orders if kk == k and tt <= t]
        if not cands:
            assert got[i] == (None, None)
        else:
            bt = max(c[0] for c in cands)
            bk = max(c[1] for c in cands if c[0] == bt)
            assert got[i][0] == bk
            assert got[i][1] == ts(bt).strftime("%Y-%m-%d %H:%M:%S")
