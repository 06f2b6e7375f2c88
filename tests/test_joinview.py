"""IncrementalJoinView: maintained fact ⋈ dim from both change feeds.

Invariant everywhere: after refresh(), the view equals a full re-join
of the current snapshots — while touching only changed keys."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nrtwithdeltalake_spark.pipeline.joinview import IncrementalJoinView
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _mk(spark, tmp_path, how):
    fact = VersionedTable.create(
        spark,
        str(tmp_path / f"fact_{how}"),
        spark.createDataFrame(
            [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0), (4, 99, 2.0)],
            "id long, fk long, v double",
        ),
    )
    dim = VersionedTable.create(
        spark,
        str(tmp_path / f"dim_{how}"),
        spark.createDataFrame(
            [(10, "ten"), (20, "twenty"), (30, "thirty")],
            "dk long, label string",
        ),
    )
    view = IncrementalJoinView(
        spark,
        fact,
        dim,
        str(tmp_path / f"view_{how}"),
        fact_pk=["id"],
        fact_fk=["fk"],
        dim_key=["dk"],
        how=how,
    )
    return fact, dim, view


def _check(view, fact, dim, how):
    got = sorted(tuple(r) for r in view.read().collect())
    f, d = fact.read(), dim.read()
    want = sorted(
        tuple(r)
        for r in f.join(d, f.fk == d.dk, how)
        .select("id", "fk", "v", "label")
        .collect()
    )
    assert got == want, (got, want)


def test_joinview_inner_full_lifecycle(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path, "inner")
    r = view.refresh()
    assert r["bootstrap"]
    _check(view, fact, dim, "inner")
    assert {x.id for x in view.read().collect()} == {1, 2, 3}  # 4 has no dim

    # fact-side changes: insert + update + delete
    fact.merge(
        spark.createDataFrame(
            [(5, 20, 9.0, "U"), (1, 10, 50.0, "U"), (3, 20, 1.0, "D")],
            "id long, fk long, v double, op string",
        ),
        keys=["id"],
        delete_condition="op = 'D'",
        exclude_cols=["op"],
    )
    r = view.refresh()
    assert r["refreshed"] and r["touched_rows"] == 3, r
    _check(view, fact, dim, "inner")

    # dim-side trickle-down: label update rewrites carrying fact rows
    dim.merge(
        spark.createDataFrame([(10, "TEN")], "dk long, label string"),
        keys=["dk"],
    )
    r = view.refresh()
    assert r["touched_rows"] == 2, r  # ids 1, 2 carry fk=10
    _check(view, fact, dim, "inner")
    labels = {x.id: x.label for x in view.read().collect()}
    assert labels[1] == "TEN" and labels[2] == "TEN"

    # dim delete under inner: carrying rows retract from the view
    dim.delete("dk = 20")
    r = view.refresh()
    assert r["touched_rows"] == 1, r  # id 5 carries fk=20
    _check(view, fact, dim, "inner")
    assert 5 not in {x.id for x in view.read().collect()}

    # idempotent no-op
    assert view.refresh()["refreshed"] is False


def test_joinview_left_null_extension(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path, "left")
    view.refresh()
    _check(view, fact, dim, "left")
    assert {x.id for x in view.read().collect()} == {1, 2, 3, 4}

    # dim delete under left: carrying rows null-extend, never vanish
    dim.delete("dk = 10")
    r = view.refresh()
    assert r["touched_rows"] == 2, r
    _check(view, fact, dim, "left")
    labels = {x.id: x.label for x in view.read().collect()}
    assert labels[1] is None and labels[2] is None and len(labels) == 4

    # late-arriving dim key matches the previously-dangling fact row
    dim.append(
        spark.createDataFrame([(99, "ninetynine")], "dk long, label string")
    )
    r = view.refresh()
    assert r["touched_rows"] == 1, r
    _check(view, fact, dim, "left")
    assert {x.id: x.label for x in view.read().collect()}[4] == "ninetynine"


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["fact_upsert", "fact_delete", "dim_upsert", "dim_delete"]),
            st.lists(st.integers(0, 8), min_size=1, max_size=3),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_joinview_random_ops_match_full_recompute(
    spark_global, tmp_path_factory, ops
):
    spark = spark_global
    tmp_path = tmp_path_factory.mktemp("jv")
    fact = VersionedTable.create(
        spark,
        str(tmp_path / "fact"),
        spark.createDataFrame(
            [(i, i % 4, float(i)) for i in range(6)],
            "id long, fk long, v double",
        ),
    )
    dim = VersionedTable.create(
        spark,
        str(tmp_path / "dim"),
        spark.createDataFrame(
            [(k, f"label{k}") for k in range(4)], "dk long, label string"
        ),
    )
    view = IncrementalJoinView(
        spark,
        fact,
        dim,
        str(tmp_path / "view"),
        fact_pk=["id"],
        fact_fk=["fk"],
        dim_key=["dk"],
        how="inner",
    )
    view.refresh()
    for kind, keys in ops:
        if kind == "fact_upsert":
            fact.merge(
                spark.createDataFrame(
                    [(k, k % 3, float(k * 10)) for k in keys],
                    "id long, fk long, v double",
                ),
                keys=["id"],
                dedup_order_col="v",
            )
        elif kind == "fact_delete":
            fact.delete(f"id IN ({','.join(str(k) for k in keys)})")
        elif kind == "dim_upsert":
            dim.merge(
                spark.createDataFrame(
                    [(k % 5, f"relabel{k}") for k in keys],
                    "dk long, label string",
                ),
                keys=["dk"],
                dedup_order_col="label",
            )
        else:
            dim.delete(f"dk IN ({','.join(str(k % 5) for k in keys)})")
        view.refresh()
        _check(view, fact, dim, "inner")
