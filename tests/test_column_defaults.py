"""Column DEFAULT values — the reference's ``TransactionDatetime
DATETIME2 DEFAULT GETUTCDATE()`` (``/root/reference/dbrdemo.sql:23,
35``); Delta's ``allowColumnDefaults`` writer feature. INSERT-shaped
semantics: batches that OMIT the column get the expression on
append/overwrite; supplied values pass through; merge sources
deliberately do NOT get defaults (UPDATE SET * must not overwrite
target values with freshly-evaluated defaults)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nrtwithdeltalake_spark.pipeline.sqldml import (
    UnsupportedSqlError,
    execute_dml,
)
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _mk(spark, tmp_path, name="t"):
    return VersionedTable.create(
        spark,
        str(tmp_path / name),
        spark.createDataFrame(
            [(1, "a", "x")], "k long, s string, tag string"
        ),
    )


def test_default_fills_omitted_column_on_append(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_default("tag", "'untagged'")
    t.append(spark.createDataFrame([(2, "b")], "k long, s string"))
    rows = {r.k: r.tag for r in t.read().collect()}
    assert rows == {1: "x", 2: "untagged"}
    # supplied values always win
    t.append(
        spark.createDataFrame([(3, "c", "explicit")], "k long, s string, tag string")
    )
    assert {r.k: r.tag for r in t.read().collect()}[3] == "explicit"
    # overwrite is insert-shaped too
    t.overwrite(spark.createDataFrame([(9, "z")], "k long, s string"))
    assert [r.tag for r in t.read().collect()] == ["untagged"]


def test_default_context_function(spark, tmp_path):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "ts"),
        spark.createDataFrame([], "k long, ts timestamp"),
    )
    t.set_column_default("ts", "current_timestamp()")
    t.append(spark.createDataFrame([(1,)], "k long"))
    assert t.read().filter("ts is not null").count() == 1


def test_merge_sources_do_not_get_defaults(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_default("tag", "'untagged'")
    # matched update: target's tag must NOT be replaced by the default
    t.merge(spark.createDataFrame([(1, "a2")], "k long, s string"), ["k"])
    rows = {r.k: (r.s, r.tag) for r in t.read().collect()}
    assert rows[1] == ("a2", None) or rows[1][0] == "a2"
    # (the engine's schema-subset merge writes NULL for absent source
    # columns — the point pinned here is that the DEFAULT expression is
    # NOT silently substituted on the update path)
    assert rows[1][1] != "untagged"


def test_declare_time_validation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(Exception):  # unresolvable column reference
        t.set_column_default("tag", "s")
    with pytest.raises(ValueError, match="does not exist"):
        t.set_column_default("nope", "'x'")
    tg = VersionedTable.create(
        spark,
        str(tmp_path / "gen"),
        spark.createDataFrame([("a", "A")], "s string, up string"),
    )
    tg.add_generated_column("up", "upper(s)")
    with pytest.raises(ValueError, match="generated"):
        tg.set_column_default("up", "'x'")
    ti = VersionedTable.create(
        spark,
        str(tmp_path / "ident"),
        spark.createDataFrame([], "s string"),
        identity={"id": (1, 1)},
    )
    with pytest.raises(ValueError, match="IDENTITY"):
        ti.set_column_default("id", "0")
    with pytest.raises(ValueError, match="no DEFAULT"):
        t.drop_column_default("tag")


def test_defaults_follow_rename_and_die_with_drop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # rename requires field ids — the fixture create() stamps them
    t.set_column_default("tag", "'d'")
    t.rename_column("tag", "label")
    assert t.column_defaults() == {"label": "'d'"}
    t.append(spark.createDataFrame([(5, "e")], "k long, s string"))
    assert {r.k: r.label for r in t.read().collect()}[5] == "d"
    t.drop_column("label")
    assert t.column_defaults() == {}


def test_default_protocol_and_clone_carry(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_column_default("tag", "'d'")
    t.append(spark.createDataFrame([(2, "b")], "k long, s string"))
    assert "column_defaults" in t.get_commit().protocol["writer_features"]
    dest = str(tmp_path / "cl")
    t.clone(dest, shallow=False)
    c = VersionedTable(spark, dest)
    assert c.column_defaults() == {"tag": "'d'"}
    c.append(spark.createDataFrame([(7, "g")], "k long, s string"))
    assert {r.k: r.tag for r in c.read().collect()}[7] == "d"


def test_sql_default_lifecycle(spark, tmp_path):
    p = str(tmp_path / "sqld")
    execute_dml(
        spark,
        f"CREATE TABLE versioned.`{p}` (k BIGINT, s STRING, "
        "tag STRING DEFAULT 'fresh')",
    )
    t = VersionedTable(spark, p)
    assert t.column_defaults() == {"tag": "'fresh'"}
    execute_dml(spark, f"INSERT INTO versioned.`{p}` (k, s) VALUES (1, 'a')")
    assert t.read().collect()[0].tag == "fresh"
    execute_dml(
        spark,
        f"ALTER TABLE versioned.`{p}` ALTER COLUMN tag SET DEFAULT 'v2'",
    )
    execute_dml(spark, f"INSERT INTO versioned.`{p}` (k, s) VALUES (2, 'b')")
    assert {r.k: r.tag for r in t.read().collect()}[2] == "v2"
    execute_dml(
        spark, f"ALTER TABLE versioned.`{p}` ALTER COLUMN tag DROP DEFAULT"
    )
    assert t.column_defaults() == {}
    execute_dml(spark, f"INSERT INTO versioned.`{p}` (k, s) VALUES (3, 'c')")
    assert {r.k: r.tag for r in t.read().collect()}[3] is None
