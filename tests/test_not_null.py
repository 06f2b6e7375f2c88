"""NOT NULL column constraints — Delta's ``ALTER TABLE ... ALTER
COLUMN c SET/DROP NOT NULL`` surface. Behaviorally ``CHECK (c IS NOT
NULL)`` (SQL null-passes semantics make that exact), but declared:
the committed schema flips the field's nullability, the write gate
rejects NULL rows before any file lands, and the protocol stamps
``not_null_constraints`` so an unaware writer refuses loudly."""

from __future__ import annotations

import pytest

from nrtwithdeltalake_spark.pipeline.sqldml import (
    UnsupportedSqlError,
    execute_dml,
)
from nrtwithdeltalake_spark.pipeline.tables import (
    ConstraintViolationError,
    VersionedTable,
)



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _mk(spark, tmp_path, name="t"):
    return VersionedTable.create(
        spark,
        str(tmp_path / name),
        spark.createDataFrame([("a", 1), ("b", 2)], "s string, x long"),
    )


def test_set_not_null_gates_writes_and_flips_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v = t.set_not_null("s")
    assert t.not_null_columns() == ["s"]
    assert not t.schema()["s"].nullable
    assert t.schema()["x"].nullable
    with pytest.raises(ConstraintViolationError, match="notnull:s"):
        t.append(spark.createDataFrame([(None, 3)], "s string, x long"))
    # merge and update are gated through the same write probe
    with pytest.raises(ConstraintViolationError):
        t.merge(
            spark.createDataFrame([(None, 9)], "s string, x long"), ["x"]
        )
    t.append(spark.createDataFrame([("c", 3)], "s string, x long"))
    assert t.read().count() == 3
    # time travel: the pre-constraint schema is preserved
    assert VersionedTable(spark, t.path).get_commit(v - 1).schema_json != (
        t.get_commit(v).schema_json
    )


def test_set_not_null_validates_existing_rows(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([(None, 3)], "s string, x long"))
    with pytest.raises(ConstraintViolationError):
        t.set_not_null("s")
    with pytest.raises(ValueError, match="does not exist"):
        t.set_not_null("nope")


def test_drop_not_null_restores_nullability(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_not_null("s")
    with pytest.raises(ValueError, match="already NOT NULL"):
        t.set_not_null("s")
    t.drop_not_null("s")
    assert t.not_null_columns() == []
    assert t.schema()["s"].nullable
    t.append(spark.createDataFrame([(None, 3)], "s string, x long"))
    assert t.read().filter("s is null").count() == 1
    with pytest.raises(ValueError, match="no NOT NULL"):
        t.drop_not_null("s")


def test_reserved_prefix_and_constraint_routing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="reserved"):
        t.add_constraint("notnull:s", "s IS NOT NULL")
    t.set_not_null("s")
    with pytest.raises(ValueError, match="drop_not_null"):
        t.drop_constraint("notnull:s")


def test_protocol_declares_not_null_writer_feature(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_not_null("s")
    proto = t.get_commit().protocol
    assert "not_null_constraints" in proto["writer_features"]
    # feature is monotone: a later plain append still carries it
    t.append(spark.createDataFrame([("c", 3)], "s string, x long"))
    assert "not_null_constraints" in t.get_commit().protocol["writer_features"]


def test_clone_carries_not_null(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.set_not_null("s")
    dest = str(tmp_path / "cl")
    t.clone(dest, shallow=False)
    c = VersionedTable(spark, dest)
    assert c.not_null_columns() == ["s"]
    with pytest.raises(ConstraintViolationError):
        c.append(spark.createDataFrame([(None, 9)], "s string, x long"))


def test_sql_alter_column_not_null_round_trip(spark, tmp_path):
    t = _mk(spark, tmp_path, "sqlnn")
    execute_dml(
        spark, f"ALTER TABLE versioned.`{t.path}` ALTER COLUMN s SET NOT NULL"
    )
    assert t.not_null_columns() == ["s"]
    with pytest.raises(ConstraintViolationError):
        execute_dml(
            spark,
            f"INSERT INTO versioned.`{t.path}` "
            "VALUES (CAST(NULL AS STRING), 9)",
        )
    execute_dml(
        spark,
        f"ALTER TABLE versioned.`{t.path}` ALTER COLUMN s DROP NOT NULL",
    )
    assert t.not_null_columns() == []
    execute_dml(
        spark,
        f"INSERT INTO versioned.`{t.path}` VALUES (CAST(NULL AS STRING), 9)",
    )
    assert t.read().filter("s is null").count() == 1
    # TYPE is now a supported shape (round-12 widening) but still
    # refuses loudly outside the safe widening set; cosmetic shapes
    # (COMMENT) stay unsupported with the capability list named
    with pytest.raises(UnsupportedSqlError, match="not a safe widening"):
        execute_dml(
            spark,
            f"ALTER TABLE versioned.`{t.path}` ALTER COLUMN x TYPE STRING",
        )
    with pytest.raises(UnsupportedSqlError, match="SET NOT NULL"):
        execute_dml(
            spark,
            f"ALTER TABLE versioned.`{t.path}` ALTER COLUMN x "
            "COMMENT 'nope'",
        )


def test_describe_detail_surfaces_identity_and_not_null(spark, tmp_path):
    p = str(tmp_path / "dd")
    execute_dml(
        spark,
        f"CREATE TABLE versioned.`{p}` "
        "(id BIGINT GENERATED ALWAYS AS IDENTITY, s STRING NOT NULL)",
    )
    row = execute_dml(spark, f"DESCRIBE DETAIL versioned.`{p}`").collect()[0]
    assert row.identity_columns == ["id"]
    # identity columns are implicitly NOT NULL (Delta/reference parity)
    assert row.not_null_columns == ["id", "s"]
