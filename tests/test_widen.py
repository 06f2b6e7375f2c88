"""Metadata-only column TYPE widening — Delta's type-widening table
feature (``ALTER TABLE ... ALTER COLUMN c TYPE <wider>``). The commit
flips the schema; zero data files are rewritten — the explicit read
schema upcasts narrow parquet pages losslessly. Narrowing and
representation changes are refused loudly."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import types as T

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
            [("a", 1, 1.5), ("b", 2, 2.5)], "s string, x int, f float"
        ),
    )


def test_widen_int_to_long_is_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = t.get_commit()
    v = t.widen_column_type("x", "bigint")
    after = t.get_commit()
    # not a single data file touched — same list, same bytes
    assert after.files == before.files
    assert after.version == v == before.version + 1
    assert isinstance(t.schema()["x"].dataType, T.LongType)
    # old narrow pages read back exactly through the wide schema
    assert sorted((r.s, r.x) for r in t.read().collect()) == [
        ("a", 1),
        ("b", 2),
    ]
    # time travel still shows the narrow type
    assert isinstance(
        t.schema(version=before.version)["x"].dataType, T.IntegerType
    )


def test_widen_then_wide_append_mixes_file_generations(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.widen_column_type("x", "bigint")
    big = 2**40  # unrepresentable in the old int32 type
    t.append(
        spark.createDataFrame([("c", big, 3.5)], "s string, x long, f float")
    )
    got = {r.s: r.x for r in t.read().collect()}
    assert got == {"a": 1, "b": 2, "c": big}


def test_widen_float_double_and_decimal(spark, tmp_path):
    t = VersionedTable.create(
        spark,
        str(tmp_path / "d"),
        spark.createDataFrame(
            [(1.5, Decimal("12.34"))], "f float, d decimal(8,2)"
        ),
    )
    t.widen_column_type("f", "double")
    t.widen_column_type("d", "decimal(12,4)")
    r = t.read().collect()[0]
    assert r.f == 1.5 and r.d == Decimal("12.3400")
    assert isinstance(t.schema()["f"].dataType, T.DoubleType)
    assert t.schema()["d"].dataType == T.DecimalType(12, 4)
    # int → double is exact for int32 and narrower
    t2 = _mk(spark, tmp_path, "d2")
    t2.widen_column_type("x", "double")
    assert {r.x for r in t2.read().collect()} == {1.0, 2.0}


def test_widen_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.widen_column_type("x", "bigint")
    for col, bad in [
        ("x", "int"),  # narrowing
        ("x", "double"),  # long→double rounds above 2^53
        ("s", "bigint"),  # representation change
        ("x", "bigint"),  # no-op
        ("ghost", "bigint"),  # unknown column
    ]:
        with pytest.raises(ValueError):
            t.widen_column_type(col, bad)
    # schema unchanged by the refused attempts
    assert isinstance(t.schema()["x"].dataType, T.LongType)


def test_widen_identity_column_refused(spark, tmp_path):
    t = _mk(spark, tmp_path, "ident")
    # x (int) can't be adopted (identity wants BIGINT); declare a new one
    empty = VersionedTable.create(
        spark,
        str(tmp_path / "ident2"),
        spark.createDataFrame([], "s string"),
    )
    empty.add_identity_column("rid")
    with pytest.raises(ValueError, match="IDENTITY"):
        empty.widen_column_type("rid", "decimal(20,0)")


def test_widen_survives_dv_and_constraints(spark, tmp_path):
    t = _mk(spark, tmp_path, "dv")
    t.add_constraint("x_pos", "x > 0")
    t.delete("s = 'a'", use_dv=True)
    t.widen_column_type("x", "bigint")
    # deletion vectors carried through the metadata commit
    assert {r.s for r in t.read().collect()} == {"b"}
    # the CHECK constraint still gates wide-typed writes
    from nrtwithdeltalake_spark.pipeline.tables import (
        ConstraintViolationError,
    )

    with pytest.raises(ConstraintViolationError):
        t.append(
            spark.createDataFrame(
                [("z", -5, 0.0)], "s string, x long, f float"
            )
        )


def test_widen_column_default_still_fills(spark, tmp_path):
    t = _mk(spark, tmp_path, "dflt")
    t.set_column_default("x", "42")
    t.widen_column_type("x", "bigint")
    t.append(spark.createDataFrame([("c", 9.5)], "s string, f float"))
    got = {r.s: r.x for r in t.read().collect()}
    assert got["c"] == 42


def test_sql_alter_column_type(spark, tmp_path):
    t = _mk(spark, tmp_path, "sql")
    tgt = f"versioned.`{t.path}`"
    execute_dml(spark, f"ALTER TABLE {tgt} ALTER COLUMN x TYPE BIGINT")
    assert isinstance(t.schema()["x"].dataType, T.LongType)
    with pytest.raises(UnsupportedSqlError, match="not a safe widening"):
        execute_dml(spark, f"ALTER TABLE {tgt} ALTER COLUMN x TYPE INT")
    # values unchanged through the SQL path
    assert {r.x for r in t.read().collect()} == {1, 2}


def test_widen_stamps_type_widening_protocol(spark, tmp_path):
    """A widen commit gates downstream readers: narrow pages under a
    wide schema misread through a footer-typed reader, so the commit
    demands the type_widening reader feature (monotone thereafter)."""
    t = _mk(spark, tmp_path, "proto")
    assert "type_widening" not in (
        (t.get_commit().protocol or {}).get("reader_features") or []
    )
    t.widen_column_type("x", "bigint")
    proto = t.get_commit().protocol
    assert "type_widening" in proto["reader_features"]
    # monotone: a later plain append keeps the requirement
    t.append(
        spark.createDataFrame([("z", 7, 0.5)], "s string, x long, f float")
    )
    assert "type_widening" in t.get_commit().protocol["reader_features"]


def test_evolution_widen_stamps_type_widening_protocol(spark, tmp_path):
    """Schema-EVOLUTION widening — an append/merge/copy_into whose
    source carries a safely-wider type widens the table schema via
    _merged_schema while the op stays "append" — produces the exact
    narrow-pages-under-wide-schema state widen_column does, so the
    commit must demand the type_widening reader feature too (ADVICE
    r12: the op-only gate let footer-typed readers misread int32
    pages under a bigint schema)."""
    t = _mk(spark, tmp_path, "evo")
    # a non-widening append stamps nothing
    t.append(
        spark.createDataFrame([("c", 3, 3.5)], "s string, x int, f float")
    )
    assert "type_widening" not in (
        (t.get_commit().protocol or {}).get("reader_features") or []
    )
    # the widening append (long source into int column) stamps it
    t.append(
        spark.createDataFrame(
            [("d", 3_000_000_000, 4.5)], "s string, x long, f float"
        )
    )
    assert isinstance(t.schema()["x"].dataType, T.LongType)
    proto = t.get_commit().protocol
    assert proto["min_reader"] == 2
    assert "type_widening" in proto["reader_features"]
    # the pre-widen narrow file still reads exactly through the wide
    # schema, and the feature is monotone thereafter
    assert sorted(r.x for r in t.read().collect()) == [1, 2, 3, 3_000_000_000]
    t.append(
        spark.createDataFrame([("e", 5, 5.5)], "s string, x long, f float")
    )
    assert "type_widening" in t.get_commit().protocol["reader_features"]
