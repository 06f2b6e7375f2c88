"""SQL DML dispatcher: MERGE INTO / DELETE FROM / UPDATE statements
must behave identically to the VersionedTable Python API they route to
(the golden scenario run twice — once per surface — and diffed), and
unsupported statements must fail loudly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nrtwithdeltalake_spark.pipeline.sqldml import (
    UnsupportedSqlError,
    execute_dml,
)
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable

SCHEMA = "TransactionId bigint, name string, amount double, op string, seq int"



# Slow tier (see pytest.ini): excluded from the default driver-budget
# run; executes via `pytest -m slow`.
pytestmark = pytest.mark.slow

def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _snap(t):
    return {
        (r.TransactionId, r.name, float(r.amount))
        for r in t.read().select("TransactionId", "name", "amount").collect()
    }


@pytest.fixture()
def twin_tables(spark, tmp_path):
    base = _df(
        spark,
        [(1, "a", 10.0, "I", 1), (2, "b", 20.0, "I", 1), (3, "c", 30.0, "I", 1)],
    ).drop("op", "seq")
    sql_t = VersionedTable.create(spark, str(tmp_path / "sql_t"), base)
    api_t = VersionedTable.create(spark, str(tmp_path / "api_t"), base)
    return sql_t, api_t


def test_merge_sql_matches_api(spark, tmp_path, twin_tables):
    """The reference's golden merge scenario (upsert + CDC delete flag +
    conditional matched update) written once in SQL and once through the
    API produces byte-identical tables."""
    sql_t, api_t = twin_tables
    src = _df(
        spark,
        [
            (1, "a2", 11.0, "U", 2),   # update
            (3, "c", 30.0, "D", 2),    # delete flag
            (4, "d", 40.0, "I", 2),    # insert
            (5, "e", 50.0, "D", 2),    # unmatched delete -> no-op
        ],
    )
    src.createOrReplaceTempView("dml_src")

    api_res = api_t.merge(
        src,
        ["TransactionId"],
        delete_condition="op = 'D'",
        exclude_cols=["op", "seq"],
    )

    sql_res = execute_dml(
        spark,
        f"""
        MERGE INTO versioned.`{sql_t.path}` AS t
        USING (SELECT TransactionId, name, amount, op FROM dml_src) AS s
        ON t.TransactionId = s.TransactionId
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    # the SQL source carries `op`; the API call excluded it — align by
    # dropping it from the comparison (schema evolution adds it as a
    # column on the SQL side)
    sql_rows = {
        (r.TransactionId, r.name, float(r.amount))
        for r in sql_t.read()
        .select("TransactionId", "name", "amount")
        .collect()
    }
    assert sql_rows == _snap(api_t)
    assert sql_rows == {(1, "a2", 11.0), (2, "b", 20.0), (4, "d", 40.0)}
    assert sql_res["version"] == 1 and api_res["version"] == 1


def test_merge_sql_conditional_update_and_by_source(spark, tmp_path, twin_tables):
    sql_t, api_t = twin_tables
    src = _df(spark, [(1, "late", 5.0, "U", 0), (2, "fresh", 25.0, "U", 9)])
    src.createOrReplaceTempView("dml_src2")

    api_t.merge(
        src.drop("op"),
        ["TransactionId"],
        matched_update_condition="s.seq > 1",
        not_matched_by_source_update={"name": "concat(name, '-stale')"},
        not_matched_by_source_update_condition="amount > 25",
    )
    execute_dml(
        spark,
        f"""
        MERGE INTO versioned.`{sql_t.path}` t
        USING (SELECT TransactionId, name, amount, seq FROM dml_src2) s
        ON t.TransactionId = s.TransactionId
        WHEN MATCHED AND s.seq > 1 THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.amount > 25
            THEN UPDATE SET name = concat(t.name, '-stale')
        """,
    )
    assert _snap(sql_t) == _snap(api_t)
    got = {r.TransactionId: r.name for r in sql_t.read().collect()}
    assert got == {1: "a", 2: "fresh", 3: "c-stale"}


def test_delete_and_update_sql_match_api(spark, twin_tables):
    sql_t, api_t = twin_tables

    v_api = api_t.delete("amount >= 30")
    res = execute_dml(
        spark, f"DELETE FROM versioned.`{sql_t.path}` WHERE amount >= 30"
    )
    assert res["version"] == v_api == 1  # delete/update return the version

    v_api_u = api_t.update(
        "TransactionId = 1", {"amount": F.expr("amount * 2")}
    )
    res_u = execute_dml(
        spark,
        f"UPDATE versioned.`{sql_t.path}` SET amount = amount * 2 "
        "WHERE TransactionId = 1",
    )
    assert res_u["version"] == v_api_u == 2
    assert _snap(sql_t) == _snap(api_t) == {(1, "a", 20.0), (2, "b", 20.0)}


def test_merge_source_subquery_with_paren_in_literal(spark, twin_tables):
    """The USING-subquery extractor must skip string literals: a
    parenthesis inside a quoted value (with a doubled-quote escape)
    would otherwise unbalance the scan."""
    sql_t, _ = twin_tables
    execute_dml(
        spark,
        f"""
        MERGE INTO versioned.`{sql_t.path}` t
        USING (SELECT CAST(99 AS BIGINT) AS TransactionId,
                      concat('x''(', ')y') AS name,
                      CAST(1.0 AS DOUBLE) AS amount) s
        ON t.TransactionId = s.TransactionId
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    got = {r.TransactionId: r.name for r in sql_t.read().collect()}
    assert got[99] == "x'()y"


def test_dml_via_registered_catalog_name(spark, tmp_path):
    """DML addresses a register()ed table by its catalog name — the
    LOCATION round-trip (db.t -> _current/ -> table root)."""
    t = VersionedTable.create(
        spark,
        str(tmp_path / "cat_t"),
        _df(spark, [(1, "a", 10.0, "I", 1)]).drop("op", "seq"),
    ).register("dml_db", "cat_t")
    try:
        execute_dml(
            spark,
            "UPDATE dml_db.cat_t SET amount = 99.0 WHERE TransactionId = 1",
        )
        spark.sql("REFRESH TABLE dml_db.cat_t")
        assert spark.table("dml_db.cat_t").collect()[0].amount == 99.0
        assert t.read().collect()[0].amount == 99.0
    finally:
        spark.sql("DROP DATABASE IF EXISTS dml_db CASCADE")


def test_maintenance_statements(spark, twin_tables):
    """Delta's SQL maintenance surface: OPTIMIZE / VACUUM / DESCRIBE
    HISTORY shape-matched ahead of Spark's parser and routed to
    compact()/vacuum()/history()."""
    sql_t, _ = twin_tables
    tgt = f"versioned.`{sql_t.path}`"

    execute_dml(spark, f"UPDATE {tgt} SET amount = amount + 1")
    res = execute_dml(spark, f"OPTIMIZE {tgt} ZORDER BY (TransactionId)")
    assert res["version"] == 2

    hist = execute_dml(spark, f"DESCRIBE HISTORY {tgt}")
    ops = [r.operation for r in hist.collect()]
    assert ops[0] == "compact" and hist.columns[0] == "version"
    assert len(ops) == 3  # create, update, compact — newest first

    dry = execute_dml(spark, f"VACUUM {tgt} RETAIN 0 HOURS DRY RUN")
    assert dry["dry_run"] and dry["deleted_files"] >= 1
    vac = execute_dml(spark, f"VACUUM {tgt} RETAIN 0 HOURS")
    assert not vac["dry_run"]
    # the dry run deleted nothing: the real pass reclaims the same set
    assert vac["deleted_files"] == dry["deleted_files"] >= 1
    assert {r.TransactionId for r in sql_t.read().collect()} == {1, 2, 3}

    from nrtwithdeltalake_spark.pipeline.sqldml import UnsupportedSqlError
    import pytest as _pytest

    with _pytest.raises(UnsupportedSqlError):
        execute_dml(spark, f"OPTIMIZE {tgt} WHERE day = 3")  # unsupported shape


def test_unsupported_statements_fail_loudly(spark, tmp_path, twin_tables):
    sql_t, _ = twin_tables
    spark.createDataFrame([(1, 1)], "TransactionId bigint, x int") \
        .createOrReplaceTempView("dml_src3")
    tgt = f"versioned.`{sql_t.path}`"
    cases = [
        # non-equi ON
        f"MERGE INTO {tgt} t USING dml_src3 s ON t.TransactionId > s.TransactionId "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        # column-list matched update
        f"MERGE INTO {tgt} t USING dml_src3 s ON t.TransactionId = s.TransactionId "
        "WHEN MATCHED THEN UPDATE SET name = 'x' WHEN NOT MATCHED THEN INSERT *",
        # conditional insert
        f"MERGE INTO {tgt} t USING dml_src3 s ON t.TransactionId = s.TransactionId "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED AND s.x > 0 THEN INSERT *",
        # missing insert clause
        f"MERGE INTO {tgt} t USING dml_src3 s ON t.TransactionId = s.TransactionId "
        "WHEN MATCHED THEN UPDATE SET *",
        # unconditional matched delete (semantics differ from CDC flag)
        f"MERGE INTO {tgt} t USING dml_src3 s ON t.TransactionId = s.TransactionId "
        "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *",
        # wrong aliases
        f"MERGE INTO {tgt} a USING dml_src3 b ON a.TransactionId = b.TransactionId "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
        # not DML at all
        "SELECT 1",
    ]
    for sql in cases:
        with pytest.raises(UnsupportedSqlError):
            execute_dml(spark, sql)
    # and the table was never touched
    assert sql_t.latest_version() == 0


def test_merge_sql_equals_api_randomized(spark, tmp_path):
    """Property-style equivalence sweep: random batches of upserts /
    CDC-deletes / inserts applied to twin tables — once as SQL MERGE,
    once through the API — must converge to identical contents at every
    step. Deterministic seed: the sweep is reproducible, not flaky."""
    import random

    rng = random.Random(90210)
    base = _df(
        spark,
        [(i, f"n{i}", float(i * 10), "I", 1) for i in range(1, 21)],
    ).drop("op", "seq")
    sql_t = VersionedTable.create(spark, str(tmp_path / "rsql"), base)
    api_t = VersionedTable.create(spark, str(tmp_path / "rapi"), base)

    for step in range(4):
        rows = []
        for _ in range(rng.randint(3, 8)):
            key = rng.randint(1, 30)  # may or may not exist
            op = rng.choice(["U", "U", "D"])
            rows.append(
                (key, f"s{step}k{key}", rng.randint(0, 999) / 10.0, op,
                 step + 2)
            )
        # one batch row per key (merge dedups; keep the comparison exact)
        seen = set()
        rows = [
            r for r in rows if not (r[0] in seen or seen.add(r[0]))
        ]
        src = _df(spark, rows)
        src.createOrReplaceTempView("rand_src")

        api_t.merge(
            src,
            ["TransactionId"],
            delete_condition="op = 'D'",
            exclude_cols=["op", "seq"],
        )
        execute_dml(
            spark,
            f"""
            MERGE INTO versioned.`{sql_t.path}` t
            USING (SELECT TransactionId, name, amount, op FROM rand_src) s
            ON t.TransactionId = s.TransactionId
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """,
        )
        assert _snap(sql_t) == _snap(api_t), f"diverged at step {step}"


def test_alter_table_ddl_and_restore(spark, twin_tables):
    """ALTER TABLE column DDL + CHECK constraints + RESTORE through the
    SQL surface: Spark-parsed AddColumns/RenameColumn/DropColumns/
    AddCheckConstraint/DropConstraint plans route to the metadata-only
    evolution API; RESTORE is shape-matched (not in Spark's grammar)."""
    from nrtwithdeltalake_spark.pipeline.tables import (
        ConstraintViolationError,
    )

    sql_t, _ = twin_tables
    tgt = f"versioned.`{sql_t.path}`"

    execute_dml(
        spark, f"ALTER TABLE {tgt} ADD COLUMNS (note STRING, score DOUBLE)"
    )
    assert {"note", "score"} <= set(sql_t.read().columns)

    execute_dml(spark, f"ALTER TABLE {tgt} RENAME COLUMN note TO remark")
    execute_dml(spark, f"ALTER TABLE {tgt} DROP COLUMN score")
    cols = set(sql_t.read().columns)
    assert "remark" in cols and "note" not in cols and "score" not in cols

    # IF EXISTS tolerates a missing column; without it the drop is loud
    execute_dml(spark, f"ALTER TABLE {tgt} DROP COLUMN IF EXISTS ghost")
    with pytest.raises(ValueError, match="does not exist"):
        execute_dml(spark, f"ALTER TABLE {tgt} DROP COLUMN ghost")

    execute_dml(
        spark, f"ALTER TABLE {tgt} ADD CONSTRAINT amt_pos CHECK (amount > 0)"
    )
    assert "amt_pos" in sql_t.constraints()
    with pytest.raises(ConstraintViolationError):
        sql_t.append(
            _df(spark, [(9, "bad", -1.0, "I", 1)]).drop("op", "seq")
        )
    execute_dml(spark, f"ALTER TABLE {tgt} DROP CONSTRAINT amt_pos")
    assert sql_t.constraints() == {}

    v = sql_t.latest_version()
    res = execute_dml(spark, f"RESTORE TABLE {tgt} TO VERSION AS OF 0")
    assert res["version"] == v + 1  # restore commits a new version
    assert set(sql_t.read().columns) == {"TransactionId", "name", "amount"}
    assert _snap(sql_t) == {(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)}

    # RESTORE ... TIMESTAMP AS OF resolves through version_at (the last
    # version committed at or before the timestamp) and then restores
    import datetime as _dt

    # halfway between v1 and v2 commit stamps: unambiguously "at or
    # after v1, before v2" regardless of float→ISO rounding
    ts_v1 = sql_t.get_commit(1).ts
    ts_v2 = sql_t.get_commit(2).ts
    iso = _dt.datetime.utcfromtimestamp((ts_v1 + ts_v2) / 2).isoformat()
    res = execute_dml(spark, f"RESTORE TABLE {tgt} TIMESTAMP AS OF '{iso}'")
    assert res["version"] == v + 2
    assert sorted(map(tuple, sql_t.read().collect())) == sorted(
        map(tuple, sql_t.read(version=1).collect())
    )
    assert sql_t.read().columns == sql_t.read(version=1).columns


def test_insert_into_and_ctas(spark, tmp_path, twin_tables):
    """The remaining lifecycle statements: CTAS creates a versioned
    table from a query; INSERT INTO appends with SQL positional
    semantics (explicit column list honored); INSERT OVERWRITE replaces
    the snapshot; partition-spec inserts and arity mismatches are loud."""
    sql_t, api_t = twin_tables
    tgt = f"versioned.`{sql_t.path}`"

    res = execute_dml(
        spark,
        f"INSERT INTO {tgt} SELECT CAST(10 AS BIGINT), 'j', CAST(1.5 AS DOUBLE)",
    )
    assert res["version"] == 1
    api_t.append(_df(spark, [(10, "j", 1.5, "I", 1)]).drop("op", "seq"))
    assert _snap(sql_t) == _snap(api_t)

    # explicit column list maps positionally to the NAMED columns
    execute_dml(
        spark,
        f"INSERT INTO {tgt} (amount, TransactionId, name) "
        "VALUES (CAST(2.5 AS DOUBLE), CAST(11 AS BIGINT), 'k')",
    )
    assert (11, "k", 2.5) in _snap(sql_t)

    with pytest.raises(UnsupportedSqlError, match="arity"):
        execute_dml(spark, f"INSERT INTO {tgt} SELECT 1, 'x'")
    with pytest.raises(UnsupportedSqlError, match="PARTITION"):
        execute_dml(
            spark, f"INSERT INTO {tgt} PARTITION (name='x') SELECT 1, 2.0"
        )

    execute_dml(
        spark,
        f"INSERT OVERWRITE {tgt} "
        "SELECT CAST(1 AS BIGINT), 'only', CAST(9.0 AS DOUBLE)",
    )
    assert _snap(sql_t) == {(1, "only", 9.0)}

    # CTAS at a path; IF NOT EXISTS is a no-op on the second run
    new_path = str(tmp_path / "ctas_t")
    spark.createDataFrame([(1, "a")], "id bigint, s string") \
        .createOrReplaceTempView("ctas_src")
    res = execute_dml(
        spark,
        f"CREATE TABLE versioned.`{new_path}` AS SELECT * FROM ctas_src",
    )
    assert res["version"] == 0
    assert VersionedTable(spark, new_path).read().count() == 1
    res2 = execute_dml(
        spark,
        f"CREATE TABLE IF NOT EXISTS versioned.`{new_path}` AS "
        "SELECT * FROM ctas_src",
    )
    assert res2["version"] == 0  # no-op, table untouched
    with pytest.raises(ValueError, match="already exists"):
        execute_dml(
            spark,
            f"CREATE TABLE versioned.`{new_path}` AS SELECT * FROM ctas_src",
        )
    with pytest.raises(UnsupportedSqlError):
        execute_dml(spark, "CREATE TABLE plain_db.t AS SELECT 1 AS a")


def test_merge_clause_order_delete_after_update_rejected(spark, twin_tables):
    """SQL MERGE is first-clause-wins: a row matching both an UPDATE and
    a LATER DELETE condition must update. The merge API's delete flag
    wins unconditionally, so only delete-before-update order is
    faithfully executable — anything else must raise, not silently
    delete (advisor r09)."""
    sql_t, _ = twin_tables
    spark.createDataFrame(
        [(1, "x", 1.0, "D", 9)],
        "TransactionId bigint, name string, amount double, op string, seq bigint",
    ).createOrReplaceTempView("dml_src_order")
    with pytest.raises(UnsupportedSqlError, match="before the UPDATE"):
        execute_dml(
            spark,
            f"""
            MERGE INTO versioned.`{sql_t.path}` t USING dml_src_order s
            ON t.TransactionId = s.TransactionId
            WHEN MATCHED AND s.seq > 1 THEN UPDATE SET *
            WHEN MATCHED AND s.op = 'D' THEN DELETE
            WHEN NOT MATCHED THEN INSERT *
            """,
        )
    assert sql_t.latest_version() == 0


def test_merge_matched_delete_bare_column_rejected(spark, twin_tables):
    """An unqualified column in a matched-DELETE condition would be
    evaluated against SOURCE rows (CDC-flag semantics) even when the
    author meant the target — require explicit s.-qualification
    (advisor r09)."""
    sql_t, _ = twin_tables
    spark.createDataFrame(
        [(1, "x", -1.0, "D", 1)],
        "TransactionId bigint, name string, amount double, op string, seq bigint",
    ).createOrReplaceTempView("dml_src_bare")
    with pytest.raises(UnsupportedSqlError, match="bare column"):
        execute_dml(
            spark,
            f"""
            MERGE INTO versioned.`{sql_t.path}` t USING dml_src_bare s
            ON t.TransactionId = s.TransactionId
            WHEN MATCHED AND amount < 0 THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
            """,
        )
    # string literals must not trip the bare-identifier scan
    execute_dml(
        spark,
        f"""
        MERGE INTO versioned.`{sql_t.path}` t USING dml_src_bare s
        ON t.TransactionId = s.TransactionId
        WHEN MATCHED AND s.op = 'delete me' THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )


def test_insert_unknown_column_rejected(spark, twin_tables):
    """INSERT INTO t (misspelled_col) must raise, not let append()'s
    schema evolution silently create the column (advisor r09)."""
    sql_t, _ = twin_tables
    with pytest.raises(UnsupportedSqlError, match="amout"):
        execute_dml(
            spark,
            f"INSERT INTO versioned.`{sql_t.path}` (TransactionId, amout) "
            "VALUES (99, 1.0)",
        )
    assert sql_t.latest_version() == 0
    assert "amout" not in [f.name for f in sql_t.schema().fields]


def test_sql_time_travel_reads_match_api(spark, twin_tables):
    """SELECT ... VERSION AS OF n / TIMESTAMP AS OF ts — read-side SQL
    time travel matches API time travel exactly, across a mutation
    history (golden: v0 create → v1 merge → v2 delete)."""
    from nrtwithdeltalake_spark.pipeline.sqldml import execute_query

    sql_t, _ = twin_tables
    src = _df(spark, [(1, "a2", 11.0, "U", 2), (4, "d", 40.0, "I", 2)])
    sql_t.merge(src.drop("op", "seq"), ["TransactionId"])          # v1
    sql_t.delete("TransactionId = 2")                              # v2
    tgt = f"versioned.`{sql_t.path}`"

    for v in (0, 1, 2):
        api = {tuple(r) for r in sql_t.read(version=v).collect()}
        got = {
            tuple(r)
            for r in execute_query(
                spark, f"SELECT * FROM {tgt} VERSION AS OF {v}"
            ).collect()
        }
        assert got == api, f"version {v}"

    # time travel composes with real query shapes (agg over v1)
    n1 = execute_query(
        spark,
        f"SELECT count(*) AS n, sum(amount) AS total "
        f"FROM {tgt} VERSION AS OF 1",
    ).collect()[0]
    assert n1.n == 4 and abs(n1.total - (11.0 + 20.0 + 30.0 + 40.0)) < 1e-9

    # TIMESTAMP AS OF resolves to last-version-at-or-before (Delta rule)
    ts1 = sql_t.get_commit(1).ts
    got_ts = {
        tuple(r)
        for r in execute_query(
            spark, f"SELECT * FROM {tgt} TIMESTAMP AS OF {ts1}"
        ).collect()
    }
    assert got_ts == {tuple(r) for r in sql_t.read(version=1).collect()}

    # two time-traveled snapshots of the SAME table join in one statement
    # (version diff — the CDC-ish shape users actually write)
    diff = execute_query(
        spark,
        f"""
        SELECT cur.TransactionId
        FROM {tgt} VERSION AS OF 1 cur
        LEFT ANTI JOIN {tgt} VERSION AS OF 0 old
          ON cur.TransactionId = old.TransactionId
        """,
    ).collect()
    assert {r.TransactionId for r in diff} == {4}

    # dispatches through execute_dml too (single SQL entry point)
    via_dml = execute_dml(
        spark, f"SELECT TransactionId FROM {tgt} VERSION AS OF 0"
    )
    assert {r.TransactionId for r in via_dml.collect()} == {1, 2, 3}


def test_sql_table_changes_matches_change_feed_api(spark, twin_tables):
    """table_changes('t', from[, to]) — Delta's read-side CDC SQL —
    matches the change_feed API with inclusive version bounds, and
    composes with ordinary SQL shapes."""
    from nrtwithdeltalake_spark.pipeline.sqldml import execute_query

    sql_t, _ = twin_tables
    sql_t.merge(
        _df(spark, [(1, "a2", 11.0, "U", 2), (4, "d", 40.0, "I", 2)])
        .drop("op", "seq"),
        ["TransactionId"],
    )                                                              # v1
    sql_t.delete("TransactionId = 2")                              # v2

    def canon(df):
        return {
            (r.TransactionId, r._change_type, r._commit_version)
            for r in df.select(
                "TransactionId", "_change_type", "_commit_version"
            ).collect()
        }

    # path addressing; from=1 inclusive → API starting_version=0
    got = canon(
        execute_query(
            spark, f"SELECT * FROM table_changes('{sql_t.path}', 1)"
        )
    )
    assert got == canon(sql_t.change_feed(starting_version=0))
    assert {v for (_, _, v) in got} == {1, 2}

    # bounded [1, 1] keeps only v1's changes
    got_1 = canon(
        execute_query(
            spark, f"SELECT * FROM table_changes('{sql_t.path}', 1, 1)"
        )
    )
    assert {v for (_, _, v) in got_1} == {1}
    assert got_1 < got

    # composes: aggregate the feed in the same statement
    n_del = execute_query(
        spark,
        f"SELECT count(*) AS n FROM table_changes('{sql_t.path}', 1) "
        "WHERE _change_type = 'delete'",
    ).collect()[0].n
    assert n_del == 1


def test_sql_clone_statement(spark, tmp_path, twin_tables):
    """CREATE TABLE dest [SHALLOW|DEEP] CLONE src [VERSION AS OF n] —
    Delta's clone SQL, shape-matched onto VersionedTable.clone."""
    sql_t, _ = twin_tables
    sql_t.delete("TransactionId = 3")  # v1, so VERSION AS OF matters

    dest = str(tmp_path / "clone_sql")
    res = execute_dml(
        spark,
        f"CREATE TABLE versioned.`{dest}` SHALLOW CLONE "
        f"versioned.`{sql_t.path}` VERSION AS OF 0",
    )
    assert res["version"] == 0
    c = VersionedTable(spark, dest)
    assert c.read().count() == 3  # pre-delete snapshot
    # shallow: references the source's files in place
    assert all(f.startswith(sql_t.path) for f in c.get_commit(0).files)

    dest2 = str(tmp_path / "clone_deep")
    execute_dml(
        spark,
        f"CREATE TABLE versioned.`{dest2}` DEEP CLONE versioned.`{sql_t.path}`",
    )
    c2 = VersionedTable(spark, dest2)
    assert c2.read().count() == 2  # latest (post-delete)
    assert all(f.startswith(dest2) for f in c2.get_commit(0).files)

    with pytest.raises(UnsupportedSqlError, match="destination"):
        execute_dml(
            spark,
            f"CREATE TABLE plain_name CLONE versioned.`{sql_t.path}`",
        )


def test_describe_detail(spark, twin_tables):
    """DESCRIBE DETAIL t — one-row metadata summary (no data scan):
    version, file count, byte size, DV count, column count."""
    sql_t, _ = twin_tables
    sql_t.append(
        _df(spark, [(9, "z", 90.0, "I", 1)]).drop("op", "seq")
    )
    row = execute_dml(
        spark, f"DESCRIBE DETAIL versioned.`{sql_t.path}`"
    ).collect()[0]
    c = sql_t.get_commit()
    assert row.format == "versioned"
    assert row.location == sql_t.path
    assert row.version == 1 == c.version
    assert row.num_files == len(c.files)
    assert row.size_in_bytes > 0
    assert row.num_dv_files == 0
    assert row.num_columns == 3
    assert row.created_at <= row.last_modified
    assert row.identity_columns == [] and row.not_null_columns == []


def test_time_travel_clause_inside_string_literal_not_rewritten(spark, twin_tables):
    """A VERSION AS OF / table_changes shape occurring INSIDE a string
    literal is content, not syntax — the rewriter must leave it alone."""
    from nrtwithdeltalake_spark.pipeline.sqldml import execute_query

    sql_t, _ = twin_tables
    tgt = f"versioned.`{sql_t.path}`"
    rows = execute_query(
        spark,
        f"SELECT 'x VERSION AS OF 99' AS lit, TransactionId "
        f"FROM {tgt} VERSION AS OF 0",
    ).collect()
    assert {r.TransactionId for r in rows} == {1, 2, 3}
    assert all(r.lit == "x VERSION AS OF 99" for r in rows)


def test_tblproperties_lifecycle_and_vacuum_policy(spark, tmp_path, twin_tables):
    """SET/UNSET/SHOW TBLPROPERTIES, plus the load-bearing key:
    versioned.deletedFileRetentionHours becomes vacuum's default
    retain_hours (explicit argument still wins) — Delta's
    deletedFileRetentionDuration shape."""
    sql_t, _ = twin_tables
    tgt = f"versioned.`{sql_t.path}`"

    execute_dml(
        spark,
        f"ALTER TABLE {tgt} SET TBLPROPERTIES "
        "('pipeline.team'='ingest', 'versioned.deletedFileRetentionHours'='48')",
    )
    props = {
        r.key: r.value
        for r in execute_dml(spark, f"SHOW TBLPROPERTIES {tgt}").collect()
    }
    assert props == {
        "pipeline.team": "ingest",
        "versioned.deletedFileRetentionHours": "48",
    }

    import os

    # retention property is load-bearing: overwrite makes v0 reclaimable
    # by count, but the 48h table policy keeps its (recent) files alive
    v0_files = list(sql_t.get_commit(0).files)
    sql_t.overwrite(
        spark.createDataFrame([(1, "x", 1.0)],
                              "TransactionId bigint, name string, amount double")
    )
    rep = sql_t.vacuum(retain_last=1, dry_run=True)
    assert rep["deleted_files"] == 0
    assert all(os.path.exists(f) for f in v0_files)
    # explicit retain_hours beats the property
    rep2 = sql_t.vacuum(retain_last=1, retain_hours=0, dry_run=True)
    assert rep2["deleted_files"] > 0

    # UNSET restores count-based reclamation
    execute_dml(
        spark,
        f"ALTER TABLE {tgt} UNSET TBLPROPERTIES "
        "('versioned.deletedFileRetentionHours')",
    )
    rep3 = sql_t.vacuum(retain_last=1, dry_run=True)
    assert rep3["deleted_files"] > 0

    # IF EXISTS tolerates a missing key; plain UNSET refuses
    execute_dml(spark, f"ALTER TABLE {tgt} UNSET TBLPROPERTIES IF EXISTS ('nope')")
    with pytest.raises(ValueError):
        execute_dml(spark, f"ALTER TABLE {tgt} UNSET TBLPROPERTIES ('nope')")
    # bad value for a validated key refuses at SET time
    with pytest.raises(ValueError):
        execute_dml(
            spark,
            f"ALTER TABLE {tgt} SET TBLPROPERTIES "
            "('versioned.deletedFileRetentionHours'='not-a-number')",
        )


def test_merge_matched_delete_qualified_with_cast_and_interval(spark, twin_tables):
    """Type names and interval units inside a fully-qualified matched-
    DELETE condition must not be mistaken for bare columns."""
    sql_t, _ = twin_tables
    spark.createDataFrame(
        [(3, "c", 30.0, "2", 1)],
        "TransactionId bigint, name string, amount double, op string, seq bigint",
    ).createOrReplaceTempView("dml_src_cast")
    execute_dml(
        spark,
        f"""
        MERGE INTO versioned.`{sql_t.path}` t USING dml_src_cast s
        ON t.TransactionId = s.TransactionId
        WHEN MATCHED AND cast(s.op AS BIGINT) = 2 THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """,
    )
    assert {r.TransactionId for r in sql_t.read().collect()} == {1, 2}


def test_sql_table_changes_timestamp_bounds(spark, tmp_path):
    """table_changes with QUOTED TIMESTAMP bounds (Delta's
    starting/endingTimestamp rules): start = first commit at-or-after,
    end = last commit at-or-before — well-defined because commits stamp
    monotone in-commit timestamps. Mixing a timestamp start with a
    version end works; a start past the latest commit raises."""
    import pytest as _pytest

    from nrtwithdeltalake_spark.pipeline.sqldml import execute_query
    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable

    p = str(tmp_path / "tc")
    t = VersionedTable.create(
        spark, p, spark.createDataFrame([(1, "a")], "id bigint, v string")
    )
    t.append(spark.createDataFrame([(2, "b")], "id bigint, v string"))  # v1
    t.append(spark.createDataFrame([(3, "c")], "id bigint, v string"))  # v2
    ts1 = t.get_commit(1).ts

    got = {
        (r.id, r._commit_version)
        for r in execute_query(
            spark,
            f"SELECT id, _commit_version FROM table_changes('{p}', '{ts1}')",
        ).collect()
    }
    assert got == {(2, 1), (3, 2)}  # from v1 (first at-or-after ts1)

    got = {
        (r.id, r._commit_version)
        for r in execute_query(
            spark,
            "SELECT id, _commit_version FROM "
            f"table_changes('{p}', '{ts1}', '{ts1}')",
        ).collect()
    }
    assert got == {(2, 1)}  # end bound: last at-or-before ts1 = v1

    got = {
        (r.id, r._commit_version)
        for r in execute_query(
            spark,
            "SELECT id, _commit_version FROM "
            f"table_changes('{p}', 1, '{ts1}')",
        ).collect()
    }
    assert got == {(2, 1)}  # mixed version start + timestamp end

    with _pytest.raises(ValueError, match="after the latest"):
        execute_query(
            spark,
            f"SELECT * FROM table_changes('{p}', '{t.get_commit(2).ts + 9999}')",
        )


def test_show_create_table_round_trips(spark, tmp_path):
    """SHOW CREATE TABLE emits RUNNABLE DDL: executing it against a
    fresh path rebuilds a table with the same columns, identity specs,
    NOT NULL set, DEFAULTs, generated expressions, CHECK constraints
    and properties."""
    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable

    src = str(tmp_path / "src")
    execute_dml(
        spark,
        f"""CREATE TABLE versioned.`{src}` (
            id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 5 INCREMENT BY 2),
            name STRING NOT NULL,
            status STRING DEFAULT 'new',
            upper_name STRING GENERATED ALWAYS AS (upper(name)),
            amount DECIMAL(12,2))""",
    )
    t = VersionedTable(spark, src)
    t.add_constraint("amt_pos", "amount > 0")
    execute_dml(
        spark,
        f"ALTER TABLE versioned.`{src}` SET TBLPROPERTIES "
        "('versioned.deletedFileRetentionHours' = '12')",
    )
    stmt = execute_dml(
        spark, f"SHOW CREATE TABLE versioned.`{src}`"
    ).collect()[0].createtab_stmt
    dst = str(tmp_path / "dst")
    for s in stmt.replace(src, dst).split(";\n"):
        execute_dml(spark, s)
    t2 = VersionedTable(spark, dst)
    assert [
        (f.name, f.dataType, f.nullable) for f in t2.schema().fields
    ] == [(f.name, f.dataType, f.nullable) for f in t.schema().fields]
    assert t2.identity_columns() == t.identity_columns()
    assert t2.identity_modes() == t.identity_modes()
    assert t2.not_null_columns() == t.not_null_columns()
    assert t2.column_defaults() == t.column_defaults()
    assert t2.generated_columns() == t.generated_columns()
    assert t2.constraints() == t.constraints()
    assert t2.properties() == t.properties()
    # and the rebuilt table behaves: identity assigned from the spec
    from decimal import Decimal
    t2.append(
        spark.createDataFrame(
            [("a", Decimal("1.50"))], "name string, amount decimal(12,2)"
        )
    )
    assert [r.id for r in t2.read().collect()] == [5]


def test_create_table_generated_referencing_identity_refused(
    spark, tmp_path
):
    """The write path fills generated columns BEFORE identity
    assignment, so `bucket = id % 10` can never resolve at write time —
    CREATE must refuse it loudly (naming the identity column) instead
    of accepting DDL whose first append explodes, and must leave no
    partial table behind."""
    import os

    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable

    p = str(tmp_path / "gen_ident")
    with pytest.raises(UnsupportedSqlError, match="identity"):
        execute_dml(
            spark,
            f"""CREATE TABLE versioned.`{p}` (
                id BIGINT GENERATED ALWAYS AS IDENTITY,
                s STRING,
                bucket BIGINT GENERATED ALWAYS AS (id % 10))""",
        )
    assert not VersionedTable.exists(p) and not os.path.exists(p)
    # a body-column-referencing expression still works end-to-end
    execute_dml(
        spark,
        f"""CREATE TABLE versioned.`{p}` (
            id BIGINT GENERATED ALWAYS AS IDENTITY,
            s STRING,
            s_up STRING GENERATED ALWAYS AS (upper(s)))""",
    )
    t = VersionedTable(spark, p)
    t.append(spark.createDataFrame([("a",)], "s string"))
    r = t.read().collect()[0]
    assert (r.id, r.s_up) == (1, "A")


def test_create_table_failure_never_touches_preexisting_files(
    spark, tmp_path
):
    """A refused CREATE against a directory that already held user data
    must leave that data alone — generated+DEFAULT on one column is
    refused BEFORE the table exists, and a hypothetical post-create
    failure removes only entries the call added."""
    import os

    land = tmp_path / "existing"
    land.mkdir()
    keep = land / "user_data.txt"
    keep.write_text("precious")
    with pytest.raises(UnsupportedSqlError, match="GENERATED"):
        execute_dml(
            spark,
            f"""CREATE TABLE versioned.`{land}` (
                c BIGINT GENERATED ALWAYS AS (1) DEFAULT 5)""",
        )
    assert keep.read_text() == "precious"
    assert sorted(os.listdir(land)) == ["user_data.txt"]  # no partial table


def test_analyze_for_all_columns_whitespace(spark, tmp_path):
    """'FOR ALL  COLUMNS' (any space run) hits the ALL branch."""
    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable

    t = VersionedTable.create(
        spark,
        str(tmp_path / "an"),
        spark.createDataFrame([(1, "a")], "id long, s string"),
    )
    out = execute_dml(
        spark,
        f"ANALYZE TABLE versioned.`{t.path}` COMPUTE STATISTICS "
        "FOR ALL   COLUMNS",
    )
    assert sorted(out["columns"]) == ["id", "s"]


def test_show_create_nested_types_and_quoted_properties(spark, tmp_path):
    """Nested struct field names keep their case, and property values
    carrying apostrophes round-trip through '' escaping."""
    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable

    src = str(tmp_path / "nested_src")
    t = VersionedTable.create(
        spark,
        src,
        spark.createDataFrame(
            [], "id long, payload struct<innerName:string,qty:int>"
        ),
    )
    t.set_properties({"note": "O'Brien's table"})
    stmt = execute_dml(
        spark, f"SHOW CREATE TABLE versioned.`{src}`"
    ).collect()[0].createtab_stmt
    dst = str(tmp_path / "nested_dst")
    for s in stmt.replace(src, dst).split(";\n"):
        execute_dml(spark, s)
    t2 = VersionedTable(spark, dst)
    assert [f.name for f in t2.schema()["payload"].dataType.fields] == [
        "innerName",
        "qty",
    ]
    assert t2.properties()["note"] == "O'Brien's table"
