"""DuckDB-oracle comparison harness mirroring the driver's t2 check:
row-count + schema + order-insensitive value comparison (we compare full
sorted frames — strictly stronger than a hash)."""

from __future__ import annotations

import math

import duckdb

from nrtwithdeltalake_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> list[tuple]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchall(), [d[0] for d in con.description]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result ≡ DuckDB result, order-insensitive, exact values."""
    spark_cols = spark_df.columns
    spark_rows = spark_df.collect()
    duck_rows, duck_cols = run_oracle(oracle_sql, sf_dir)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    duck_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])

    def key_s(row):
        return tuple(repr(_norm(row[spark_cols[i]])) for i in order)

    def key_d(row):
        return tuple(repr(_norm(row[i])) for i in duck_order)

    s_sorted = sorted(key_s(r) for r in spark_rows)
    d_sorted = sorted(key_d(r) for r in duck_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, f"value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
