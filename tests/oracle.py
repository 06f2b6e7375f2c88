"""DuckDB-oracle comparison harness mirroring the driver's t2 check.

Fidelity note (round-10 fix): the official driver canonicalizes BOTH
result sides through **pandas** — DuckDB via ``.df()``, after which a
``sort_values`` + per-cell hash runs. Two DuckDB output shapes survive a
python-``fetchall()`` compare but break the pandas path:

* ``sum(BIGINT)`` → HUGEINT → pandas float64, so ``95`` vs ``95.0``
  hash-mismatch even though python's unbounded ints made them equal here;
* list-typed cells, which ``sort_values`` → ``factorize`` cannot hash
  (``TypeError: unhashable type: 'list'`` — the r09 ``q_embed_quantize``
  red).

This module therefore routes both sides through pandas exactly like the
driver (Spark ``toPandas()``, DuckDB ``.df()``), sorts rows with
``sort_values`` over the name-sorted columns, and compares normalized
cell reprs that PRESERVE the int-vs-float distinction. A compare that
passes here is a compare that passes the official gate.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd

from nrtwithdeltalake_spark.sources.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run an oracle query; return a pandas frame exactly as the
    driver's canonicalizer receives it (``.df()``, not ``fetchall``)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon_cell(v) -> str:
    """Normalize one pandas cell to a comparison string. Deliberately
    keeps int64 vs float64 distinct (the driver does) while unifying
    the date/timestamp container types the two engines use."""
    if v is None:
        return "NULL"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray, dict)):
        # The driver's canonicalizer CRASHES on these (unhashable in
        # sort_values). Fail loudly so no oracle ships with one.
        raise AssertionError(
            f"list/struct cell {type(v).__name__} in oracle compare — the "
            "driver's pandas canonicalizer cannot hash it; serialize with "
            "array_join (see q_agg_array)"
        )
    return repr(v)


def canon_frame(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Mirror the driver's _canon: name-sorted columns, sort_values over
    all columns (raises on unhashable cells exactly like the driver),
    then normalized cell reprs."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    return [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert Spark result ≡ DuckDB result through the driver's own
    pandas canonicalization path, order-insensitive, exact values."""
    spark_pdf = spark_df.toPandas()
    duck_pdf = run_oracle(oracle_sql, sf_dir)

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )

    s_rows = sorted(canon_frame(spark_pdf))
    d_rows = sorted(canon_frame(duck_pdf))
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
