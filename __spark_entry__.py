"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``nrtwithdeltalake_spark/``; this module is a
thin adapter over ``nrtwithdeltalake_spark.operators.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nrtwithdeltalake_spark.operators.registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from nrtwithdeltalake_spark.operators.flagship import q_flagship

    return q_flagship(spark, "/root/testdata/sf0.001")


def _rotation_order(names) -> list[str]:
    """Coverage-converging order for the driver's per-round sample:

    1. queries whose LAST driver sample failed (hash/schema/row mismatch
       or an oracle error) — fixes must be re-verified before anything
       else, so known-bad entries sort FIRST, never hide at the back;
    2. queries never sampled by the driver — converge to full coverage;
    3. queries that passed cleanly — re-sampled last.

    (The local pytest oracle sweep covers ALL queries every round; this
    only affects which subset lands in the driver's artifact.)"""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    last_status: dict[str, bool] = {}  # name -> cleanly passed in latest sample
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                last_status[name] = False
                continue
            err = rec.get("err")
            declared_rows_only = err == "no_oracle"
            clean = declared_rows_only or (
                rec.get("hash_match") is True
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and err is None
            )
            last_status[name] = clean

    def rank(n: str) -> int:
        if n not in last_status:
            return 1  # never sampled
        return 0 if not last_status[n] else 2  # failed first, clean last

    return sorted(names, key=lambda n: (rank(n), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered
    untested-in-driver-artifacts first (see _rotation_order)."""
    q = all_queries()
    return {n: q[n] for n in _rotation_order(q)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query; keys absent here are
    declared non-SQL-expressible ops (rows-only check)."""
    o = all_oracles()
    return {n: o[n] for n in _rotation_order(o)}
