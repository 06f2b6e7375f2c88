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


def _sample_history(artifact_dir: str) -> tuple[dict, dict]:
    """Parse every CORRECTNESS_r*.json under ``artifact_dir`` into
    (last_status, last_round): per query name, whether its LATEST
    sample passed cleanly and the round number it last appeared in.
    Round numbers come from the filename (``CORRECTNESS_r07.json`` →
    7), so ordering is robust past two digits."""
    import glob
    import json
    import re

    last_status: dict[str, bool] = {}
    last_round: dict[str, int] = {}
    paths = []
    for p in glob.glob(os.path.join(artifact_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            paths.append((int(m.group(1)), p))
    for rnd, p in sorted(paths):
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            last_round[name] = rnd
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
    return last_status, last_round


def _rotation_order(names, artifact_dir: str | None = None) -> list[str]:
    """Coverage-converging order for the driver's per-round sample:

    1. queries whose LAST driver sample failed (hash/schema/row mismatch
       or an oracle error) — fixes must be re-verified before anything
       else, so known-bad entries sort FIRST, never hide at the back;
    2. queries never sampled by the driver — converge to full coverage;
    3. queries that passed cleanly — LEAST-RECENTLY-SAMPLED first, so
       the official record of every query keeps refreshing instead of
       the same alphabetical head being re-sampled forever; name is
       only the final tiebreak within one round.

    (The local pytest oracle sweep covers ALL queries every round; this
    only affects which subset lands in the driver's artifact.)"""
    if artifact_dir is None:
        artifact_dir = os.path.dirname(os.path.abspath(__file__))
    last_status, last_round = _sample_history(artifact_dir)

    def key(n: str):
        if n not in last_status:
            return (1, 0, n)  # never sampled
        if not last_status[n]:
            return (0, last_round.get(n, 0), n)  # failed first
        return (2, last_round.get(n, 0), n)  # clean: oldest record first

    return sorted(names, key=key)


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
