"""Audit every registered oracle's DuckDB output types.

The official driver canonicalizes results through pandas (``.df()`` /
``sort_values``); two DuckDB output shapes break that path even when values
are semantically identical to Spark's:

* HUGEINT / DECIMAL(38,0) (what ``sum(BIGINT)`` returns) — pandas
  materializes these as float64, so ``95`` hashes differently from ``95.0``.
* LIST-typed cells — ``sort_values`` → ``factorize`` raises
  ``unhashable type: 'list'``.

This script runs every ``oracle_sql()`` entry at sf0.001 and reports any
output column whose DuckDB type is HUGEINT, DECIMAL(38,0), or LIST/ARRAY,
plus any column whose pandas dtype diverges from the Spark dtype class
(int vs float). Exit code 1 if any offender is found.

Usage: python tools/oracle_type_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nrtwithdeltalake_spark.sources.catalog import TABLES  # noqa: E402

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL(38,0)")


def audit(sf_dir: str) -> dict[str, list[str]]:
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders: dict[str, list[str]] = {}
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols = rel.columns
            types = [str(t).upper() for t in rel.types]
        except Exception as exc:  # noqa: BLE001 — report, don't crash the audit
            offenders[name] = [f"<oracle error: {exc}>"]
            continue
        bad = []
        for c, ty in zip(cols, types):
            if any(ty == b or ty.startswith(b) for b in BAD_TYPES):
                bad.append(f"{c}: {ty}")
            if ty.endswith("[]") or ty.startswith("STRUCT") or ty.startswith("MAP"):
                bad.append(f"{c}: {ty}")
        if bad:
            offenders[name] = bad
    return offenders


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = audit(sf)
    if not bad:
        print("OK: no oracle output column is HUGEINT / DECIMAL(38,0) / LIST")
        sys.exit(0)
    for name, cols in sorted(bad.items()):
        print(f"{name}: {', '.join(cols)}")
    print(f"\n{len(bad)} offending oracles")
    sys.exit(1)
