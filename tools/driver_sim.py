"""Simulates the external driver: fresh plain SparkSession (hostile config:
non-UTC tz, default shuffle partitions), imports __spark_entry__, smoke-runs
entry(), then t2: every queries()[name] vs oracle_sql()[name] via DuckDB.

Round-10 fidelity fix: canonicalization now goes through PANDAS on both
sides (Spark ``toPandas()``, DuckDB ``.df()``) exactly like the official
driver — the r09 reds proved ``fetchall()`` hides HUGEINT→float64 flips
and unhashable list cells. Shares ``tests.oracle.canon_frame``.
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

from tests.oracle import canon_frame

# deliberately NOT the engine's session factory; hostile tz probe
spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

rows = e.entry(spark).collect()
print(f"SMOKE entry(): {len(rows)} rows ->", rows[0].asDict() if rows else None)

qs, os_ = e.queries(), e.oracle_sql()
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

only = sys.argv[1:]  # optional name-prefix filters for quick iteration
if only:
    qs = {k: v for k, v in qs.items() if any(k.startswith(p) for p in only)}

fails = []
for name in sorted(qs):
    df = qs[name](spark, sf)
    if name not in os_:
        print(f"{name}: rows-only, {df.count()} rows"); continue
    try:
        s_pdf = df.toPandas()
        d_pdf = con.execute(os_[name]).df()
        ok_cols = sorted(s_pdf.columns) == sorted(d_pdf.columns)
        ok_n = len(s_pdf) == len(d_pdf)
        ss = sorted(canon_frame(s_pdf))
        ds = sorted(canon_frame(d_pdf))
        ok_v = ss == ds
    except Exception as exc:  # canonicalizer crash == driver FAIL
        fails.append(name)
        print(f"{name}: FAIL canonicalizer error: {exc}")
        continue
    if not (ok_cols and ok_n and ok_v):
        fails.append(name)
        diff = next(((a, b) for a, b in zip(ss, ds) if a != b), None)
        print(f"{name}: FAIL cols={ok_cols} n={ok_n}({len(s_pdf)}/{len(d_pdf)}) first_diff={diff}")
    else:
        print(f"{name}: OK ({len(s_pdf)} rows)")
print("RESULT:", "ALL PASS" if not fails else f"FAILURES: {fails}")
