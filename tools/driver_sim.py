"""Simulates the external driver: fresh plain SparkSession (hostile config:
non-UTC tz, default shuffle partitions), imports __spark_entry__, smoke-runs
entry(), then t2: every queries()[name] vs oracle_sql()[name] via DuckDB."""
import sys, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

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
    s_rows = df.collect(); s_cols = df.columns
    if name not in os_:
        print(f"{name}: rows-only, {len(s_rows)} rows"); continue
    d = con.execute(os_[name]); d_rows = d.fetchall(); d_cols = [x[0] for x in d.description]
    ok_cols = sorted(s_cols) == sorted(d_cols)
    ok_n = len(s_rows) == len(d_rows)
    so = sorted(range(len(s_cols)), key=lambda i: s_cols[i]); do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    norm = lambda v: "NaN" if isinstance(v, float) and math.isnan(v) else v
    ss = sorted(tuple(repr(norm(r[s_cols[i]])) for i in so) for r in s_rows)
    ds = sorted(tuple(repr(norm(r[i])) for i in do) for r in d_rows)
    ok_v = ss == ds
    status = "OK" if (ok_cols and ok_n and ok_v) else "FAIL"
    if status == "FAIL":
        fails.append(name)
        diff = next(((a,b) for a,b in zip(ss,ds) if a!=b), None)
        print(f"{name}: FAIL cols={ok_cols} n={ok_n}({len(s_rows)}/{len(d_rows)}) first_diff={diff}")
    else:
        print(f"{name}: OK ({len(s_rows)} rows)")
print("RESULT:", "ALL PASS" if not fails else f"FAILURES: {fails}")
