"""Per-query micro-benchmark for optimization iteration.

Usage: python tools/microbench.py <query> [<query> ...] [--reps N]
Times each named query through the noop sink (guide §1.4) on the same
session/bench methodology as bench.py (min of N reps, default 5) and
prints one line per query plus a loadavg annotation so contaminated
measurements are self-identifying. NOT the official bench — bench.py
stays the driver contract.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nrtwithdeltalake_spark.session import build_spark
from nrtwithdeltalake_spark.operators.registry import all_queries
from nrtwithdeltalake_spark.sources.catalog import TABLES, load_table
from bench import SF_DIR


def main() -> None:
    args = sys.argv[1:]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    spark = build_spark(app_name="microbench")
    queries = all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load_table(spark, SF_DIR, t).limit(1).collect()
    for name in args:
        spark.sparkContext.setJobDescription(f"microbench:{name}")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(times):.3f} all={[round(t, 3) for t in times]}"
            f" load1={os.getloadavg()[0]:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
