"""Measure-first evidence for round 12's maintenance ops: REORG PURGE
cost vs full compact on the same DV debt, and COPY INTO registry
overhead. Appends nothing; prints a summary to stdout for the
TABLE_BENCH.md addendum."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.session import build_spark
from nrtwithdeltalake_spark.pipeline.tables import VersionedTable

N = 4_800_000
FILES = 16


def main() -> None:
    spark = build_spark(app_name="reorg_bench", shuffle_partitions=32)
    base = tempfile.mkdtemp(prefix="reorg_bench_")
    try:
        df = (
            spark.range(N)
            .withColumn("k", F.col("id") % 1000)
            .withColumn("s", F.concat(F.lit("row_"), F.col("id")))
            .repartitionByRange(FILES, "id")
        )

        def fresh(name: str) -> VersionedTable:
            t = VersionedTable.create(spark, os.path.join(base, name), df)
            # range-clustered files: the delete predicate touches ~2/16
            return t

        # -- DV delete touching a bounded file subset -------------------
        t1 = fresh("purge")
        t0 = time.time()
        t1.delete(f"id < {N // 8}", use_dv=True)
        dv_s = time.time() - t0
        debt = len(t1._dv_referenced_files(t1.get_commit()))
        t0 = time.time()
        t1.reorg_purge()
        purge_s = time.time() - t0
        kept = len(t1.get_commit().files)

        t2 = fresh("compact")
        t2.delete(f"id < {N // 8}", use_dv=True)
        t0 = time.time()
        t2.compact()
        compact_s = time.time() - t0

        # -- COPY INTO: load + idempotent re-run -------------------------
        land = os.path.join(base, "land")
        df.limit(200_000).write.parquet(land)
        t3 = VersionedTable.create(
            spark,
            os.path.join(base, "copy"),
            spark.createDataFrame([], "id long, k long, s string"),
        )
        t0 = time.time()
        out1 = t3.copy_into(land)
        load_s = time.time() - t0
        t0 = time.time()
        out2 = t3.copy_into(land)
        rerun_s = time.time() - t0

        print(
            f"rows={N} files={FILES} | dv_delete={dv_s:.2f}s "
            f"debt_files={debt} | reorg_purge={purge_s:.2f}s "
            f"(files_after={kept}) vs full_compact={compact_s:.2f}s "
            f"ratio={purge_s / compact_s:.2f}x | "
            f"copy_into load {out1['files_loaded']}f={load_s:.2f}s, "
            f"idempotent re-run {out2['files_loaded']}f={rerun_s:.2f}s"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
