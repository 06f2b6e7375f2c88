"""Write-layout tests: Hive-style date partitioning (the reference's dead
code at COPY_MSQL_TO_SILVER.py:78-81, done right) and the partition
pruning it buys at read time."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.plans import inspect
from nrtwithdeltalake_spark.sources.catalog import load_table


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.partitionBy("day").mode("overwrite").parquet(out)

    days = [r.day for r in ev.select("day").distinct().collect()]
    assert len(days) > 1, "fixture spans one day; partition test is vacuous"
    pick = sorted(days)[0]

    back = spark.read.parquet(out).filter(F.col("day") == pick)
    plan = inspect.formatted_plan(back)
    # partition filter must reach the scan (directory pruning, not a scan
    # of all partitions then filter)
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200], plan
    want = ev.filter(F.col("day") == pick).count()
    assert back.count() == want
