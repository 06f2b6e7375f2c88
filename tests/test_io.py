"""Write-layout tests: Hive-style date partitioning (the reference's dead
code at COPY_MSQL_TO_SILVER.py:78-81, done right) and the partition
pruning it buys at read time."""

from __future__ import annotations

import pytest
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


def test_csv_roundtrip_exact(spark, sf_dir, tmp_path):
    """CSV write → schema'd FAILFAST read returns the exact frame
    (formats.py source/sink contract; no inference)."""
    from nrtwithdeltalake_spark.sources import formats

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    out = str(tmp_path / "orders_csv")
    formats.write_csv(orders, out)
    back = formats.read_csv(
        spark, out, "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    assert back.schema == orders.schema
    a = sorted(tuple(r) for r in orders.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_jsonl_roundtrip_nested(spark, tmp_path):
    """JSONL carries nested structs/arrays losslessly with a pinned DDL
    schema."""
    from nrtwithdeltalake_spark.sources import formats

    df = spark.createDataFrame(
        [(1, {"lang": "en"}, ["a", "b"]), (2, {"lang": "de"}, [])],
        "id long, meta struct<lang:string>, tags array<string>",
    )
    out = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(df, out)
    back = formats.read_jsonl(
        spark, out, "id long, meta struct<lang:string>, tags array<string>"
    )
    got = {r.id: (r.meta.lang, list(r.tags)) for r in back.collect()}
    assert got == {1: ("en", ["a", "b"]), 2: ("de", [])}


def test_csv_failfast_rejects_malformed(spark, tmp_path):
    """FAILFAST default: format drift raises instead of null-filling."""
    import pytest as _pytest

    from nrtwithdeltalake_spark.sources import formats

    p = tmp_path / "bad"
    p.mkdir()
    (p / "part-0.csv").write_text("id,name\n1,ok\nnot_a_number,drifted\n")
    with _pytest.raises(Exception):
        formats.read_csv(spark, str(p), "id long, name string").collect()


def test_jdbc_requires_partitioning(spark):
    """read_jdbc refuses unpartitioned/bogus bounds (the reference's
    single-cursor mistake is unrepresentable)."""
    import pytest as _pytest

    from nrtwithdeltalake_spark.sources import formats

    with _pytest.raises(ValueError):
        formats.read_jdbc(spark, "jdbc:x", "SELECT 1", "id", 10, 5, 4)
    with _pytest.raises(ValueError):
        formats.read_jdbc(spark, "jdbc:x", "SELECT 1", "id", 0, 10, 0)


def test_partitioned_parquet_sink_prunes(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F2

    from nrtwithdeltalake_spark.sources import formats

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    formats.write_partitioned_parquet(docs, out, ["lang"])
    back = spark.read.parquet(out).filter(F2.col("lang") == "en")
    plan = inspect.formatted_plan(back)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketing contract (SURVEY.md §4 file-layout row): two tables
    bucketed by the join key on the same bucket count join with NO
    exchange on either side — the co-location strategy that turns a
    repeated 100 TB shuffle join into a local zip. (Broadcast disabled
    so the shuffle question is actually exercised.)"""
    from pyspark.sql import functions as F2

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    try:
        (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
         .mode("overwrite").saveAsTable("b_orders"))
        (cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
         .mode("overwrite").saveAsTable("b_customer"))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bo, bc = spark.table("b_orders"), spark.table("b_customer")
            joined = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
                "o_orderkey", "c_mktsegment"
            )
            assert inspect.num_shuffles(joined) == 0, inspect.formatted_plan(joined)
            want = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
            assert joined.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trip preserves values and types exactly, and the
    vectorized ORC reader accepts predicate pushdown like parquet."""
    from nrtwithdeltalake_spark.sources import formats
    from nrtwithdeltalake_spark.sources.catalog import load_table
    from nrtwithdeltalake_spark.plans import inspect

    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    formats.write_orc(src, path)
    back = formats.read_orc(spark, path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0
    filtered = back.filter(F.col("o_orderkey") < 100).select("o_orderkey")
    pushed = " ".join(inspect.pushed_filters(filtered))
    assert "o_orderkey" in pushed, pushed


def test_jdbc_partitioned_extract_end_to_end(spark, tmp_path):
    """O1 live: the reference's JDBC subquery extract
    (COPY_MSQL_TO_SILVER.py:86-89) run for real against an embedded
    Derby database (driver ships with Spark): the WHERE clause ships to
    the source inside the subquery alias, the scan parallelizes into
    num_partitions range-predicate cursors, and the extract merges into
    a silver VersionedTable exactly like the reference's bronze→silver
    loop."""
    from pyspark.sql import functions as F

    from nrtwithdeltalake_spark.pipeline.tables import VersionedTable
    from nrtwithdeltalake_spark.sources.formats import read_jdbc

    url = "jdbc:derby:memory:jdbc_e2e;create=true"
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE txns (id INT PRIMARY KEY, name VARCHAR(50), amount DOUBLE)"
    )
    for i in range(1, 101):
        st.execute(f"INSERT INTO txns VALUES ({i}, 'n{i}', {i * 1.5})")
    st.close()
    conn.close()

    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = read_jdbc(
        spark,
        "jdbc:derby:memory:jdbc_e2e",
        "SELECT id, name, amount FROM txns WHERE id <= 80",
        "id",
        1,
        81,
        8,
        props,
    )
    assert df.rdd.getNumPartitions() == 8  # parallel range cursors
    rows = sorted((r.ID, r.NAME, r.AMOUNT) for r in df.collect())
    assert len(rows) == 80  # subquery predicate ran at the source
    assert rows[0] == (1, "n1", 1.5) and rows[-1] == (80, "n80", 120.0)

    # bronze→silver: the extract lands via merge, like the reference
    silver = str(tmp_path / "silver")
    t = VersionedTable.create(
        spark,
        silver,
        df.select(
            F.col("ID").alias("id"),
            F.col("NAME").alias("name"),
            F.col("AMOUNT").alias("amount"),
        ).filter("id <= 40"),
    )
    t.merge(
        df.select(
            F.col("ID").alias("id"),
            F.col("NAME").alias("name"),
            F.col("AMOUNT").alias("amount"),
        ),
        ["id"],
    )
    assert t.read().count() == 80

    with pytest.raises(ValueError, match="lower_bound"):
        read_jdbc(spark, "jdbc:derby:memory:x", "SELECT 1", "id", 5, 5, 2, props)
