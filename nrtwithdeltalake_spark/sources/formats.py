"""Source/sink connectors beyond parquet: CSV, JSON-lines, and JDBC.

The reference's only source is a JDBC subquery scan
(``/root/reference/COPY_MSQL_TO_SILVER.py:86-89``) and its only sink is
Delta (``:193-209``). A complete engine needs the interchange formats a
training-data pipeline actually meets: CSV/JSONL land files from
crawlers and labeling tools; JDBC covers the reference's operational
sources. All readers return plain DataFrames, so everything downstream
(operators, VersionedTable) is format-agnostic.

Scale rules encoded here:

* **Explicit schemas.** ``inferSchema``/JSON schema inference read the
  data twice and can flip types between runs; at 100 TB that is both a
  2× cost and a correctness hazard. Readers take a DDL/StructType schema
  and never infer (a ``sample_infer`` helper exists for exploration and
  caps its scan).
* **Splittability.** Plain CSV/JSONL files are line-splittable and
  parallelize; gzip is not (one task per .gz file). The writers never
  gzip; compressed landing zones should arrive as many small files.
* **JDBC partitioning.** The reference reads over a single cursor (no
  ``partitionColumn`` — BASELINE.md row 4). ``read_jdbc`` requires
  explicit bounds so every read is N parallel range queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _as_schema(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    return T.StructType.fromDDL(schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan with a required explicit schema. ``FAILFAST`` by default:
    silent null-filling (PERMISSIVE) turns format drift into data loss;
    pipelines that want quarantine semantics pass mode='PERMISSIVE' and a
    ``_corrupt_record`` column in the schema."""
    return (
        spark.read.schema(_as_schema(schema))
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", mode)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-lines scan (one object per line — the splittable layout).
    Explicit schema only; nested structs/arrays express naturally in the
    DDL string (e.g. ``'meta struct<lang:string>, tags array<string>'``)."""
    return (
        spark.read.schema(_as_schema(schema))
        .option("mode", mode)
        .json(path)
    )


def sample_infer(
    spark: SparkSession, path: str, fmt: str, sample_rows: int = 10_000
) -> T.StructType:
    """Exploration helper: infer a schema from a bounded sample, to be
    reviewed and then *pinned* in code. Never part of a production read
    path — inference on the full input doubles the scan."""
    reader = spark.read.option("inferSchema", "true").option("header", "true")
    if fmt == "csv":
        df = reader.option("samplingRatio", "0.1").csv(path)
    elif fmt in ("json", "jsonl"):
        df = reader.json(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")
    return df.limit(sample_rows).schema


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink (uncompressed → line-splittable on re-read)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink; nested columns serialize as nested objects."""
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — the other columnar interchange format (Hive/Trino
    ecosystems). Spark's vectorized ORC reader gives the same pushdown/
    pruning properties as parquet; schema comes from the file footer
    (self-describing, unlike CSV/JSONL)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (snappy by default; splittable stripes)."""
    df.write.mode("overwrite").orc(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Hive-layout partitioned parquet sink (``path/col=value/...``) — the
    layout that makes partition pruning free for every engine that reads
    the table. Choose low-cardinality columns; a high-cardinality
    partition key creates a small-files problem instead of pruning."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    query: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC subquery scan, parallelized — the reference's O1 done right.

    The reference reads ``(query) AS SQLTable`` over one cursor
    (``COPY_MSQL_TO_SILVER.py:86-89``: no partitionColumn), serializing
    the whole extract through one task. Bounds are required here: Spark
    issues ``num_partitions`` range-predicate queries in parallel, each
    against the same subquery alias (partitioned reads require the
    ``dbtable`` form — ``query`` + ``partitionColumn`` is rejected).
    Exercised end-to-end against an embedded Derby database in
    ``tests/test_io.py`` (the Derby driver ships with Spark).
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if lower_bound >= upper_bound:
        raise ValueError("lower_bound must be < upper_bound")
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) SQLTable")
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
