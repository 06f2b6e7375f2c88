"""Scalar function packs (SURVEY.md §2.2 'scalar functions' row).

Generalize the reference's scalar surface: date formatting/CONVERT (O17,
``/root/reference/COPY_MSQL_TO_SILVER.py:131,176,237``), CASE WHEN (O15,
``:231,235-240``), COALESCE (O16, ``:231``), string split/concat (O22-O23,
``:115-117,163,203``), plus JSON and math packs the §2.2 capability bar adds.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python in the row path. Integer-valued outputs are
cast to long on both engines so the oracle schema comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime pack: format (≡ CONVERT(VARCHAR(21), ts, 120)), extract,
    interval arithmetic, epoch seconds."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("odate_str"),
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("odate_plus30"),
        F.col("o_orderdate").cast("timestamp").cast("long").alias("epoch_s"),
    )


ORACLE_SCALAR_DATETIME = """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate_str,
       cast(year(o_orderdate) as bigint) AS o_year,
       cast(month(o_orderdate) as bigint) AS o_month,
       cast(quarter(o_orderdate) as bigint) AS o_quarter,
       cast(day(o_orderdate) as bigint) AS o_day,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS odate_plus30,
       cast(epoch(o_orderdate) as bigint) AS epoch_s
FROM orders
"""


def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack: the reference splits dotted/comma-packed names on the
    driver (O22, :115-116,163,203) — here split runs on data, distributed."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.split("c_name", "#").getItem(1).cast("long").alias("cust_num"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("-", F.col("c_mktsegment"), F.substring("c_name", 1, 8)).alias(
            "seg_tag"
        ),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
    )


ORACLE_SCALAR_STRING = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       cast(string_split(c_name, '#')[2] as bigint) AS cust_num,
       cast(length(c_name) as bigint) AS name_len,
       lpad(cast(c_custkey as varchar), 10, '0') AS key_padded,
       concat_ws('-', c_mktsegment, substr(c_name, 1, 8)) AS seg_tag,
       replace(c_name, 'Customer', 'Cust') AS name_short
FROM customer
"""


def q_scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pack: CASE WHEN (O15), COALESCE/NULLIF (O16),
    GREATEST/LEAST."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif(F.col("c_acctbal"), F.lit(0.0)), F.lit(-1.0)).alias(
            "bal_nz"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_pos"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_cap"),
        (F.col("c_nationkey") % 5).cast("long").alias("nation_mod"),
    )


ORACLE_SCALAR_CONDITIONAL = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_bucket,
       coalesce(nullif(c_acctbal, 0.0), -1.0) AS bal_nz,
       greatest(c_acctbal, 0.0) AS bal_pos,
       least(c_acctbal, 1000.0) AS bal_cap,
       cast(c_nationkey % 5 as bigint) AS nation_mod
FROM customer
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack. +,-,*,/ and sqrt are IEEE-deterministic cross-engine; libm
    functions (ln, pow) are rounded to 6 dp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r2"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
    )


ORACLE_SCALAR_MATH = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 2) AS price_r2,
       abs(l_discount - 0.05) AS disc_dev,
       sqrt(l_extendedprice) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       cast(ceil(l_quantity) as bigint) AS qty_ceil,
       cast(floor(l_quantity) as bigint) AS qty_floor,
       cast(l_orderkey % 7 as bigint) AS key_mod7
FROM lineitem
"""


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON pack over the semi-structured ``events.props`` column —
    capability the reference's flat schema never exercised but §2.2
    declares (SURVEY.md §1 'nested types')."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.when(k.isNotNull(), 1).otherwise(0).cast("long").alias("has_k"),
        (k % 10).cast("long").alias("k_bucket"),
    )


ORACLE_SCALAR_JSON = """
SELECT event_id,
       cast(json_extract_string(props, '$.k') as bigint) AS k_val,
       cast(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                 THEN 1 ELSE 0 END as bigint) AS has_k,
       cast(cast(json_extract_string(props, '$.k') as bigint) % 10 as bigint)
           AS k_bucket
FROM events
"""


def q_scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic/content hash pack (md5, sha2-256) — the primitives
    under content addressing, dedup keys, and cache keys; both engines
    produce identical hex."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.md5(payload).alias("h_md5"),
        F.sha2(payload, 256).alias("h_sha256"),
        F.length(F.sha2(payload, 256)).cast("long").alias("hex_len"),
    )


ORACLE_SCALAR_HASH = """
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       cast(length(sha256(text)) as bigint) AS hex_len
FROM documents
"""


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    lambda family (filter/transform/exists/aggregate) that keeps
    nested-type row math JVM-side (codegen) instead of exploding or
    dropping to Python. Per-row only: no shuffle at any scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size(v).cast("long").alias("dims"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(F.array_max(F.transform(v, lambda x: F.abs(x))), 6).alias(
            "max_abs"
        ),
        F.exists(v, lambda x: F.abs(x) > 0.2).cast("long").alias("has_big"),
        # in-order left fold: deterministic double accumulation per row
        F.round(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("el_sum"),
    )


ORACLE_ARRAY_OPS = """
SELECT vec_id,
       cast(len(embedding) as bigint) AS dims,
       cast(len(list_filter(embedding::DOUBLE[], x -> x > 0)) as bigint)
           AS n_pos,
       round(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 6)
           AS max_abs,
       cast(len(list_filter(embedding::DOUBLE[], x -> abs(x) > 0.2)) > 0
            as bigint) AS has_big,
       round(list_aggregate(embedding::DOUBLE[], 'sum'), 6) AS el_sum
FROM embeddings
"""


def q_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-declared JSON parsing: ``from_json`` with an explicit
    struct schema parses ``events.props`` ONCE into typed columns —
    the scale-correct path when several fields are consumed (per-path
    ``get_json_object``, exercised by q_scalar_json, re-parses the
    string for every path). Malformed documents yield typed nulls
    (PERMISSIVE), which the aggregation then counts — the data-quality
    signal a 100 TB ingest wants for free."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k BIGINT").alias("p"),
    ).select(F.col("p.k").alias("k"))
    return (
        parsed.groupBy((F.col("k") % 5).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_null"),
        )
        .orderBy(F.asc_nulls_first("k_mod"))
    )


ORACLE_JSON_TYPED = """
WITH parsed AS (
  SELECT cast(json_extract_string(props, '$.k') as bigint) AS k FROM events
)
SELECT k % 5 AS k_mod, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
FROM parsed GROUP BY k % 5
ORDER BY k_mod NULLS FIRST
"""


def q_scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode error-safe scalar family (``try_divide`` /
    ``try_cast`` / ``try_element_at``): under Spark 4's default ANSI
    semantics a division by zero, bad cast, or out-of-bounds index
    FAILS THE JOB; the try_* forms return NULL instead — the difference
    between one malformed row poisoning a 100 TB pipeline stage and a
    null you can quarantine downstream. Each expression here is built
    to hit both outcomes deterministically (zero vs non-zero
    denominators, parseable vs non-parseable strings, in- vs
    out-of-bounds indexes); the oracle mirrors the NULL contract with
    guards/TRY_CAST. Single scan+project, codegen, zero shuffles."""
    ev = load_table(spark, sf_dir, "events")
    denom = (F.col("event_id") % 3).cast("long")
    mixed = F.concat(
        F.col("event_id").cast("string"),
        F.when(F.col("event_id") % 2 == 1, F.lit("x")).otherwise(F.lit("")),
    )
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), denom).alias("safe_div"),
        mixed.try_cast("bigint").alias("parsed_id"),
        F.try_element_at(
            F.split(F.col("event_type"), "i"), F.lit(3)
        ).alias("third_piece"),
    )


ORACLE_SCALAR_TRY = """
SELECT event_id,
       CASE WHEN event_id % 3 = 0 THEN NULL
            ELSE value / (event_id % 3) END AS safe_div,
       TRY_CAST(concat(cast(event_id as varchar),
                       CASE WHEN event_id % 2 = 1 THEN 'x' ELSE '' END)
                AS BIGINT) AS parsed_id,
       string_split(event_type, 'i')[3] AS third_piece
FROM events
"""


def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: per-user event-type counts built into a real
    map column (``map_from_entries``), operated on with the map lambda
    family (map_filter / transform_values / map_keys), then exploded
    back to rows for the oracle — proving the nested-map surface works
    end-to-end while keeping every step JVM-side. The reference's flat
    schema never needed maps; a feature-store consumer of the silver
    events table does (per-entity feature bags).

    Plan: one partial-aggregatable (user, type) count, one user-grain
    map assembly, one in-codegen explode — the map never crosses an
    engine boundary (DuckDB compares the exploded row form)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bags = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("bag")
    )
    enriched = bags.select(
        "user_id",
        F.map_filter(F.col("bag"), lambda k, v: v >= 2).alias("hot"),
        F.size(F.map_keys(F.col("bag"))).cast("long").alias("n_types"),
    )
    return enriched.select(
        "user_id",
        "n_types",
        F.explode_outer(
            F.transform_values(F.col("hot"), lambda k, v: v * 10)
        ).alias("etype", "cnt_x10"),
    )


ORACLE_MAP_OPS = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY user_id, event_type
), n AS (
  SELECT user_id, cast(count(*) as bigint) AS n_types
  FROM counts GROUP BY user_id
), hot AS (
  SELECT user_id, event_type AS etype, cnt * 10 AS cnt_x10
  FROM counts WHERE cnt >= 2
)
SELECT n.user_id, n.n_types, h.etype, h.cnt_x10
FROM n LEFT JOIN hot h ON n.user_id = h.user_id
"""


QUERIES = {
    "q_scalar_try": q_scalar_try,
    "q_map_ops": q_map_ops,
    "q_array_ops": q_array_ops,
    "q_json_typed": q_json_typed,
    "q_scalar_datetime": q_scalar_datetime,
    "q_scalar_string": q_scalar_string,
    "q_scalar_conditional": q_scalar_conditional,
    "q_scalar_math": q_scalar_math,
    "q_scalar_json": q_scalar_json,
    "q_scalar_hash": q_scalar_hash,
}

ORACLES = {
    "q_scalar_try": ORACLE_SCALAR_TRY,
    "q_map_ops": ORACLE_MAP_OPS,
    "q_array_ops": ORACLE_ARRAY_OPS,
    "q_json_typed": ORACLE_JSON_TYPED,
    "q_scalar_datetime": ORACLE_SCALAR_DATETIME,
    "q_scalar_string": ORACLE_SCALAR_STRING,
    "q_scalar_conditional": ORACLE_SCALAR_CONDITIONAL,
    "q_scalar_math": ORACLE_SCALAR_MATH,
    "q_scalar_json": ORACLE_SCALAR_JSON,
    "q_scalar_hash": ORACLE_SCALAR_HASH,
}
