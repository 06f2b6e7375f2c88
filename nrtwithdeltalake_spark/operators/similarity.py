"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

* ``q_sim_topk``  — exact brute-force cosine top-k for a fixed query set,
  DuckDB-oracle-backed. Dot products via ``zip_with`` + ``aggregate``
  (left-to-right fold in double — same accumulation order as DuckDB's
  ``list_dot_product``, so scores match bit-for-bit before rounding).
* ``q_sim_ann_lsh`` — the scale path: random-hyperplane LSH bucketing;
  candidates share a bucket key with the query, cosine computed only for
  candidates. At 100 TB the bucketed join shuffles (bucket, id) pairs
  instead of crossing every query with every vector.

No Python/pandas in the row path: all vector math is Catalyst
expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.storagelevel import StorageLevel

from ..sources.catalog import load_table
from .helpers import fan_out as _fan_out

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 10


def _as_double(col: str) -> F.Column:
    return F.expr(f"transform({col}, x -> cast(x as double))")


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), "
        f"(acc, v) -> acc + v)"
    )


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for query vectors (vec_id < 5)."""
    emb = _fan_out(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("q_id")
    )
    scored = pairs.select(
        "q_id",
        "vec_id",
        F.round(
            _dot("qv", "v")
            / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("v", "v"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cosine",
                F.col("rn").cast("long").alias("rn"))
    )


ORACLE_SIM_TOPK = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS q_id, v AS qv FROM v WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.q_id, v.vec_id,
         round(list_dot_product(q.qv, v.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(v.v, v.v))), 6) AS cosine
  FROM v CROSS JOIN q
  WHERE v.vec_id != q.q_id
)
SELECT q_id, vec_id AS neighbor_id, cosine, cast(rn as bigint) AS rn
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cosine DESC, vec_id) rn
      FROM scored)
WHERE rn <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed approximate nearest neighbors (the 100 TB path)
# ---------------------------------------------------------------------------

# Tuning: for neighbors at angle θ, a vector pair shares one table's bucket
# with prob (1-θ/π)^N_PLANES; recall ≈ 1-(1-p)^N_TABLES. The test embeddings'
# nearest neighbors sit at cos≈0.3 (θ≈72°, per-plane ≈0.6), so 4 planes ×
# 12 tables ⇒ ~0.8 recall. Corpora with tighter clusters (real embedding
# spaces) support more planes per table, shrinking candidate sets — these two
# knobs are THE scale dial for the 100 TB case.
N_PLANES = 4  # bits per bucket key
N_TABLES = 12  # independent hash tables (OR-amplification)
DIM = 64


def _plane_component(table: int, plane: int, comp: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5),
    derived from a splitmix-style integer mix — no RNG state, identical on
    every executor without broadcasting."""
    x = (table * 1_000_003 + plane * 10_007 + comp * 101 + 12345) & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = x ^ (x >> 16)
    return (x % 100_000) / 100_000.0 - 0.5


def _bucket_expr(vcol: str) -> F.Column:
    """Array of N_TABLES bucket keys: sign-bit signature against the fixed
    hyperplanes, packed into an int per table."""
    tables = []
    for t in range(N_TABLES):
        bits = []
        for p in range(N_PLANES):
            comps = ", ".join(
                repr(_plane_component(t, p, c)) for c in range(DIM)
            )
            bits.append(
                f"CASE WHEN aggregate(zip_with({vcol}, array({comps}), "
                f"(x, y) -> x * y), cast(0.0 as double), (a, v) -> a + v) > 0 "
                f"THEN shiftleft(1, {p}) ELSE 0 END"
            )
        key = " + ".join(bits)
        tables.append(f"struct({t} AS tbl, ({key}) AS bkey)")
    return F.expr(f"array({', '.join(tables)})")


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: only vectors sharing ≥1 of 4 LSH bucket keys with
    a query are scored. Approximate by construction → rows-only check."""
    emb = _fan_out(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    buckets = (
        emb.select("vec_id", "v", F.explode(_bucket_expr("v")).alias("b"))
        .select("vec_id", "v", "b.tbl", "b.bkey")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    qb = (
        buckets.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            "tbl",
            "bkey",
        )
    )
    cand = (
        buckets.join(F.broadcast(qb), ["tbl", "bkey"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "qv", "vec_id", "v")
        .distinct()
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(
            _dot("qv", "v")
            / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("v", "v"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.95) via the same
    LSH tables — all-pairs semantics without the O(n²) cross join.
    Approximate by construction → rows-only check."""
    emb = _fan_out(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    buckets = (
        emb.select("vec_id", "v", F.explode(_bucket_expr("v")).alias("b"))
        .select("vec_id", "v", "b.tbl", "b.bkey")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    l, r = buckets.alias("l"), buckets.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_a"),
            F.col("l.v").alias("va"),
            F.col("r.vec_id").alias("vec_b"),
            F.col("r.v").alias("vb"),
        )
        .distinct()
    )
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(
                _dot("va", "vb")
                / (F.sqrt(_dot("va", "va")) * F.sqrt(_dot("vb", "vb"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.95)
    )


N_PROBE = 4  # IVF cells scanned per query
CENTROID_MOD = 25  # vec_id % 25 == 7 → ~n/25 deterministic coarse centroids


def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: vectors are assigned to
    their nearest coarse centroid (the "cell"); a query scores only
    vectors in its ``N_PROBE`` nearest cells.

    Centroids are a deterministic arithmetic subsample of the corpus
    (``vec_id % CENTROID_MOD == 7``) standing in for k-means means — the
    index structure (assign → invert → probe) is identical; swapping in
    trained centroids changes only the centroid DataFrame. At 100 TB:
    centroids stay broadcast-sized (k ~ sqrt(n) or fixed 2^16), the
    assign step is a broadcast nested-loop argmin inside codegen, and the
    probe join shuffles only (cell, id) pairs — never all-pairs.
    Approximate by construction → rows-only check."""
    emb = _fan_out(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MOD == 7) & (F.col("vec_id") >= N_QUERIES)
    ).select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))

    # assign: argmin over broadcast centroids via min_by on (dist, c_id)
    assigned = (
        emb.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "c_id",
                F.struct(
                    (_dot("v", "v") - F.lit(2.0) * _dot("v", "cv")
                     + _dot("cv", "cv")).alias("d2"),
                    F.col("c_id"),
                ),
            ).alias("cell"),
            F.first("v").alias("v"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # probe lists: each query's N_PROBE nearest cells
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    qd = q.crossJoin(F.broadcast(cents)).select(
        "q_id",
        "qv",
        F.col("c_id").alias("cell"),
        (_dot("qv", "qv") - F.lit(2.0) * _dot("qv", "cv")
         + _dot("cv", "cv")).alias("d2"),
    )
    wq = Window.partitionBy("q_id").orderBy("d2", "cell")
    probes = (
        qd.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBE)
        .select("q_id", "qv", "cell")
    )

    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
    )
    scored = cand.select(
        "q_id",
        "vec_id",
        F.round(
            _dot("qv", "v")
            / (F.sqrt(_dot("qv", "qv")) * F.sqrt(_dot("v", "v"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 max-abs quantization per vector — the standard
    4× storage/bandwidth cut before ANN indexing at scale. Pure Catalyst
    (lambda references the precomputed scale column; no per-element
    rescan). Zero-vectors guarded with an epsilon floor so ANSI-mode
    round(inf)→int can't trap."""
    emb = load_table(spark, sf_dir, "embeddings")
    am = F.expr(
        "greatest(array_max(transform(embedding, y -> abs(cast(y as double)))),"
        " cast(1e-12 as double))"
    )
    return (
        emb.select("vec_id", "embedding", am.alias("am"))
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> "
                "cast(round(cast(x as double) * 127.0 / am) as int))"
            ).alias("q8"),
            F.round(F.col("am") / 127.0, 9).alias("scale"),
        )
    )


ORACLE_EMBED_QUANTIZE = """
WITH a AS (
  SELECT vec_id, embedding,
         greatest(list_max(list_transform(embedding,
                  y -> abs(cast(y as double)))), cast(1e-12 as double)) AS am
  FROM embeddings
)
SELECT vec_id,
       list_transform(embedding,
                      x -> cast(round(cast(x as double) * 127.0 / am) as int))
           AS q8,
       round(am / 127.0, 9) AS scale
FROM a
"""


QUERIES = {
    "q_sim_topk": q_sim_topk,
    "q_sim_ann_lsh": q_sim_ann_lsh,
    "q_sim_ann_ivf": q_sim_ann_ivf,
    "q_dedup_embedding": q_dedup_embedding,
    "q_embed_quantize": q_embed_quantize,
}

ORACLES = {
    "q_sim_topk": ORACLE_SIM_TOPK,
    "q_embed_quantize": ORACLE_EMBED_QUANTIZE,
}
