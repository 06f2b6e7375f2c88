"""Distributed Lloyd k-means over embedding columns — the training step
for IVF indexes (``q_sim_ann_ivf`` consumes the centroids) and the
engine's demonstration iterative algorithm.

Design for 100 TB:

* **Data never leaves the cluster.** Per iteration, only the k×dim
  centroid matrix crosses the driver (to be re-broadcast); assignment is
  a broadcast argmin inside codegen and the M-step is one
  partial-aggregatable groupBy(cluster, dim) — the exchange carries
  k × dim × map-partitions rows, independent of corpus size.
* **Deterministic end to end.** Init picks the k lowest xxhash64(id)
  rows (seeded, order-free); the M-step averages integer-quantized
  elements (floor(x·1e6)) so partial sums are exact under any
  partitioning; argmin ties break on cluster id. Rerunning training on
  the same data yields bit-identical centroids — retries and speculative
  tasks can't fork the model.
* **Driver loop is metadata-only.** ``iters`` synchronous barriers, each
  a Spark job; the loop variable is the centroid matrix, not data. This
  is the canonical shape for iterative ML on Spark (same as MLlib's
  impl, which this intentionally avoids depending on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = 1_000_000  # element quantization for exact mean partials


def _assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast argmin via min_by over
    (distance², cluster) — ties take the lowest cluster id."""
    d2 = (
        F.aggregate(
            F.zip_with("v", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ).alias("d2")
    return (
        emb.crossJoin(F.broadcast(cents))
        .select("id", "v", "cluster", d2)
        .groupBy("id")
        .agg(
            F.min_by("cluster", F.struct("d2", "cluster")).alias("cluster"),
            F.first("v").alias("v"),
            F.min("d2").alias("d2"),
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Fit k-means; returns (centroids DataFrame [cluster, cv], inertia
    per iteration). ``emb[vec_col]`` is an array column; cast to double
    internally."""
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    data = emb.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    # deterministic seeding: k lowest-hash rows (uniform, order-free)
    cents = (
        data.withColumn("__h", F.xxhash64("id"))
        .orderBy("__h", "id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("__h", "id")) - 1).alias(
                "cluster"
            ),
            F.col("v").alias("cv"),
        )
    )
    inertia: list[float] = []
    for _ in range(iters):
        assigned = _assign(data, cents)
        # inertia in quantized-integer space: exact, order-independent
        it = (
            assigned.agg(
                F.sum(F.floor(F.col("d2") * _Q)).alias("s")
            ).collect()[0]["s"]
        )
        inertia.append(it / _Q)
        # M-step: per-(cluster, dim) exact quantized mean, reassembled
        flat = assigned.select(
            "cluster", F.posexplode("v").alias("dim", "x")
        ).select("cluster", "dim", F.floor(F.col("x") * _Q).alias("q"))
        means = flat.groupBy("cluster", "dim").agg(
            (F.sum("q").cast("double") / F.count(F.lit(1)) / _Q).alias("m")
        )
        cents = (
            means.groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("dm")
            )
            .select(
                "cluster",
                F.expr("transform(dm, s -> s.m)").alias("cv"),
            )
        )
        # k×dim only: safe to materialize so the next iteration's lineage
        # doesn't stack (iterative-plan blowup is the classic Spark trap)
        cents = cents.sparkSession.createDataFrame(
            cents.collect(), schema=cents.schema
        )
    return cents, inertia


def assign_clusters(
    emb: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its trained cluster → (id, cluster, d2)."""
    data = emb.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    return _assign(data, cents).select("id", "cluster", "d2")
