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


def _ivf_assign(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(assigned, cents): every vector assigned to its nearest coarse
    centroid via broadcast argmin (min_by over (d², c_id) — lowest cell
    on ties); assigned persists because probe lists and candidate scans
    both consume it."""
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MOD == 7) & (F.col("vec_id") >= N_QUERIES)
    ).select(F.col("vec_id").alias("c_id"), F.col("v").alias("cv"))
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
    return assigned, cents


def _ivf_probes(assigned: DataFrame, cents: DataFrame) -> DataFrame:
    """(q_id, qv, cell): each query's N_PROBE nearest cells."""
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
    return (
        qd.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBE)
        .select("q_id", "qv", "cell")
    )


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
    assigned, cents = _ivf_assign(emb)
    probes = _ivf_probes(assigned, cents)

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


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance (ADC) scoring
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_SUB = DIM // PQ_M  # dims per subspace
PQ_K = 16  # codes per subspace (4-bit codes)
PQ_ANCHOR_MOD = 7  # anchors: 16 lowest vec_ids ≥ N_QUERIES with id%7==3


def pq_anchors(spark: SparkSession, sf_dir: str) -> list[tuple[int, list]]:
    """The PQ_K deterministic codebook anchor vectors (an arithmetic
    subsample standing in for per-subspace k-means, same convention as
    q_sim_ann_ivf's coarse centroids — swapping in trained codebooks
    changes only this function). Collected: PQ_K × DIM doubles, the
    by-design broadcast-as-literal size."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        emb.filter(
            (F.col("vec_id") % PQ_ANCHOR_MOD == 3)
            & (F.col("vec_id") >= N_QUERIES)
        )
        .orderBy("vec_id")
        .limit(PQ_K)
        .select("vec_id", _as_double("embedding").alias("v"))
        .collect()
    )
    return [(r["vec_id"], list(r["v"])) for r in rows]


def _pq_codebook_expr(anchors: list[tuple[int, list]]) -> str:
    """The PQ_K × DIM codebook as one foldable literal array-of-arrays —
    Catalyst constant-folds it to a single Literal, so referencing it
    from higher-order lambdas costs nothing per row (the earlier fully
    unrolled formulation planted ~50k expression nodes and OOM'd the
    compiler)."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(repr(x) for x in vec) + ")"
            for _, vec in anchors
        )
        + ")"
    )


def _pq_subdist(vcol: str, cb: str, m: str, j: str) -> str:
    """Squared L2 distance between subspace ``m`` of ``vcol`` and
    codebook row ``j`` (1-based): a left fold over the PQ_SUB dims —
    sequential adds, IEEE-identical to a python loop recompute."""
    return (
        f"aggregate(sequence({m} * {PQ_SUB} + 1, {m} * {PQ_SUB} + {PQ_SUB}), "
        f"cast(0.0 as double), (acc, i) -> acc + "
        f"(element_at({vcol}, i) - element_at(element_at({cb}, {j}), i)) * "
        f"(element_at({vcol}, i) - element_at(element_at({cb}, {j}), i)))"
    )


def _pq_codes_col(cb: str, vcol: str) -> F.Column:
    """array<int> of PQ_M codes: argmin via struct-min — lexicographic
    (d², code), lowest code on ties."""
    return F.expr(
        f"transform(sequence(0, {PQ_M - 1}), m -> "
        f"cast(array_min(transform(sequence(1, {PQ_K}), j -> "
        f"struct({_pq_subdist(vcol, cb, 'm', 'j')} AS d, j AS j))).j - 1 "
        f"as int))"
    )


def _pq_lut(emb: DataFrame, cb: str) -> DataFrame:
    """Per-query ADC lookup table: (q_id, m, code, micro-d2) — PQ_M×PQ_K
    = 128 rows per query vector, integer micro-units so downstream sums
    are order-independent."""
    return (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
        .select(
            "q_id",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(0, {PQ_M - 1}), m -> "
                    f"transform(sequence(1, {PQ_K}), j -> struct("
                    f"m AS m, j - 1 AS code, "
                    f"cast(floor({_pq_subdist('qv', cb, 'm', 'j')} * 1e9) "
                    f"as bigint) AS d2q))))"
                )
            ).alias("e"),
        )
        .select("q_id", "e.m", "e.code", "e.d2q")
    )


def q_sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate top-k: every corpus vector is encoded
    as PQ_M 4-bit codes (nearest codebook entry per subspace — 4 bytes
    per vector instead of 256, the 64× memory cut that lets a 100 TB
    corpus' index live in cluster RAM); a query scores candidates with
    one broadcast 128-entry lookup table per query (ADC) instead of
    touching any full vector.

    Plan shape: encoding is a pure-codegen argmin over the literal
    codebook (struct-min over (d², code) — no join, no shuffle);
    scoring explodes codes to (vec_id, m, code), hash-joins the
    broadcast LUT, and sums integer-quantized micro-distances —
    partial-aggregatable, order-independent, so results are
    exact-deterministic for the given codebook (the approximation is
    the quantization itself → rows-only check + python-recompute
    equivalence test). At 100 TB the LUT join input is codes-only:
    4 bytes/vector scanned, never the embeddings."""
    anchors = pq_anchors(spark, sf_dir)
    cb = _pq_codebook_expr(anchors)
    emb = _fan_out(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    codes = emb.select("vec_id", _pq_codes_col(cb, "v").alias("codes"))
    lut = _pq_lut(emb, cb)

    scored = (
        codes.select("vec_id", F.posexplode("codes").alias("m", "code"))
        .join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2q").alias("adc_micro"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_micro"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_micro",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def q_sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composition production ANN systems (FAISS et al.)
    actually deploy at scale: the IVF coarse index bounds WHICH vectors
    a query scores (N_PROBE cells, not the corpus) and PQ bounds WHAT
    is read to score them (4-bit codes + a broadcast 128-entry integer
    LUT, never the float vectors). At 100 TB the candidate scan is
    probe-bounded AND bytes-per-candidate-bounded — the two dials
    (n_probe, code bits) trade recall for cost independently.

    Deterministic for the fixed coarse centroids + codebook → rows-only
    check + python-recompute equivalence test composed from the IVF and
    PQ recomputes."""
    anchors = pq_anchors(spark, sf_dir)
    cb = _pq_codebook_expr(anchors)
    emb = _fan_out(load_table(spark, sf_dir, "embeddings"), spark).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    assigned, cents = _ivf_assign(emb)
    probes = _ivf_probes(assigned, cents).select("q_id", "cell")
    lut = _pq_lut(emb, cb)

    cand_codes = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", _pq_codes_col(cb, "v").alias("codes"))
    )
    scored = (
        cand_codes.select(
            "q_id", "vec_id", F.posexplode("codes").alias("m", "code")
        )
        .join(F.broadcast(lut), ["q_id", "m", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2q").alias("adc_micro"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_micro"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            "adc_micro",
            F.col("rn").cast("long").alias("rn"),
        )
    )


# ---------------------------------------------------------------------------
# SemDedup: semantic dedup via k-means cluster blocking
# ---------------------------------------------------------------------------

SEM_K = 16  # clusters (scale: k ~ n / target_cluster_size)
SEM_ITERS = 3
SEM_TAU = 0.95  # within-cluster cosine threshold


def q_dedup_semantic(
    spark: SparkSession,
    sf_dir: str,
    k: int = SEM_K,
    iters: int = SEM_ITERS,
    tau: float = SEM_TAU,
) -> DataFrame:
    """SemDedup (Abbas et al. 2023): embedding-space near-duplicate
    removal with k-means cluster blocking — pairwise cosine is computed
    only WITHIN a trained cluster, never across the corpus. A vector is
    dropped when a lower-id clustermate sits at cosine ≥ ``tau`` (the
    deterministic stand-in for SemDedup's keep-one-per-near-dup-group
    policy). ``k`` is the scale dial AS CODE: at 100 TB pass
    k ≈ n / 10k to hold cluster sizes (and so per-cluster pair cost)
    flat while total work stays linear.

    Plan shape: Lloyd training + assignment from ``operators/kmeans``
    (broadcast-argmin E-step — data never shuffles for training), one
    self-join keyed on the cluster id, one partial-aggregatable argmin
    per dropped vector. At 100 TB, k grows with the corpus
    (k ≈ n / 10k holds cluster sizes flat), so the per-cluster pair
    space stays bounded while total work stays linear — the whole point
    of SemDedup over all-pairs. Deterministic for the fixed seeding
    (kmeans is integer-quantized + tie-ordered) → rows-only check +
    python-recompute equivalence test on the blocking/drop layer."""
    from .kmeans import assign_clusters, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = kmeans_fit(emb, k=k, iters=iters)
    assigned = assign_clusters(emb, cents).select(
        F.col("id").alias("vec_id"), "cluster"
    )
    data = (
        _fan_out(emb, spark)
        .select("vec_id", _as_double("embedding").alias("v"))
        .join(assigned, "vec_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    l, r = data.alias("l"), data.alias("r")
    cos = _dot("l.v", "r.v") / (
        F.sqrt(_dot("l.v", "l.v")) * F.sqrt(_dot("r.v", "r.v"))
    )
    drops = (
        l.join(
            r,
            (F.col("l.cluster") == F.col("r.cluster"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .filter(cos >= tau)
        .groupBy(F.col("r.vec_id").alias("vec_id"))
        .agg(F.min(F.col("l.vec_id")).alias("dup_of"))
    )
    return (
        data.join(drops, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("dup_of").isNull(), "keep")
            .otherwise("drop")
            .alias("status"),
            "dup_of",
        )
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 max-abs quantization per vector — the standard
    4× storage/bandwidth cut before ANN indexing at scale. Pure Catalyst
    (lambda references the precomputed scale column; no per-element
    rescan). Zero-vectors guarded with an epsilon floor so ANSI-mode
    round(inf)→int can't trap.

    The compare surface serializes the int8 vector with array_join
    (same convention as ``q_agg_array``): the driver's pandas-based
    value hasher cannot hash list cells (``sort_values`` → ``factorize``
    → ``unhashable type: 'list'`` — the r09 red). The quantization
    itself is still a per-element array transform in codegen."""
    emb = load_table(spark, sf_dir, "embeddings")
    am = F.expr(
        "greatest(array_max(transform(embedding, y -> abs(cast(y as double)))),"
        " cast(1e-12 as double))"
    )
    return (
        emb.select("vec_id", "embedding", am.alias("am"))
        .select(
            "vec_id",
            F.array_join(
                F.expr(
                    "transform(embedding, x -> "
                    "cast(round(cast(x as double) * 127.0 / am) as int))"
                ),
                ",",
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
       array_to_string(list_transform(embedding,
           x -> cast(round(cast(x as double) * 127.0 / am) as int)), ',')
           AS q8,
       round(am / 127.0, 9) AS scale
FROM a
"""


QUERIES = {
    "q_sim_topk": q_sim_topk,
    "q_sim_ann_lsh": q_sim_ann_lsh,
    "q_sim_ann_ivf": q_sim_ann_ivf,
    "q_sim_ann_pq": q_sim_ann_pq,
    "q_sim_ann_ivfpq": q_sim_ann_ivfpq,
    "q_dedup_embedding": q_dedup_embedding,
    "q_dedup_semantic": q_dedup_semantic,
    "q_embed_quantize": q_embed_quantize,
}

ORACLES = {
    "q_sim_topk": ORACLE_SIM_TOPK,
    "q_embed_quantize": ORACLE_EMBED_QUANTIZE,
}
