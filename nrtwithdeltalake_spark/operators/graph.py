"""Graph analytics over relational-derived edge sets — distributed
PageRank as the engine's representative iterative-join algorithm
(north-star addition; the reference computes no graph shapes, see
SURVEY.md §2.1 — its only iteration is the driver-side entity loop at
/root/reference/COPY_MSQL_TO_SILVER.py:259-260).

``q_graph_pagerank`` ranks the symmetric customer↔supplier trade graph
(an edge per distinct (customer, supplier) pair that shares an order)
with 3 unrolled power iterations, damping 0.85.

Design notes:

* **All arithmetic is bigint.** Ranks are integer micro-units
  (``SCALE = 1e12``); per-edge contribution is ``rank div degree``
  (integer division) and the damping step is ``(85 * s) div 100``.
  Integer sums are order-independent and bit-identical across engines
  and partitionings — no float-accumulation-order flake, no rounding
  epsilon in the oracle compare. The ≤1e-12-per-edge mass lost to
  ``div`` truncation is deliberate and engine-identical.
* **One shuffle per iteration, co-partitioned.** Degrees are folded
  into the edge list once (``edges_d``, persisted, hash-partitioned on
  ``src``); each iteration is edges ⋈ ranks on ``src`` (both sides
  already partitioned on the join key — AQE sees a reusable exchange)
  followed by one partial-aggregatable ``groupBy(dst).sum``. At 100 TB
  the rank table co-shuffles with the fixed edge partitioning; nothing
  driver-side grows with the graph (the loop variable is a DataFrame
  lineage, cut per iteration by the persisted edge set, with a bounded
  3-iteration unroll).
* **No dangling mass by construction.** The graph is symmetric (both
  directions of every pair are edges), so every node has out-degree
  ≥ 1 and the dangling-node redistribution term every general PageRank
  needs is provably zero here.

The oracle unrolls the same three iterations as CTEs with DuckDB's
``//`` integer division; both engines produce identical bigint ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..sources.catalog import load_table

SCALE = 1_000_000_000_000  # rank micro-units: 1.0 == 1e12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as exact integer ratio
N_ITERS = 3


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric customer↔supplier edges: node ids are disjoint bigints
    (customer → 2k, supplier → 2k+1)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    rev = pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    return fwd.unionAll(rev)


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    # degree folded into the edge list once; partitioned on the join key
    # so every iteration's join reuses this exchange
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    edges_d = edges.join(deg, "src").repartition("src").persist()

    n_nodes = deg.agg(F.count(F.lit(1)).alias("n"))

    # r0: uniform SCALE div n per node (every node has out-edges)
    ranks = (
        deg.crossJoin(F.broadcast(n_nodes))
        .select(
            F.col("src").alias("node"),
            F.expr(f"{SCALE} div n").alias("r"),
            F.col("n"),
        )
    )
    for _ in range(N_ITERS):
        contrib = edges_d.join(
            ranks.select(F.col("node").alias("src"), "r", "n"), "src"
        ).select("dst", F.expr("r div d").alias("c"), "n")
        ranks = (
            contrib.groupBy("dst", "n")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(({DAMP_DEN - DAMP_NUM}) * ({SCALE} div n)) div"
                    f" {DAMP_DEN} + ({DAMP_NUM} * s) div {DAMP_DEN}"
                ).alias("r"),
                "n",
            )
        )
    return ranks.select(
        F.expr("node div 2").alias("entity_key"),
        F.expr(
            "CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END"
        ).alias("entity_type"),
        F.col("r").alias("rank_micro"),
    )


def _oracle_pagerank() -> str:
    it = """
i{K} AS (
  SELECT e.dst AS node,
         ((({RESID}) * ({SCALE} // nn.n)) // {DEN}
          + ({NUM} * sum(r.r // e.d)) // {DEN}) AS r
  FROM edges_d e JOIN i{P} r ON e.src = r.node CROSS JOIN nn
  GROUP BY e.dst, nn.n
)"""
    iters = ",".join(
        it.format(
            K=k,
            P=k - 1,
            SCALE=SCALE,
            NUM=DAMP_NUM,
            DEN=DAMP_DEN,
            RESID=DAMP_DEN - DAMP_NUM,
        )
        for k in range(1, N_ITERS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
), deg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
), edges_d AS (
  SELECT e.src, e.dst, deg.d FROM edges e JOIN deg ON e.src = deg.src
), nn AS (
  SELECT count(*) AS n FROM deg
), i0 AS (
  SELECT src AS node, {SCALE} // nn.n AS r FROM deg CROSS JOIN nn
),{iters}
SELECT node // 2 AS entity_key,
       CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
           AS entity_type,
       CAST(r AS BIGINT) AS rank_micro
FROM i{N_ITERS}
"""


ORACLE_GRAPH_PAGERANK = _oracle_pagerank()


# ---------------------------------------------------------------------------
# hierarchy traversal (WITH RECURSIVE) via pointer jumping
# ---------------------------------------------------------------------------

ROOT_BELOW = 100  # custkey < 100 → root of its tree
_HIER_MAX_ITER = 20


def q_hierarchy_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical traversal — the WITH RECURSIVE / CONNECT BY family
    (org charts, bill-of-materials, category trees): every node's root
    ancestor and depth in a synthesized customer forest
    (``parent(k) = k div 10``, nodes below 100 are roots — a bounded-
    depth multi-tree derived deterministically from keys, mirrored in
    the oracle).

    Implementation is POINTER JUMPING, not a parent-at-a-time walk:
    each round joins the state with itself (``anc ← anc[anc]``,
    distances add), so covered depth DOUBLES per round — O(log depth)
    co-partitioned self-joins instead of O(depth), the difference
    between 5 and 1000 shuffles on a deep 100 TB hierarchy. Roots are
    self-parented fixpoints (their jump adds 0), convergence is
    detected exactly like ``connected_components`` (changed-row count
    → driver sees one integer per round), and the recursive-CTE oracle
    pins semantics."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("node")
    )
    is_root = F.col("node") < ROOT_BELOW
    state = cust.select(
        "node",
        F.when(is_root, F.col("node"))
        .otherwise(F.expr("node div 10"))
        .alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).alias("depth"),
    ).localCheckpoint()
    for _ in range(_HIER_MAX_ITER):
        nxt = (
            state.alias("a")
            .join(
                state.select(
                    F.col("node").alias("j_node"),
                    F.col("anc").alias("j_anc"),
                    F.col("depth").alias("j_depth"),
                ).alias("b"),
                F.col("a.anc") == F.col("b.j_node"),
            )
            .select(
                F.col("a.node").alias("node"),
                F.col("b.j_anc").alias("anc"),
                (F.col("a.depth") + F.col("b.j_depth")).alias("depth"),
            )
        ).localCheckpoint()
        changed = (
            nxt.alias("n")
            .join(state.alias("o"), "node")
            .filter(F.col("n.anc") != F.col("o.anc"))
            .count()
        )
        state = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"hierarchy did not converge in {_HIER_MAX_ITER} pointer-"
            "jumping rounds (depth > 2^iters — raise _HIER_MAX_ITER)"
        )
    return state.select(
        F.col("node").alias("c_custkey"),
        F.col("anc").alias("root"),
        F.col("depth").cast("long").alias("depth"),
    )


ORACLE_HIERARCHY_PATHS = f"""
WITH RECURSIVE rel AS (
  SELECT c_custkey AS node,
         CASE WHEN c_custkey < {ROOT_BELOW} THEN c_custkey
              ELSE c_custkey // 10 END AS par
  FROM customer
), walk AS (
  SELECT node, node AS cur, 0 AS depth FROM rel
  UNION ALL
  SELECT w.node, r.par, w.depth + 1
  FROM walk w JOIN rel r ON w.cur = r.node
  WHERE r.par != w.cur
)
SELECT node AS c_custkey,
       arg_max(cur, depth) AS root,
       cast(max(depth) as bigint) AS depth
FROM walk GROUP BY node
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``WITH RECURSIVE`` (Spark 4) over the same synthesized
    customer forest as ``q_hierarchy_paths``: root→leaf descent
    materializing each node's full ancestor PATH ("root/…/node").

    Surface-parity op: the recursive CTE executes the recursion as
    O(depth) iterative joins (one per level), so on a deep 100 TB
    hierarchy ``q_hierarchy_paths``'s pointer jumping (O(log depth)
    self-joins) remains the scale path — this query exists because a
    user migrating recursive SQL should not have to rewrite it. Paths
    require top-down descent (a parent's path prefixes its children's),
    which is also why the pointer-jumping variant reports (root, depth)
    rather than paths. The oracle is the same recursion in DuckDB
    (integer division spelled ``//`` there, ``div`` here)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "__rcte_customer"
    )
    return spark.sql(f"""
      WITH RECURSIVE walk(c_custkey, path, depth) AS (
        SELECT c_custkey, cast(c_custkey AS string), 0
        FROM __rcte_customer WHERE c_custkey < {ROOT_BELOW}
        UNION ALL
        SELECT c.c_custkey,
               concat(w.path, '/', cast(c.c_custkey AS string)),
               w.depth + 1
        FROM __rcte_customer c JOIN walk w
          ON (c.c_custkey div 10) = w.c_custkey
        WHERE c.c_custkey >= {ROOT_BELOW}
      )
      SELECT c_custkey, path, cast(depth AS bigint) AS depth FROM walk
    """)


ORACLE_RECURSIVE_CTE = f"""
WITH RECURSIVE walk(c_custkey, path, depth) AS (
  SELECT c_custkey, cast(c_custkey AS varchar), 0
  FROM customer WHERE c_custkey < {ROOT_BELOW}
  UNION ALL
  SELECT c.c_custkey,
         concat(w.path, '/', cast(c.c_custkey AS varchar)),
         w.depth + 1
  FROM customer c JOIN walk w ON (c.c_custkey // 10) = w.c_custkey
  WHERE c.c_custkey >= {ROOT_BELOW}
)
SELECT c_custkey, path, cast(depth AS bigint) AS depth FROM walk
"""


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration over the thresholded co-purchase graph
    (parts co-ordered ≥2 times) — the clustering/community primitive,
    and the classic test of whether a distributed engine can avoid the
    naive join blowup.

    Scale design — DEGREE-ORDERED ORIENTATION (the MapReduce-era
    Suri & Vassilvitskii / Schank construction, standard in every
    distributed graph library): orient each undirected edge from its
    lower-(degree, id) endpoint to the higher one. Every node's
    OUT-degree is then O(√m) regardless of how big a hub it is, so the
    wedge self-join generates Σ C(outdeg, 2) = O(m^1.5) candidate
    wedges worst-case instead of Σ C(deg, 2) — which a power-law hub
    makes quadratic. Each triangle forms exactly one wedge at its
    lowest-ordered corner, closed by one hash join back against the
    oriented edge list; output corners re-sorted to plain id order.
    The oracle deliberately runs the NAIVE a<b<c three-way self-join —
    same set, none of the engine's machinery.

    Plan: baskets → pair counts (the q_copurchase_pairs shape, one fact
    shuffle), degree fold + orientation in one projection off the
    persisted edge list, wedge join and closure join both hash joins on
    edge-bounded keys. Nothing driver-side grows with the graph."""
    from .freq import basket_pairs

    li = load_table(spark, sf_dir, "lineitem")
    # same r13 shape as q_copurchase_pairs: explicit repartition skips
    # the dead map-side collect_set partial, and basket_pairs generates
    # the C(n,2) fan-out in codegen (the nested transform-struct lambda
    # this replaced ran interpreted per element).
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    pairs = basket_pairs(baskets).select(
        F.col("part_a").alias("u"), F.col("part_b").alias("v")
    )
    edges = (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = (
        edges.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"),
            "v",
        )
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(
            u_first, F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
        )
        .otherwise(F.struct(F.col("du").alias("d"), F.col("u").alias("n")))
        .alias("dst_k"),
    ).select(
        "src",
        F.col("dst_k").getField("n").alias("dst"),
        "dst_k",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    wedges = (
        oriented.alias("e1")
        .join(
            oriented.alias("e2"),
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst_k") < F.col("e2.dst_k")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    closed = wedges.join(
        oriented.select(
            F.col("src").alias("b"), F.col("dst").alias("c")
        ),
        ["b", "c"],
        "left_semi",
    )
    tri = closed.select(
        F.array_sort(F.array("a", "b", "c")).alias("t")
    ).select(
        F.element_at("t", 1).alias("part_a"),
        F.element_at("t", 2).alias("part_b"),
        F.element_at("t", 3).alias("part_c"),
    )
    return tri


ORACLE_GRAPH_TRIANGLES = """
WITH d AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM d a JOIN d b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT e1.u AS part_a, e1.v AS part_b, e2.v AS part_c
FROM e e1
JOIN e e2 ON e1.v = e2.u
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
"""


QUERIES = {
    "q_graph_pagerank": q_graph_pagerank,
    "q_hierarchy_paths": q_hierarchy_paths,
    "q_recursive_cte": q_recursive_cte,
    "q_graph_triangles": q_graph_triangles,
}

ORACLES = {
    "q_graph_pagerank": ORACLE_GRAPH_PAGERANK,
    "q_hierarchy_paths": ORACLE_HIERARCHY_PATHS,
    "q_recursive_cte": ORACLE_RECURSIVE_CTE,
    "q_graph_triangles": ORACLE_GRAPH_TRIANGLES,
}
