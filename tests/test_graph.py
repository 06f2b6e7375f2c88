"""Contract tests for operators/graph.py: PageRank's integer-exact
semantics (determinism, mass conservation, degree monotonicity) and its
per-iteration plan shape (hash joins, never a growing nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.operators import graph
from nrtwithdeltalake_spark.plans import inspect


def test_pagerank_mass_and_coverage(spark, sf_dir):
    """Every node of the edge set gets a positive rank, and total mass
    stays within the integer-truncation envelope of SCALE (the div
    losses are bounded by 1 micro-unit per edge per iteration)."""
    pr = graph.q_graph_pagerank(spark, sf_dir).persist()
    n_nodes = graph._edges(spark, sf_dir).select("src").distinct().count()
    rows = pr.collect()
    assert len(rows) == n_nodes
    assert all(r["rank_micro"] > 0 for r in rows)
    total = sum(r["rank_micro"] for r in rows)
    assert 0.95 * graph.SCALE <= total <= graph.SCALE
    pr.unpersist()


def test_pagerank_deterministic_rerun(spark, sf_dir):
    """Integer arithmetic end to end: two runs (hence any partitioning /
    retry schedule) produce identical bigint ranks."""
    a = sorted(map(tuple, graph.q_graph_pagerank(spark, sf_dir).collect()))
    b = sorted(map(tuple, graph.q_graph_pagerank(spark, sf_dir).collect()))
    assert a == b


def test_pagerank_degree_monotone_for_suppliers(spark, sf_dir):
    """On the symmetric bipartite graph after uniform init, a supplier
    connected to strictly more customers accumulates at least as much
    rank (sanity of the contribution semantics, not a general theorem:
    holds at iteration depth 3 on this fixture)."""
    pr = graph.q_graph_pagerank(spark, sf_dir)
    sup = pr.filter(F.col("entity_type") == "supplier")
    deg = (
        graph._edges(spark, sf_dir)
        .filter(F.col("src") % 2 == 1)
        .groupBy((F.expr("src div 2")).alias("entity_key"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    joined = sup.join(deg, "entity_key").collect()
    top = max(joined, key=lambda r: r["d"])
    bottom = min(joined, key=lambda r: r["d"])
    if top["d"] > bottom["d"]:
        assert top["rank_micro"] > bottom["rank_micro"]


def test_pagerank_iteration_joins_are_hash_joins(spark, sf_dir):
    """The per-iteration edges ⋈ ranks joins must be hash joins; the
    only nested-loop element allowed is the 1-row node-count
    broadcast."""
    strategies = inspect.join_strategies(graph.q_graph_pagerank(spark, sf_dir))
    nested = [
        s
        for s in strategies
        if s in ("CartesianProduct", "BroadcastNestedLoopJoin")
    ]
    hashy = [s for s in strategies if "HashJoin" in s]
    assert len(nested) <= 1, strategies
    assert len(hashy) >= graph.N_ITERS, strategies


def test_hierarchy_pointer_jumping_log_rounds(spark, sf_dir):
    """Pointer jumping must converge in O(log depth) rounds: the
    fixture forest is ≤ 3 levels deep below the 2-digit roots, so 2
    rounds suffice — and every root/depth agrees with the closed form
    (root = leading digits above 99 stripped, depth = digits removed)."""
    rows = graph.q_hierarchy_paths(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k, root, depth = r["c_custkey"], r["root"], r["depth"]
        want_root, want_depth = k, 0
        while want_root >= graph.ROOT_BELOW:
            want_root //= 10
            want_depth += 1
        assert (root, depth) == (want_root, want_depth), (k, root, depth)


def test_triangles_no_cartesian_and_unique(spark, sf_dir):
    """Orientation contract: the wedge join is a hash join on src (never
    a cartesian), and each triangle is enumerated exactly once, corners
    sorted."""
    from nrtwithdeltalake_spark.operators.graph import q_graph_triangles
    from nrtwithdeltalake_spark.plans import inspect

    df = q_graph_triangles(spark, sf_dir)
    rows = [(r.part_a, r.part_b, r.part_c) for r in df.collect()]
    assert len(rows) == len(set(rows))  # no duplicate triangles
    assert all(a < b < c for a, b, c in rows)
    plan = inspect.physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
