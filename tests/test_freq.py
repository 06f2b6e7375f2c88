"""Contract tests for operators/freq.py: bloom prefilter loses nothing
and actually prunes; exact mode breaks ties deterministically."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrtwithdeltalake_spark.operators import freq
from nrtwithdeltalake_spark.sources.catalog import load_table


def test_bloom_prefilter_no_false_negatives_and_prunes(spark, sf_dir):
    """Every true match survives the bloom prefilter (no false
    negatives), and the prefilter drops most non-matching probe rows
    (the shuffle-volume claim)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bloom = freq.build_bloom(orders, "o_orderkey")
    prefiltered = li.crossJoin(F.broadcast(bloom)).filter(
        freq.bloom_might_contain("bloom", "l_orderkey")
    )
    exact = li.join(
        orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )
    n_total = li.count()
    n_pre = prefiltered.count()
    n_exact = exact.count()
    # superset of true matches, subset of the scan
    assert n_exact <= n_pre <= n_total
    # no false negatives: prefilter-then-exact == exact
    n_both = (
        prefiltered.join(
            orders.select("o_orderkey"),
            prefiltered["l_orderkey"] == F.col("o_orderkey"),
            "left_semi",
        ).count()
    )
    assert n_both == n_exact
    # it prunes: false-positive leakage among non-matches stays under 5%
    # (geometry in freq.py targets ~1.6e-4; 5% allows any fill level the
    # test scale produces)
    n_nonmatch = n_total - n_exact
    if n_nonmatch:
        assert (n_pre - n_exact) / n_nonmatch < 0.05


def test_bloom_filter_probe_is_scan_filter_below_join(spark, sf_dir):
    """Plan guardrail: the membership test must reach the probe side as
    a Filter (element_at probes of the literal word array) BELOW the
    exact semi join — a join-based formulation gets reordered by
    Catalyst so the prefilter runs after the join (observed; see
    q_join_bloom_prefilter docstring). Also pins the r13 literal form:
    no scalar subqueries (the subquery formulation planned 16 subquery
    instances and executed the build more than once per run)."""
    from nrtwithdeltalake_spark.plans import inspect

    df = freq.q_join_bloom_prefilter(spark, sf_dir)
    plan = inspect.physical_plan(df)
    join_at = plan.index("LeftSemi")
    probe_filter_at = plan.index("element_at(")
    # physical tree prints children after the parent: the probe filter
    # must be a descendant of (printed after) the semi join
    assert probe_filter_at > join_at, plan[:2000]
    assert "Subquery" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_filter_is_tiny(spark, sf_dir):
    """The broadcast state is bounded by the geometry (≤ 2048 words),
    not by the build-side row count."""
    orders = load_table(spark, sf_dir, "orders")
    row = freq.build_bloom(orders, "o_orderkey").collect()[0]
    assert len(row.bloom) <= freq._BLOOM_WORDS


def test_mode_tie_breaks_to_smallest_value(spark, tmp_path):
    """Equal counts → smaller value wins, every run."""
    df = spark.createDataFrame(
        [("A", 5.0), ("A", 5.0), ("A", 2.0), ("A", 2.0), ("A", 9.0)],
        "l_returnflag string, l_quantity double",
    )
    p = str(tmp_path / "li")
    df.write.parquet(p)
    # q_agg_mode loads lineitem from sf_dir; emulate its core directly
    counts = df.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top = (
        counts.groupBy("l_returnflag")
        .agg(F.max(F.struct(F.col("cnt").alias("c"), (-F.col("l_quantity")).alias("negq"))).alias("t"))
        .select("l_returnflag", (-F.col("t.negq")).alias("mode_qty"), F.col("t.c").alias("mode_cnt"))
        .collect()
    )
    assert top == [("A", 2.0, 2)] or [tuple(r) for r in top] == [("A", 2.0, 2)]


def test_cms_overestimates_only_and_bounded(spark, sf_dir):
    """Count-min contract: est ≥ exact for every probed term (collisions
    only add), and for the heavy hitters the overestimate is bounded by
    the CMS guarantee's scale — (e/width) × stream size, with slack for
    the small width. Also: summing two half-corpus sketches equals the
    full-corpus sketch (re-aggregatability)."""
    import math

    from nrtwithdeltalake_spark.operators import freq
    from nrtwithdeltalake_spark.sources.catalog import load_table

    rows = freq.q_agg_cms_topk(spark, sf_dir).collect()
    assert len(rows) == 25
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .count()
    )
    bound = math.e / freq.CMS_WIDTH * n_tokens
    for r in rows:
        assert r.est_count >= r.exact_count, r
        assert r.est_count - r.exact_count <= 2 * bound, (r, bound)

    # re-aggregatable: sketch(half A) + sketch(half B) == sketch(all)
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    full = {
        (r.row, r.bucket): r.cnt for r in freq.cms_build(toks).collect()
    }
    a = freq.cms_build(toks.filter(F.col("doc_id") % 2 == 0)).collect()
    b = freq.cms_build(toks.filter(F.col("doc_id") % 2 == 1)).collect()
    merged: dict = {}
    for r in list(a) + list(b):
        merged[(r.row, r.bucket)] = merged.get((r.row, r.bucket), 0) + r.cnt
    assert merged == full


def test_basket_pairs_whale_safe_and_exact(spark):
    """basket_pairs (element-grain pair generation) is exact — identical
    to itertools.combinations — and whale-safe: a large basket's C(n,2)
    pairs are generated one partner-slice at a time (O(n) transient
    structs per row, never the O(n²) single-array materialization of a
    flat flatten(transform(...)))."""
    from itertools import combinations

    from nrtwithdeltalake_spark.operators.freq import basket_pairs

    n = 5000
    items = sorted(range(0, 3 * n, 3))
    baskets = spark.createDataFrame([(1, items)], "l_orderkey long, parts array<bigint>")
    assert basket_pairs(baskets).count() == n * (n - 1) // 2

    # exact pair-set equality on a small sample
    small = sorted([5, 1, 9, 12, 3])
    bs = spark.createDataFrame([(1, small)], "l_orderkey long, parts array<bigint>")
    pairs = {(r.part_a, r.part_b) for r in basket_pairs(bs).collect()}
    assert pairs == set(combinations(small, 2))

    # degenerate sizes stay exact
    for k in (2, 3):
        b = spark.createDataFrame(
            [(1, list(range(k)))], "l_orderkey long, parts array<bigint>"
        )
        assert basket_pairs(b).count() == k * (k - 1) // 2
