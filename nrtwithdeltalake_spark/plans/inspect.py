"""Physical-plan introspection: the engine's guardrails that plans STAY
optimal.

The reference delegates all optimization to SQL Server / Databricks and
can't see its plans at all (SURVEY.md §4). This engine treats the
physical plan as an asserted property: tests pin down that filters reach
the parquet scan, projections prune columns, dimension joins broadcast,
and operators don't shuffle more than designed — so a refactor that
silently de-optimizes a plan fails CI instead of surfacing as a 10×
regression at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final (pre-execution) physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column set each parquet scan physically reads (pruning check)."""
    out: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^\n]*)>", formatted_plan(df)):
        out.append({c.split(":")[0] for c in m.group(1).split(",") if c})
    return out


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (e.g. BroadcastHashJoin,
    SortMergeJoin, BroadcastNestedLoopJoin, ShuffledHashJoin)."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        physical_plan(df),
    )


def num_shuffles(df: DataFrame) -> int:
    """Count of distinct data shuffles (Exchange nodes, reuse excluded)."""
    plan = physical_plan(df)
    return len(re.findall(r"\+- Exchange ", plan)) + len(
        re.findall(r"^Exchange ", plan, re.MULTILINE)
    )


def has_partial_agg(df: DataFrame) -> bool:
    """True when the plan computes map-side partial aggregates before the
    shuffle (the property that keeps groupBy traffic ∝ groups, not rows)."""
    return "partial_" in formatted_plan(df)
