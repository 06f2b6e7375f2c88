"""Central registry of declared queries and their DuckDB oracle twins.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin wrappers over
this module. A query present in QUERIES but absent from ORACLES is a
declared non-SQL-expressible operator (the driver then records a
rows-only check, per the contract in ``__spark_entry__.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    behavior,
    corpus,
    decision,
    flagship,
    freq,
    graph,
    joins_ext,
    lateral,
    llm_ext,
    lm_quality,
    relational,
    relational_ext,
    reshape,
    retrieval,
    robust,
    scalars,
    tpch,
    tpch_full,
    udtf_ops,
)

_MODULES = [
    flagship,
    relational,
    relational_ext,
    scalars,
    tpch,
    tpch_full,
    corpus,
    behavior,
    lateral,
    joins_ext,
    reshape,
    robust,
    retrieval,
    freq,
    graph,
    decision,
    llm_ext,
    lm_quality,
    udtf_ops,
]


def _extend() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in getattr(mod, "QUERIES", {}).items():
            assert name not in queries, f"duplicate query name: {name}"
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def register_llm_modules() -> None:
    """LLM-pipeline ops live in a separate package half; imported lazily so
    a partial build never breaks the relational surface."""
    from . import dedup, similarity, textstats, multimodal  # noqa: F401

    for mod in (dedup, similarity, textstats, multimodal):
        if mod not in _MODULES:
            _MODULES.append(mod)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    try:
        register_llm_modules()
    except ImportError:
        pass
    return _extend()[0]


def all_oracles() -> dict[str, str]:
    try:
        register_llm_modules()
    except ImportError:
        pass
    return _extend()[1]
