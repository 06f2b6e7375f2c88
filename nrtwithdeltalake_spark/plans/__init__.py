"""Physical-plan introspection (see ``plans.inspect``)."""

from .inspect import (  # noqa: F401
    formatted_plan,
    has_partial_agg,
    join_strategies,
    num_shuffles,
    physical_plan,
    pushed_filters,
    scan_columns,
)
