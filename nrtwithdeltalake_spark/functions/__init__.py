"""Public expression library: the engine's reusable column functions.

Everything here returns a ``pyspark.sql.Column`` built from built-in
functions (JVM codegen — no Python in the row path), so these compose
freely with any DataFrame operation and keep whole-stage codegen intact.

Three families:

* **decimal-exact money math** — aggregation over money/quantity doubles
  in decimal space so results are deterministic and engine-portable
  (re-exported from ``operators.helpers``, see that module's numeric
  policy note);
* **vector math** over ``array<float|double>`` embedding columns —
  dot/cosine via ``zip_with`` + ``aggregate`` folds;
* **text expressions** — tokenization, shingling, chunking used by the
  dedup/text operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.helpers import (  # noqa: F401  (re-exports)
    avg_double,
    charge,
    disc_price,
    dprice,
    dqty,
    drate,
    money_sum,
)

__all__ = [
    "avg_double",
    "charge",
    "disc_price",
    "dprice",
    "dqty",
    "drate",
    "money_sum",
    "vec_as_double",
    "vec_dot",
    "vec_norm",
    "vec_cosine",
    "ws_tokens",
    "token_shingles",
    "chunk_spans",
]


# -- vector math -----------------------------------------------------------


def vec_as_double(col: str) -> Column:
    """Cast an array<float> embedding to array<double> for stable math."""
    return F.expr(f"transform({col}, x -> cast(x as double))")


def vec_dot(a: str, b: str) -> Column:
    """Dot product of two array columns (left-to-right double fold —
    deterministic accumulation order)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def vec_norm(a: str) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(vec_dot(a, a))


def vec_cosine(a: str, b: str) -> Column:
    """Cosine similarity of two array columns."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def vec_cosine_pandas() -> "object":
    """Arrow-batched pandas_udf cosine: the Python-side alternative to
    ``vec_cosine`` for when vector math outgrows Catalyst expression
    trees (high dims, fused multi-score kernels). NumPy vectorizes the
    whole Arrow batch — the 10-100× path over row-at-a-time UDFs; still
    slower than the pure-Catalyst fold for simple kernels, so prefer
    ``vec_cosine`` unless profiling says otherwise.

    Usage: ``df.select(vec_cosine_pandas()("a", "b"))``
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.stack(a.to_numpy())
        bm = np.stack(b.to_numpy())
        dots = np.einsum("ij,ij->i", am, bm)
        norms = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
        return pd.Series(dots / norms)

    return _cos


# -- text ------------------------------------------------------------------


def ws_tokens(col: str = "text") -> Column:
    """Whitespace tokens."""
    return F.split(F.col(col), " ")


def token_shingles(col: str = "text", k: int = 3) -> Column:
    """Distinct xxhash64 of k-token shingles (the minhash input)."""
    toks = f"split({col}, ' ')"
    return F.expr(
        f"array_distinct(transform(sequence(0, greatest(size({toks}) - {k}, 0)), "
        f"i -> xxhash64(concat_ws(' ', slice({toks}, i + 1, {k})))))"
    )


def chunk_spans(col: str = "text", length: int = 256, stride: int = 224) -> Column:
    """Overlapping fixed-size substrings (pre-embedding chunking)."""
    return F.expr(
        f"transform(sequence(1, greatest(length({col}), 1), {stride}), "
        f"i -> substring({col}, i, {length}))"
    )
