"""Vector math over array<float> embedding columns.

Two tiers:
- `dot`/`norm`/`cosine` — `F.zip_with` + `F.aggregate` built-ins. No
  Python in the row path, but Spark evaluates higher-order functions
  INTERPRETED (no codegen): measured ~0.5-1 µs per array element, which
  dominates any scoring loop over candidate pairs.
- `cosine_pairs_udf` — Arrow-vectorized pairwise cosine: each batch of
  (a, b) array pairs becomes two dense numpy matrices and one fused
  einsum per reduction. ~20-40x faster than the HOF form on 64-dim
  vectors; float32 inputs upcast exactly to float64, and the row-wise
  einsum accumulates sequentially like the HOF fold and the DuckDB
  oracle's `list_dot_product`, so results agree to rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (0 where either norm is 0)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_pairs_udf():
    """Arrow-vectorized pairwise cosine over two array columns.

    Returns a pandas_udf: (array<float|double>, array<float|double>) ->
    double, 0.0 where either norm is 0 (same convention as `cosine`).
    Inputs upcast to float64 inside numpy (exact for float32), so callers
    pass the raw embedding columns without an `as_double` transform —
    that transform is itself an interpreted HOF worth skipping.
    """
    import numpy as np
    import pandas as pd

    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.array(list(a), dtype=np.float64)
        mb = np.array(list(b), dtype=np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
        nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
        denom = na * nb
        safe = np.where(denom == 0, 1.0, denom)
        return pd.Series(np.where(denom == 0, 0.0, dots / safe))

    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return F.pandas_udf(_cos, "double")
