"""Vector math over array<float> embedding columns — pure built-ins.

`F.zip_with` + `F.aggregate` keep the arithmetic JVM-side (no Python UDF in
the hot path). All math is done in double precision after an explicit cast,
matching the DuckDB oracle (`embedding::DOUBLE[]`) so results agree to
rounding.
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
