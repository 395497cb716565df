"""Skew-mitigation operators: salted aggregation and salted broadcast join.

At 100 TB a single hot key (one power user, one viral document) can pin an
entire aggregation or join onto one task. Two standard remedies, expressed
as plan rewrites:

- `salted_agg`: two-stage aggregation — append a random-ish salt to the
  group key, partially aggregate on (key, salt) so the hot key's rows
  spread over `salt_buckets` tasks, then finish on the true key. Works for
  any algebraic aggregate (sum/count/min/max; avg via sum+count).
- `salted_broadcast_left`: for joins, broadcasting the small side already
  sidesteps skew entirely (no shuffle of the big side) — provided here as
  the explicitly-named idiom.

AQE's `skewJoin` handles *join* skew adaptively at runtime; aggregation
skew still benefits from explicit salting because the partial aggregate
happens before AQE can observe partition sizes.

The salt must be deterministic here (oracle comparability + replayable
tests): hash of a stable row attribute, not rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_source: Column,
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    `aggs` maps output column name → (input column, fn) with fn in
    {sum, count, min, max}. The partial stage computes fn over
    (keys, salt); the final stage re-combines partials per key (count
    re-combines with sum). Result equals the direct groupBy exactly.
    """
    combiners = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for name, (col, fn) in aggs.items():
        if fn not in combiners:
            raise ValueError(f"unsupported aggregate {fn!r} for {name!r}")

    salted = df.withColumn("_salt", F.pmod(salt_source, F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[
            combiners[fn](col).alias(f"_p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            recombine[fn](f"_p_{name}").alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )


def salted_broadcast_left(
    big: DataFrame, small: DataFrame, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join a skewed big side to a small side without shuffling the big
    side at all (broadcast hash join) — the first-choice skew remedy when
    the small side fits in executor memory."""
    return big.join(F.broadcast(small), on, how)
