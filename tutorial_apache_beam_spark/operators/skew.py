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
- `salted_shuffle_join`: when the partner side is too big to broadcast —
  salt the big side, replicate the partner per salt bucket, join on
  (keys + salt); a hot key spreads over `salt_buckets` tasks.

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
    {sum, count, count_rows, min, max}. The partial stage computes fn
    over (keys, salt); the final stage re-combines partials per key
    (counts re-combine with sum). Result equals the direct groupBy
    exactly. `count` follows SQL count(col) — non-null values of the
    named column (an earlier version silently counted ROWS whatever
    column was named, diverging from every SQL engine's count(col) the
    moment a null appeared); `count_rows` is the explicit count(*),
    ignoring its column argument.
    """
    combiners = {
        "sum": F.sum,
        "count": F.count,
        "count_rows": lambda c: F.count(F.lit(1)),
        "min": F.min,
        "max": F.max,
    }
    recombine = {
        "sum": F.sum,
        "count": F.sum,
        "count_rows": F.sum,
        "min": F.min,
        "max": F.max,
    }
    for name, (col, fn) in aggs.items():
        if fn not in combiners:
            raise ValueError(f"unsupported aggregate {fn!r} for {name!r}")

    # The working columns must not collide with real input columns —
    # withColumn silently overwrites, and a user '_salt' (e.g. produced
    # by an upstream salting step) feeding an agg would corrupt results
    # (same guard as salted_shuffle_join below).
    salt_name = "_salt"
    while salt_name in df.columns:
        salt_name = f"_{salt_name}"

    def _p(name: str) -> str:
        p = f"_p_{name}"
        while p in df.columns:
            p = f"_{p}"
        return p

    partials = {name: _p(name) for name in aggs}
    salted = df.withColumn(
        salt_name, F.pmod(salt_source, F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, salt_name).agg(
        *[
            combiners[fn](col).alias(partials[name])
            for name, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            recombine[fn](partials[name]).alias(name)
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


def salted_shuffle_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_col: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join for when the hot-key side's partner is TOO
    BIG to broadcast: salt the big side, replicate the partner once per
    salt bucket, join on (keys + salt).

    A hot join key's rows land in `salt_buckets` different shuffle
    partitions instead of one straggler task; the partner side grows by
    the replication factor — worth it exactly when partner_size ×
    salt_buckets ≪ big side's hot-partition size. (Prefer
    `salted_broadcast_left` when the partner broadcasts, and AQE's
    runtime skew-join split when post-shuffle partition stats suffice —
    this explicit rewrite covers the planner-opaque cases, e.g. skew
    hidden behind a preceding aggregation.)

    `salt_col`: a stable big-side attribute (e.g. the row's event id);
    the salt is its portable hash mod `salt_buckets` — deterministic, so
    results are replayable and oracle-comparable (rand() salting is not).
    Identical results to `big.join(small, on, how)` for inner/left joins:
    each big row joins exactly the partner replica carrying its salt.
    """
    from tutorial_apache_beam_spark.functions.hashing import portable_hash64

    # Replicating the partner makes right/full-outer WRONG (each
    # unmatched partner row would surface once per salt bucket).
    # 'semi'/'anti' are Spark aliases for the safe left-side forms.
    if how.lower().replace("_", "") not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti",
    ):
        raise ValueError(
            f"salted_shuffle_join supports inner/left joins, not {how!r}"
        )
    # The working column must not collide with a real input column on
    # either side (withColumn would silently overwrite it; a same-named
    # partner column would corrupt the equi-join keys).
    salt_name = "_salt"
    while salt_name in big.columns or salt_name in small.columns:
        salt_name = f"_{salt_name}"
    # NULL salt_col must still salt deterministically (a NULL hash would
    # make the (keys + salt) equi-join silently drop the row).
    salt = F.pmod(
        portable_hash64(F.coalesce(F.col(salt_col).cast("string"), F.lit(""))),
        F.lit(salt_buckets),
    ).cast("int")
    salted_big = big.withColumn(salt_name, salt)
    replicas = small.withColumn(
        salt_name,
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_big.join(replicas, [*on, salt_name], how).drop(salt_name)
