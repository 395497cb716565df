"""Relational operators beyond plain built-ins: as-of join, top-k, range join.

The reference has no join surface at all (SURVEY §2.6) — this module is the
engine-scope extension. Everything is expressed as compositions of built-in
DataFrame ops so Catalyst keeps planning freedom (broadcast vs shuffle,
AQE skew splitting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Global top-k: `orderBy().limit(k)`.

    Spark plans this as TakeOrderedAndProject — each partition computes a
    local top-k, the driver merges k·num_partitions rows. No full sort, no
    full shuffle; safe at any scale for small k.
    """
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int
) -> DataFrame:
    """Top-k rows per group via row_number over a partitioned window.

    One shuffle on the group keys; within-partition sort only. For heavily
    skewed groups at 100 TB, pre-aggregate or salt before this — AQE's skew
    handling does not split a single window partition.
    """
    # The working column must dodge caller columns — withColumn silently
    # overwrites, so a caller frame already carrying '_rn' would lose it
    # (same guard as Partition/salted_agg).
    rn = "_rn"
    while rn in df.columns:
        rn = f"_{rn}"
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) <= k)
        .drop(rn)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row at-or-before its
    timestamp (direction="backward"; "forward" = earliest at-or-after).

    Spark has no native as-of join. The scalable plan used here is the
    union + sorted-window trick (one shuffle on the key, no range
    cross-join, no per-group pandas):

      1. tag both inputs and union them on (key, ts),
      2. per key ordered by ts, carry the last non-null right value
         forward with `last(..., ignorenulls=True)` (or first(...) looking
         forward),
      3. keep only left rows.

    This costs a single hash shuffle + in-partition sort — the same cost as
    the groupBy it replaces, versus O(n·m) for a naive range join. Ties
    (equal ts) resolve to the right row, i.e. at-or-before semantics.

    SQL-join edge parity (fuzz-checked against DuckDB ASOF JOIN in
    tests/test_differential.py):
    - NULL join keys never match (right rows with a NULL key are dropped;
      left rows with a NULL key pass through with NULL values), exactly
      like `ON l.k = r.k`.
    - The matched right row's values are carried ATOMICALLY via one
      struct, so a right row whose value column is legitimately NULL
      yields NULL — per-column last(..., ignorenulls) would instead
      stitch in an older row's value (the Latest.per_key defect class).
    """
    lcols = [c for c in left.columns if c not in (*on, left_ts)]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *lcols,
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in right_vals
            )
            + ">"
        )
        .alias("_rrow"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*right_vals).alias("_rrow"),
    )
    # NULL keys never equal anything in a join; a NULL-keyed right row
    # must not become a carry-forward candidate inside the NULL window
    # partition (left NULL-keyed rows still flow through unmatched).
    for k in on:
        r_tagged = r_tagged.filter(F.col(k).isNotNull())
    unioned = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        # Right rows sort before left rows at the same ts → at-or-before.
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts"), F.col("_is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = F.last("_rrow", ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts"), F.col("_is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        carried = F.first("_rrow", ignorenulls=True).over(w)
    else:
        raise ValueError(f"unknown direction: {direction!r}")
    filled = unioned.select(
        *on,
        "_ts",
        "_is_left",
        *lcols,
        *[carried.getField(c).alias(c) for c in right_vals],
    )
    return (
        filled.filter(F.col("_is_left") == 1)
        .drop("_is_left")
        .withColumnRenamed("_ts", left_ts)
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join without a cross product.

    Buckets the point column and explodes each [lo, hi) interval into the
    buckets it overlaps, turning the range predicate into an equi-join on
    bucket id + residual filter. Shuffle volume scales with
    interval_width/bucket_width instead of |left|x|right|.
    """
    extra_on = extra_on or []
    lb = left.withColumn(
        "_bucket", F.floor(F.col(left_point) / F.lit(bucket_width)).cast("long")
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, ["_bucket", *extra_on]).filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) < F.col(right_hi))
    )
    return joined.drop("_bucket")
