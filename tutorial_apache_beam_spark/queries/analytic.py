"""Analytic-surface queries: SQL window functions, multi-dimensional
aggregation, distinct aggregation, aggregate-function surface (SURVEY §2.6
parity rows).

All built-in Catalyst operators — the engine work is choosing deterministic
orderings (explicit tie-breakers) so results are oracle-comparable, and
shapes that scale (single shuffle per window partition spec, partial
aggregation everywhere).

Round-2 registry note: the driver's correctness harness checks a bounded
number of queries, so round-1's one-gate-per-function entries are merged
into one gate per SURVEY row (each still exercising every API of the row);
the old name → new gate mapping is documented in SURVEY.md §9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.registry import register


@register(
    "window_function_surface",
    oracle="""
    SELECT event_id,
           user_id,
           ts,
           round(value, 2)                                              AS value,
           row_number() OVER wt                                         AS rn,
           rank()       OVER we                                         AS rnk,
           dense_rank() OVER we                                         AS drnk,
           round(lag(value)  OVER wt, 2)                                AS prev_value,
           round(lead(value) OVER wt, 2)                                AS next_value,
           round(value - lag(value) OVER wt, 2)                         AS delta,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING), 2)         AS running_value
    FROM events
    WINDOW wt AS (PARTITION BY user_id ORDER BY ts),
           we AS (PARTITION BY user_id ORDER BY event_type)
    """,
)
def window_function_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-function surface in one gate (merges round-1's
    `rank_customers_by_balance`, `lag_lead_event_values`,
    `running_revenue_per_customer` onto a single table):

    - row_number over per-user event-time order ((user_id, ts) is unique);
    - rank / dense_rank over event_type order — ties are the point: equal
      types share a rank, dense_rank stays gapless;
    - lag / lead / delta over event-time order;
    - cumulative sum (ROWS UNBOUNDED PRECEDING).

    Both window specs partition by user_id, so Catalyst plans ONE exchange
    for all seven functions (two in-partition sorts) — the shuffle-reuse
    property that matters at 100 TB.
    """
    events = load_table(spark, sf_dir, "events")
    wt = Window.partitionBy("user_id").orderBy("ts")
    we = Window.partitionBy("user_id").orderBy("event_type")
    wrun = wt.rowsBetween(Window.unboundedPreceding, 0)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("value"),
        F.row_number().over(wt).alias("rn"),
        F.rank().over(we).alias("rnk"),
        F.dense_rank().over(we).alias("drnk"),
        F.round(F.lag("value").over(wt), 2).alias("prev_value"),
        F.round(F.lead("value").over(wt), 2).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(wt), 2).alias("delta"),
        F.round(F.sum("value").over(wrun), 2).alias("running_value"),
    )


@register(
    "multi_dim_aggregates",
    oracle="""
    SELECT 'rollup' AS src,
           l_returnflag AS k1,
           l_linestatus AS k2,
           grouping_id(l_returnflag, l_linestatus) AS gid,
           count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS amount
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'cube' AS src,
           o_orderstatus AS k1,
           o_orderpriority AS k2,
           grouping_id(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS amount
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    UNION ALL
    SELECT 'gsets' AS src,
           l_returnflag AS k1,
           CAST(l_suppkey AS VARCHAR) AS k2,
           grouping_id(l_returnflag, l_suppkey) AS gid,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS amount
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
    UNION ALL
    SELECT 'pivot_unpivot' AS src,
           l_returnflag AS k1,
           l_linestatus AS k2,
           CAST(NULL AS BIGINT) AS gid,
           CAST(NULL AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS amount
    FROM lineitem
    WHERE l_linestatus IN ('O', 'F')
    GROUP BY 2, 3
    """,
)
def multi_dim_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional aggregation surface in one gate (merges round-1's
    `rollup_revenue_by_flag_status`, `cube_orders_by_status_priority`,
    `grouping_sets_revenue`, `pivot_qty_by_flag_status`,
    `unpivot_part_measures`):

    - ROLLUP hierarchy totals with grouping_id disambiguating NULL keys;
    - CUBE: all 2^2 grouping-set combinations in one pass;
    - explicit GROUPING SETS via spark.sql (the SQL-layer gate);
    - pivot (explicit value list → single pass) immediately unpivoted back
      via stack(), proving the two reshapes are inverses — the oracle is
      the direct groupBy.

    Every branch is a two-phase (partial + final) aggregate; `expand` for
    the grouping sets multiplies rows map-side only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    rollup = li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "amount"
        ),
    ).select(
        F.lit("rollup").alias("src"),
        F.col("l_returnflag").alias("k1"),
        F.col("l_linestatus").alias("k2"),
        "gid",
        "n",
        "amount",
    )
    cube = orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("amount"),
    ).select(
        F.lit("cube").alias("src"),
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        "gid",
        "n",
        "amount",
    )
    # A gate must not clobber session-global view names a user may have
    # registered for a DIFFERENT sf_dir (catalog.register_views): bind the
    # SQL branch to a private view name and drop it once the plan is
    # analyzed (spark.sql resolves views eagerly, so the DataFrame stays
    # valid after the drop).
    li.createOrReplaceTempView("_mda_lineitem_gsets")
    try:
        gsets = spark.sql(
            """
            SELECT 'gsets' AS src,
                   l_returnflag AS k1,
                   CAST(l_suppkey AS STRING) AS k2,
                   grouping_id(l_returnflag, l_suppkey) AS gid,
                   count(*) AS n,
                   round(sum(l_extendedprice), 2) AS amount
            FROM _mda_lineitem_gsets
            GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
            """
        )
    finally:
        # finally: a failing spark.sql must not leak the private view
        # into the session catalog.
        spark.catalog.dropTempView("_mda_lineitem_gsets")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    pivot_unpivot = wide.select(
        F.lit("pivot_unpivot").alias("src"),
        F.col("l_returnflag").alias("k1"),
        F.expr("stack(2, 'O', O, 'F', F) AS (k2, amount)"),
    ).select(
        "src",
        "k1",
        "k2",
        F.lit(None).cast("bigint").alias("gid"),
        F.lit(None).cast("bigint").alias("n"),
        "amount",
    ).filter(
        # pivot() materializes a cell for every (flag, status) combination;
        # a combination absent from the data unpivots to a NULL-amount row
        # the oracle's plain GROUP BY never produces. All 6 combos exist in
        # the TPC-H-ish fixtures, but real TPC-H guarantees ('R','O') is
        # empty — drop the synthetic cells so semantics match at any SF.
        F.col("amount").isNotNull()
    )
    return rollup.unionByName(cube).unionByName(gsets).unionByName(pivot_unpivot)


@register(
    "distinct_agg_having_suppliers",
    oracle="""
    SELECT l_suppkey,
           count(DISTINCT l_partkey)  AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*)                   AS n_items,
           round(sum(l_quantity), 2)  AS total_qty
    FROM lineitem
    GROUP BY 1
    HAVING sum(l_quantity) > 15000
    """,
)
def distinct_agg_having_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Catalyst expand +
    two-phase) with a post-aggregation HAVING filter (merges round-1's
    `distinct_agg_per_supplier` + `having_filter_big_suppliers`)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 15000)
        .select(
            "l_suppkey",
            "n_parts",
            "n_orders",
            "n_items",
            F.round("_raw_qty", 2).alias("total_qty"),
        )
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — sketch values are engine-specific, so
    this is NOT oracle-gated (tests/test_sketches.py bounds the error vs
    the exact count instead; the registry's `distinct_agg_having_suppliers`
    anchors exact-distinct correctness).

    At 100 TB this is the right default for distinct-cardinality
    dashboards: one pass, fixed memory, no expand.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "revenue_share_per_nation",
    oracle="""
    WITH per_nation AS (
      SELECT n.n_name AS nation, sum(o.o_totalprice) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    )
    SELECT nation,
           round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (), 4) AS share
    FROM per_nation
    """,
)
def revenue_share_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery pattern (share of global total) as an empty-frame
    window aggregate — one extra single-row exchange, not a second scan."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_nation = (
        # No forced broadcast: customer grows linearly with SF (policy in
        # queries/relational.py module docstring) — the size threshold /
        # AQE picks broadcast exactly when the projected side fits.
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("_revenue"))
    )
    w = Window.partitionBy()
    return per_nation.select(
        "nation",
        F.round("_revenue", 2).alias("revenue"),
        F.round(F.col("_revenue") / F.sum("_revenue").over(w), 4).alias("share"),
    )


# The aggregate-function EAV blocks: (metric, expression) in a fixed order
# shared by the Spark stack() and the oracle CTE unpivot.
_STATS_METRICS = [
    ("sd_samp", "round(stddev_samp(value), 4)"),
    ("sd_pop", "round(stddev_pop(value), 4)"),
    ("var_samp", "round(var_samp(value), 4)"),
    ("var_pop", "round(var_pop(value), 4)"),
    ("corr_vu", "round(corr(value, user_id), 4)"),
    ("covar_s", "round(covar_samp(value, user_id), 4)"),
    ("covar_p", "round(covar_pop(value, user_id), 4)"),
    ("med", None),  # engine-specific expressions, see below
    ("p50", None),
    ("p95", None),
    ("vmin", "round(min(value), 4)"),
    ("vmax", "round(max(value), 4)"),
]


@register(
    "event_aggregate_surface",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             {", ".join(f"{expr} AS {m}" for m, expr in _STATS_METRICS if expr)},
             round(CAST(median(value) AS DOUBLE), 4)               AS med,
             round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4)   AS p50,
             round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4)  AS p95
      FROM events GROUP BY 1),
    c AS (
      SELECT user_id,
             CAST(len(list_distinct(list(event_type))) AS DOUBLE)  AS n_types,
             array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_seen,
             CAST(list_contains(list(event_type), 'purchase') AS VARCHAR) AS has_purchase,
             CAST(arg_min(event_id, ts) AS DOUBLE)                 AS first_event_id,
             CAST(arg_max(event_id, ts) AS DOUBLE)                 AS last_event_id,
             round(sum(value), 2)                                  AS total_value
      FROM events GROUP BY 1)
    SELECT 'stats' AS scope, event_type AS grp, u.metric, u.val_num,
           CAST(NULL AS VARCHAR) AS val_str
    FROM s, unnest([{", ".join(f"('{m}', {m})" for m, _ in _STATS_METRICS)}]
                   ::STRUCT(metric VARCHAR, val_num DOUBLE)[]) AS t(u)
    UNION ALL
    SELECT 'collection' AS scope, CAST(user_id AS VARCHAR) AS grp, u.metric,
           u.val_num, u.val_str
    FROM c, unnest([('n_types', n_types, NULL),
                    ('types_seen', NULL, types_seen),
                    ('has_purchase', NULL, has_purchase),
                    ('first_event_id', first_event_id, NULL),
                    ('last_event_id', last_event_id, NULL),
                    ('total_value', total_value, NULL)]
                   ::STRUCT(metric VARCHAR, val_num DOUBLE, val_str VARCHAR)[]) AS t(u)
    """,
)
def event_aggregate_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function surface in one EAV-shaped gate (merges round-1's
    `stats_aggregates_per_type` + `collection_functions_per_user`,
    preserving each function's original grouping):

    - per event_type: stddev/variance (sample+population), correlation,
      covariance, exact percentiles, median, min/max;
    - per user_id: collect_set/sort + membership, min_by/max_by (argmin /
      argmax on event time — deterministic because (user_id, ts) is
      unique), list aggregation.

    Output rows are (scope, grp, metric, val_num, val_str) so two different
    group grains share one gate without losing per-function value checks.
    """
    events = load_table(spark, sf_dir, "events")
    stats = events.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("value"), 4).alias("sd_pop"),
        F.round(F.var_samp("value"), 4).alias("var_samp"),
        F.round(F.var_pop("value"), 4).alias("var_pop"),
        F.round(F.corr("value", "user_id"), 4).alias("corr_vu"),
        F.round(F.covar_samp("value", "user_id"), 4).alias("covar_s"),
        F.round(F.covar_pop("value", "user_id"), 4).alias("covar_p"),
        F.round(F.median("value"), 4).alias("med"),
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.95), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )
    stats_stack = ", ".join(f"'{m}', {m}" for m, _ in _STATS_METRICS)
    stats_eav = stats.select(
        F.lit("stats").alias("scope"),
        F.col("event_type").alias("grp"),
        F.expr(
            f"stack({len(_STATS_METRICS)}, {stats_stack}) AS (metric, val_num)"
        ),
    ).select("scope", "grp", "metric", "val_num", F.lit(None).cast("string").alias("val_str"))

    coll = events.groupBy("user_id").agg(
        F.size(F.collect_set("event_type")).cast("double").alias("n_types"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "types_seen"
        ),
        F.array_contains(F.collect_list("event_type"), "purchase")
        .cast("string")
        .alias("has_purchase"),
        F.min_by("event_id", "ts").cast("double").alias("first_event_id"),
        F.max_by("event_id", "ts").cast("double").alias("last_event_id"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    coll_eav = coll.select(
        F.lit("collection").alias("scope"),
        F.col("user_id").cast("string").alias("grp"),
        F.expr(
            "stack(6, 'n_types', n_types, CAST(NULL AS STRING), "
            "'types_seen', CAST(NULL AS DOUBLE), types_seen, "
            "'has_purchase', CAST(NULL AS DOUBLE), has_purchase, "
            "'first_event_id', first_event_id, CAST(NULL AS STRING), "
            "'last_event_id', last_event_id, CAST(NULL AS STRING), "
            "'total_value', total_value, CAST(NULL AS STRING)) "
            "AS (metric, val_num, val_str)"
        ),
    ).select("scope", "grp", "metric", "val_num", "val_str")
    return stats_eav.unionByName(coll_eav)


@register(
    "salted_skew_aggregation",
    oracle="""
    SELECT user_id,
           round(sum(value), 2) AS total,
           count(*)             AS n
    FROM events
    GROUP BY 1
    """,
)
def salted_skew_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation (operators.skew.salted_agg): identical
    result to the direct groupBy, but a hot key's rows spread across 16
    salt buckets in the partial stage — the explicit skew remedy for
    aggregations at 100 TB."""
    from tutorial_apache_beam_spark.operators.skew import salted_agg

    events = load_table(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["user_id"],
        salt_source=F.col("event_id"),
        aggs={"total_raw": ("value", "sum"), "n": ("value", "count_rows")},
        salt_buckets=16,
    )
    return out.select(
        "user_id", F.round("total_raw", 2).alias("total"), "n"
    )
