"""Analytic-surface queries: SQL window functions, grouping sets, pivots,
set operations, distinct aggregation (SURVEY §2.6 parity rows).

All built-in Catalyst operators — the engine work is choosing
deterministic orderings (explicit tie-breakers) so results are
oracle-comparable, and shapes that scale (single shuffle per window
partition spec, partial aggregation everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.registry import register


@register(
    "rank_customers_by_balance",
    oracle="""
    SELECT c_nationkey,
           c_custkey,
           round(c_acctbal, 2) AS c_acctbal,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def rank_customers_by_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over a partitioned ordered window."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return customer.select(
        "c_nationkey",
        "c_custkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "lag_lead_event_values",
    oracle="""
    SELECT event_id,
           user_id,
           ts,
           round(value, 2)                                              AS value,
           round(lag(value)  OVER w, 2)                                 AS prev_value,
           round(lead(value) OVER w, 2)                                 AS next_value,
           round(value - lag(value) OVER w, 2)                          AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    """,
)
def lag_lead_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event-time order ((user_id, ts) is unique)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("value"),
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@register(
    "running_revenue_per_customer",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           o_orderdate,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_spend
    FROM orders
    """,
)
def running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-sum frame (ROWS UNBOUNDED PRECEDING) with explicit
    tie-breaker so the running value is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "rollup_revenue_by_flag_status",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           grouping_id(l_returnflag, l_linestatus) AS gid,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping_id disambiguating NULL keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    ).select("l_returnflag", "l_linestatus", "gid", "revenue", "n_items")


@register(
    "cube_orders_by_status_priority",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           grouping_id(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_by_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping-set combinations in one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag,
           l_suppkey,
           grouping_id(l_returnflag, l_suppkey) AS gid,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube)."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               l_suppkey,
               grouping_id(l_returnflag, l_suppkey) AS gid,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
        """
    )


@register(
    "pivot_qty_by_flag_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem
    GROUP BY 1
    """,
)
def pivot_qty_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list → single pass,
    no extra job to discover distinct values)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out


@register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS measure, round(p_retailprice, 2) AS val FROM part
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide columns into (measure, val) rows via stack()."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.expr(
            "stack(2, 'p_size', CAST(p_size AS DOUBLE),"
            " 'p_retailprice', round(p_retailprice, 2)) AS (measure, val)"
        ),
    )


@register(
    "set_ops_customer_years",
    oracle="""
    WITH y1996 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
         y1997 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    SELECT 'both' AS segment, o_custkey FROM (SELECT * FROM y1996 INTERSECT SELECT * FROM y1997)
    UNION ALL
    SELECT 'only_1996' AS segment, o_custkey FROM (SELECT * FROM y1996 EXCEPT SELECT * FROM y1997)
    UNION ALL
    SELECT 'only_1997' AS segment, o_custkey FROM (SELECT * FROM y1997 EXCEPT SELECT * FROM y1996)
    """,
)
def set_ops_customer_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over yearly customer sets."""
    orders = load_table(spark, sf_dir, "orders")
    y1996 = (
        orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    )
    y1997 = (
        orders.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    )
    both = y1996.intersect(y1997).select(F.lit("both").alias("segment"), "o_custkey")
    only96 = y1996.exceptAll(y1997).select(
        F.lit("only_1996").alias("segment"), "o_custkey"
    )
    only97 = y1997.exceptAll(y1996).select(
        F.lit("only_1997").alias("segment"), "o_custkey"
    )
    return both.unionByName(only96).unionByName(only97)


@register(
    "distinct_agg_per_supplier",
    oracle="""
    SELECT l_suppkey,
           count(DISTINCT l_partkey)  AS n_parts,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*)                   AS n_items
    FROM lineitem
    GROUP BY 1
    """,
)
def distinct_agg_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Catalyst expand + 2-phase)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register("approx_distinct_users")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — sketch values are engine-specific, so
    no SQL oracle (driver does the rows-only check); the companion exact
    query `distinct_agg_per_supplier` anchors correctness.

    At 100 TB this is the right default for distinct-cardinality dashboards:
    one pass, fixed memory, no expand.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "having_filter_big_suppliers",
    oracle="""
    SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY 1
    HAVING sum(l_quantity) > 15000
    """,
)
def having_filter_big_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 15000)
        .select("l_suppkey", F.round("_raw_qty", 2).alias("total_qty"))
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
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
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


@register(
    "stats_aggregates_per_type",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 4)               AS sd_samp,
           round(stddev_pop(value), 4)                AS sd_pop,
           round(var_samp(value), 4)                  AS var_samp,
           round(var_pop(value), 4)                   AS var_pop,
           round(corr(value, user_id), 4)             AS corr_vu,
           round(covar_samp(value, user_id), 4)       AS covar_s,
           round(covar_pop(value, user_id), 4)        AS covar_p,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4)  AS p50,
           round(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS p95,
           round(CAST(median(value) AS DOUBLE), 4)    AS med,
           round(min(value), 4)                       AS vmin,
           round(max(value), 4)                       AS vmax
    FROM events
    GROUP BY 1
    """,
)
def stats_aggregates_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: stddev/variance (sample+population),
    correlation, covariance, exact percentiles, median."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("value"), 4).alias("sd_pop"),
        F.round(F.var_samp("value"), 4).alias("var_samp"),
        F.round(F.var_pop("value"), 4).alias("var_pop"),
        F.round(F.corr("value", "user_id"), 4).alias("corr_vu"),
        F.round(F.covar_samp("value", "user_id"), 4).alias("covar_s"),
        F.round(F.covar_pop("value", "user_id"), 4).alias("covar_p"),
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.95), 4).alias("p95"),
        F.round(F.median("value"), 4).alias("med"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


@register(
    "collection_functions_per_user",
    oracle="""
    SELECT user_id,
           list_sort(list(DISTINCT event_type))               AS types_seen,
           len(list_distinct(list(event_type)))               AS n_types,
           list_contains(list(event_type), 'purchase')        AS has_purchase,
           arg_min(event_id, ts)                              AS first_event_id,
           arg_max(event_id, ts)                              AS last_event_id,
           round(list_aggregate(list(value), 'sum'), 2)       AS total_value
    FROM events
    GROUP BY 1
    """,
)
def collection_functions_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregate surface: collect_set/sort, membership,
    min_by/max_by (argmin/argmax on event time), list aggregation."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types_seen"),
        F.size(F.collect_set("event_type")).alias("n_types"),
        F.array_contains(F.collect_list("event_type"), "purchase").alias(
            "has_purchase"
        ),
        F.min_by("event_id", "ts").alias("first_event_id"),
        F.max_by("event_id", "ts").alias("last_event_id"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "map_functions_on_props",
    oracle="""
    SELECT event_id,
           json_keys(props)                                   AS prop_keys,
           CAST(json_extract(props, '$.k') AS INT)            AS k_value,
           CAST(json_extract(props, '$.k') AS INT) IS NOT NULL AS has_k
    FROM events
    """,
)
def map_functions_on_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → MapType surface: parse props into a map, inspect keys and
    values (the schema-on-read escape hatch for ragged JSON)."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        F.from_json("props", "MAP<STRING, INT>").alias("m"),
    )
    return parsed.select(
        "event_id",
        F.map_keys("m").alias("prop_keys"),
        F.col("m")["k"].alias("k_value"),
        F.col("m")["k"].isNotNull().alias("has_k"),
    )


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
        aggs={"total_raw": ("value", "sum"), "n": ("value", "count")},
        salt_buckets=16,
    )
    return out.select(
        "user_id", F.round("total_raw", 2).alias("total"), "n"
    )
