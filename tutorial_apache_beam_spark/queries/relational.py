"""Relational parity queries (SURVEY §2.6): joins, aggregation, analytics.

The reference has no joins/SQL surface (single-stream pipelines only);
this is the engine-scope extension over the TPC-H-ish star schema, all
pure built-in DataFrame ops so Catalyst plans them (broadcast joins for
dims, partial aggregation, pushdown).

Broadcast policy (100-TB contract): an UNCONDITIONAL `F.broadcast` hint
appears only on sides whose cardinality is bounded at any SF — nation
(25 rows), region (5), and one-row scalar aggregates. Tables that grow
linearly with SF (customer/supplier/part, even selectively filtered) and
join-derived dims carry NO hint: at large SF a forced broadcast blows
Spark's 8 GB broadcast limit / driver memory, while leaving the choice
to the size-estimate threshold + AQE picks broadcast exactly when the
side actually fits (AQE converts post-shuffle when runtime sizes allow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.registry import register


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2)                                       AS sum_qty,
           round(sum(l_extendedprice), 2)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2)                                       AS avg_qty,
           round(avg(l_extendedprice), 2)                                  AS avg_price,
           round(avg(l_discount), 2)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan + filter + 8-agg groupBy.

    Exercises pushdown (shipdate filter reaches the parquet scan) and
    map-side partial aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "star_join_revenue_by_nation",
    oracle="""
    SELECT n.n_name                                            AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join: fact ⋈ orders ⋈ customer ⋈ nation ⋈ region.

    Dimension tables are broadcast (they stay small at any SF — region has
    5 rows at 100 TB too); only the fact-side tables shuffle. AQE converts
    the orders join to broadcast when the filtered side is small.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "customer_set_ops",
    oracle="""
    WITH y1996 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
         y1997 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
    SELECT 'with_orders' AS segment, c_custkey AS custkey
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'no_1996_orders' AS segment, c_custkey AS custkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND year(o.o_orderdate) = 1996)
    UNION ALL
    SELECT 'both_96_97' AS segment, o_custkey AS custkey
    FROM (SELECT * FROM y1996 INTERSECT SELECT * FROM y1997)
    UNION ALL
    SELECT 'only_1996' AS segment, o_custkey AS custkey
    FROM (SELECT * FROM y1996 EXCEPT SELECT * FROM y1997)
    UNION ALL
    SELECT 'only_1997' AS segment, o_custkey AS custkey
    FROM (SELECT * FROM y1997 EXCEPT SELECT * FROM y1996)
    """,
)
def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer membership segments — semi-join, anti-join, and the set-op
    surface in one gate (merges round-1's `semi_join_customers_with_orders`,
    `anti_join_customers_without_orders`, `set_ops_customer_years`):

    - `with_orders`: left-semi (EXISTS) — placed at least one order;
    - `no_1996_orders`: left-anti (NOT EXISTS) against one year, so the
      segment is non-empty at every fixture SF;
    - `both_96_97` / `only_1996` / `only_1997`: INTERSECT / EXCEPT over
      yearly customer sets.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    seg = lambda df, tag: df.select(  # noqa: E731
        F.lit(tag).alias("segment"), F.col(df.columns[0]).alias("custkey")
    )
    semi = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey")
    anti = customer.join(
        orders.filter(F.year("o_orderdate") == 1996),
        customer.c_custkey == orders.o_custkey,
        "left_anti",
    ).select("c_custkey")
    y1996 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey").distinct()
    y1997 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    return (
        seg(semi, "with_orders")
        .unionByName(seg(anti, "no_1996_orders"))
        .unionByName(seg(y1996.intersect(y1997), "both_96_97"))
        .unionByName(seg(y1996.exceptAll(y1997), "only_1996"))
        .unionByName(seg(y1997.exceptAll(y1996), "only_1997"))
    )


@register(
    "outer_join_order_counts",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey)                         AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2)  AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving order-less customers (count = 0)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "asof_join_purchase_last_click",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           p.ts,
           round(c.value, 2) AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT value FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY c.ts DESC LIMIT 1
    ) c ON TRUE
    """,
)
def asof_join_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the latest prior click's value.

    Engine implementation is the union+window plan in
    `operators.relational.asof_join` (single shuffle, no range cross-join);
    the oracle is the equivalent LATERAL top-1 lookup. (user_id, ts) pairs
    are unique in the fixture, so the result is deterministic.
    """
    from tutorial_apache_beam_spark.operators.relational import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_vals=["value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value"), 2).alias("last_click_value"),
    )


@register(
    "range_join_price_bands",
    oracle="""
    WITH bands AS (
      SELECT CAST(900.0 + 2.0 * i AS DOUBLE) AS lo,
             CAST(900.0 + 2.0 * (i + 1) AS DOUBLE) AS hi
      FROM (SELECT unnest(range(0, 10)) AS i)
    )
    SELECT b.lo   AS band_lo,
           count(*) AS n_parts,
           round(avg(p.p_retailprice), 2) AS avg_price
    FROM part p JOIN bands b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY 1
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via bucketed equi-join (no cross product).

    Buckets make the range predicate an equi-join on bucket id
    (`operators.relational.range_join_bucketed`), which scales linearly
    instead of |parts| x |bands|.
    """
    from tutorial_apache_beam_spark.operators.relational import range_join_bucketed

    part = load_table(spark, sf_dir, "part")
    bands = spark.range(0, 10).select(
        (900.0 + 2.0 * F.col("id")).alias("lo"),
        (900.0 + 2.0 * (F.col("id") + 1)).alias("hi"),
    )
    joined = range_join_bucketed(
        part, bands, left_point="p_retailprice", right_lo="lo", right_hi="hi",
        bucket_width=2.0,
    )
    return joined.groupBy(F.col("lo").alias("band_lo")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
    )


@register(
    "topk_orders",
    oracle="""
    SELECT 'global' AS scope, o_custkey, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25)
    UNION ALL
    SELECT 'per_customer' AS scope, o_custkey, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k orders, global and per-group, in one gate (merges round-1's
    `global_top_orders` + `top_orders_per_customer`):

    - global top-25 (TakeOrderedAndProject — no full sort at scale);
    - top-3 per customer (windowed top-k, one shuffle on the key).
    """
    from tutorial_apache_beam_spark.operators.relational import (
        top_k,
        top_k_per_group,
    )

    orders = load_table(spark, sf_dir, "orders")
    # Rank on the RAW price (the oracle's inner ORDER BY is unrounded);
    # rounding is display-only, applied after membership is decided —
    # rounding first could flip the rank-25 cutoff at a .005 boundary.
    top_global = top_k(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        25,
    ).select(
        F.lit("global").alias("scope"),
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    per_cust = (
        top_k_per_group(
            orders,
            ["o_custkey"],
            [F.col("o_totalprice").desc(), F.col("o_orderkey")],
            3,
        )
        .select(
            F.lit("per_customer").alias("scope"),
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )
    return top_global.unionByName(per_cust)


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY 1, 3, 4
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → grouped revenue.

    The filtered customer side carries no forced hint (customer is
    SF-linear — module broadcast policy); the size threshold / AQE
    broadcasts it exactly when the filtered side fits. Both date
    predicates push to the parquet scans, so the join only sees
    qualifying rows.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING").select(
                "c_custkey"
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # Rounded at 6, not 2: each group sums only a handful of 6-decimal-
        # grid products, so the sum is on-grid and round(.,6) snaps exactly;
        # round(.,2) hits half-cent boundaries where the engines disagree.
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive pushdown + single agg —
    the minimal full-scan benchmark (no shuffle beyond the final reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
    )
    SELECT c.c_custkey,
           c.c_name,
           o.o_orderkey,
           o.o_orderdate,
           round(o.o_totalprice, 2)  AS o_totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-derived semi-join (orders whose lineitems
    sum past a threshold) feeding a grouped join — the "IN (grouped
    subquery)" pattern as a left-semi join on the aggregated key set."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


@register(
    "q4_order_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, count(*) AS late_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a cross-table range predicate
    (the fixtures lack l_commitdate/l_receiptdate, so "late" is l_shipdate
    more than 60 days after o_orderdate), then count per priority.

    The semi-join is equi on l_orderkey with the range condition folded
    into the join — Catalyst keeps it a hash semi-join (the range is a
    post-probe filter, not a nested loop), and the quarter filter on
    orders is pushed to the scan, shrinking the build side before the
    shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-04-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    return (
        quarter.join(
            li,
            (quarter.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > quarter.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_orders"))
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional aggregation (the
    fixtures lack l_shipmode, so groups are l_linestatus). The year filter
    on lineitem pushes to the scan; the CASE sums are one pass in the
    partial aggregate, so the shuffle after the join carries one row per
    (partition, linestatus)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Additional TPC-H analog shapes — library functions, pytest-oracle-verified
# (tests/test_tpch_extra.py). All but q8_market_share (promoted round 3)
# are deliberately NOT registered: the driver's correctness window is fully
# allocated (SURVEY §9); these deepen the join surface without displacing a
# gate.
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — for each part, the
    supplier(s) with the minimum account balance among its suppliers
    (fixtures lack partsupp/supplycost, so supplier acctbal over the
    lineitem part-supplier relationship stands in).

    Plan shape: the per-part minimum is a grouped aggregate joined back on
    (partkey, acctbal) — Catalyst's decorrelation of the classic
    `WHERE x = (SELECT min(...) WHERE correlated)` pattern, expressed
    directly. Both joins shuffle on p_partkey; the supplier dim broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    ps = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            supplier.select("s_suppkey", "s_name", "s_acctbal"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
    )
    # Derived self-join: rename the grouped side's key so Catalyst doesn't
    # resolve both predicate legs to the same lineage (trivially true).
    min_bal = ps.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        ps.join(
            min_bal,
            (F.col("l_partkey") == F.col("_mk"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
    )


def q5_regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way join restricted to one region and year,
    revenue per nation — the classic star-plus-snowflake volume query.
    Customer and supplier must share the nation (the Q5 twist that forces
    the supplier join to carry the nation key)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    return (
        li.join(
            orders.filter(F.year("o_orderdate") == 1996),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returns in one
    quarter (l_returnflag = 'R'), top 20 — join + grouped agg + top-k."""
    from tutorial_apache_beam_spark.operators.relational import top_k

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_rev"
            )
        )
    )
    joined = revenue.join(
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        ).select("c_custkey", "c_name", "c_acctbal", "n_name"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        "c_custkey",
        "c_name",
        F.round("_rev", 2).alias("revenue"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.col("n_name").alias("nation"),
    )
    return top_k(joined, [F.col("revenue").desc(), F.col("c_custkey")], 20)


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue share — promo-branded parts'
    percentage of one month's revenue (fixtures lack p_type PROMO values,
    so brand prefix 'Brand#1' stands in). Single join + one conditional
    aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_brand").startswith("Brand#1")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(
            part.select("p_partkey", "p_brand"),
            li.l_partkey == part.p_partkey,
        )
        .agg(
            F.round(
                100.0
                * F.sum(F.when(promo, rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
    )


def q7_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two specific nations, per
    direction per year — the bilateral-pair join where supplier and
    customer nations must differ and both orderings count.

    The two-nation filter broadcasts into both dimension joins; the
    direction label is computed after the join, so the fact tables are
    scanned once (not once per direction).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nations = nation.filter(F.col("n_name").isin("CHINA", "JAPAN"))
    cust_n = customer.join(
        F.broadcast(nations), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    supp_n = supplier.join(
        F.broadcast(nations), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of conjunctive
    brand/size/quantity bands — the OR-of-ANDs predicate that tests
    whether the optimizer can still push the common part (the join) and
    evaluate the residual once (fixtures lack p_container, so size bands
    stand in).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        part.select("p_partkey", "p_brand", "p_size"),
        li.l_partkey == part.p_partkey,
    )
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return j.filter(band).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS order_year,
           round(sum(CASE WHEN sn.n_name = 'CHINA'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS china_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year —
    a conditional-sum-over-total ratio on top of the snowflake join
    (supplier nation provides the numerator flag, customer region the
    population filter). Promoted from pytest (test_tpch_extra) into the
    driver window on the slot freed by the text/fingerprint gate merge.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_region = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == region.r_regionkey,
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("snk"), "n_name")),
        supplier.s_nationkey == F.col("snk"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "CHINA", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("china_share")
        )
    )


def q16_supplier_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute class,
    EXCLUDING a blocklisted supplier set (NOT IN as a left-anti join on
    the distinct part-supplier relationship; fixtures lack complaint
    comments, so negative-balance suppliers form the blocklist)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    blocked = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            blocked,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        ps.join(
            part.select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over parts
    matching a name pattern — the widest analog join (lineitem ⋈ part ⋈
    supplier ⋈ nation ⋈ orders) with a derived amount expression (fixtures
    lack partsupp supplycost, so 10% of retail price stands in for cost).

    The part filter prunes before the join; supplier→nation broadcasts;
    the only big shuffle is lineitem⋈orders on the order key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_n = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            part.filter(F.col("p_name").contains("red")).select(
                "p_partkey", "p_retailprice"
            ),
            li.l_partkey == part.p_partkey,
        )
        .join(supp_n, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("supp_nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("profit"))
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global-total threshold — the
    grouped-aggregate-filtered-by-scalar-subquery pattern (fixtures lack
    partsupp, so lineitem revenue stands in for stock value).

    The global total is a one-row aggregate broadcast into the filter —
    two passes over the same grouped result, no second scan of the fact
    (the grouped frame is persisted through both uses by Catalyst's reuse
    of the exchange). The threshold is rounded to 6 decimals on both
    engines (the q15/q17/q22 fp-parity rule): summation order differs
    across engines, and a part whose value sits inside that noise of the
    raw threshold would flip between them.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "value"
        )
    )
    total = per_part.agg(
        F.round(0.001 * F.sum("value"), 6).alias("_threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("_threshold"))
        .select("l_partkey", "value")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count INCLUDING
    zero-order customers — the left-outer-join-then-double-group pattern
    (fixtures lack o_comment, so urgent orders are excluded as the NOT
    LIKE stand-in).

    count(o_orderkey) over the left join counts 0 for unmatched customers;
    the second aggregation is over one row per customer — tiny.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the MAX quarterly revenue —
    grouped aggregate + scalar-max subquery equality join (the view-based
    original, decorrelated). Revenue is rounded to 2 BEFORE the max on
    both engines so the equality compare is parity-safe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_max"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max"))
        .join(supplier.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    correlated per-part AVG subquery, decorrelated into a grouped
    aggregate joined back to the fact. The 20%-of-average threshold is
    rounded to 6 decimals on both engines so the strict `<` compare can't
    flip on cross-engine fp summation noise.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand = li.join(
        part.filter(F.col("p_brand") == "Brand#23").select("p_partkey"),
        li.l_partkey == part.p_partkey,
    )
    avg_qty = brand.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_threshold")
    )
    return (
        brand.join(avg_qty, F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with promotable stock of a name-prefixed
    part family — the nested semi-join chain (part-name prefix filter →
    per-(part, supplier) availability-vs-period-demand predicate →
    DISTINCT supplier semi-join). Fixtures lack partsupp, so a supplier's
    all-time shipped quantity of the part stands in for ps_availqty:
    'promotable' means all-time qty > 2x the 1996 demand ('red%' parts
    stand in for Q20's 'forest%').

    Scale shape: the part-family filter joins onto the lineitem scan
    (unhinted — part is SF-linear, so AQE/size threshold decides the
    broadcast; module policy), one grouped aggregate per (part,
    supplier) carries both sums (no second fact pass), and the supplier
    semi-join likewise defers to AQE — quantities are integral doubles,
    so the 2x compare is fp-exact on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    per_ps = (
        li.join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(
                F.when(
                    F.year("l_shipdate") == 1996, F.col("l_quantity")
                ).otherwise(0.0)
            ).alias("qty_1996"),
        )
    )
    promotable = (
        per_ps.filter(F.col("total_qty") > 2 * F.col("qty_1996"))
        .select("l_suppkey")
        .distinct()
    )
    return supplier.join(
        promotable, supplier.s_suppkey == promotable.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    multi-supplier order — the exists/not-exists pair, decorrelated into
    per-order supplier/late-supplier counts (fixtures lack commit/receipt
    dates, so 'late' = shipped >60 days after the order date; lack
    nation, so unfiltered).

    Per (order, supplier): any_late flag. Per order: distinct suppliers
    and late suppliers. A supplier waits iff it is late, shares the order
    with another supplier, and no OTHER supplier on that order is late —
    exactly n_supp > 1 AND n_late = 1 AND any_late.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_os = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ).cast("int")
            ).alias("any_late")
        )
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late"),
    )
    return (
        per_os.join(per_o, per_os.l_orderkey == F.col("_ok"))
        .filter(
            (F.col("any_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: idle customers with above-average balances, by
    country code — anti join against orders + scalar AVG subquery
    (fixtures lack c_phone, so c_custkey % 7 stands in for the country
    code; codes 1-3 are the target set).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    coded = customer.withColumn(
        "cntrycode", (F.col("c_custkey") % 7).cast("int")
    ).filter(F.col("cntrycode").isin(1, 2, 3))
    avg_bal = coded.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 6).alias("_avg")
    )
    return (
        coded.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(orders, coded.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H analog sweep: the 15 analog shapes that don't have individual
# driver-window slots, driver-checked as ONE tagged-union gate.
# ---------------------------------------------------------------------------

# Per-analog DuckDB oracles (also the per-analog pytest oracles —
# tests/test_tpch_extra.py imports this table, single source of truth).
TPCH_EXTRA_ORACLES: dict[str, str] = {
    "q2": """
    WITH ps AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey, s.s_name, s.s_acctbal
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    )
    SELECT l_partkey AS p_partkey,
           l_suppkey AS s_suppkey,
           s_name,
           round(s_acctbal, 2) AS s_acctbal
    FROM ps p
    WHERE s_acctbal = (SELECT min(s_acctbal) FROM ps q
                       WHERE q.l_partkey = p.l_partkey)
    """,
    "q5": """
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1996
    GROUP BY 1
    """,
    "q7": """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           year(l.l_shipdate) AS ship_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('CHINA', 'JAPAN')
      AND sn.n_name IN ('CHINA', 'JAPAN')
      AND cn.n_name <> sn.n_name
    GROUP BY 1, 2, 3
    """,
    "q9": """
    SELECT sn.n_name AS supp_nation,
           year(o.o_orderdate) AS o_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE contains(p.p_name, 'red')
    GROUP BY 1, 2
    """,
    "q10": """
    WITH rev AS (
      SELECT o.o_custkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT c.c_custkey,
           c.c_name,
           round(rev.r, 2)        AS revenue,
           round(c.c_acctbal, 2)  AS c_acctbal,
           n.n_name               AS nation
    FROM rev
    JOIN customer c ON rev.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    ORDER BY round(rev.r, 2) DESC, c.c_custkey
    LIMIT 20
    """,
    "q11": """
    WITH per_part AS (
      SELECT l_partkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS value
      FROM lineitem GROUP BY 1)
    SELECT l_partkey, value FROM per_part
    WHERE value > (SELECT round(0.001 * sum(value), 6) FROM per_part)
    """,
    "q13": """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1)
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY 1
    """,
    "q14": """
    SELECT round(100.0 * sum(CASE WHEN p.p_brand LIKE 'Brand#1%'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_share_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    "q15": """
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "q16": """
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    )
    SELECT p.p_brand, p.p_size, count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
    GROUP BY 1, 2
    """,
    "q17": """
    WITH brand AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#23'),
    thresholds AS (
      SELECT l_partkey, round(0.2 * avg(l_quantity), 6) AS qty_threshold
      FROM brand GROUP BY 1)
    SELECT round(sum(b.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM brand b JOIN thresholds t ON b.l_partkey = t.l_partkey
    WHERE b.l_quantity < t.qty_threshold
    """,
    "q19": """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "q20": """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    ps AS (
      SELECT l_partkey, l_suppkey,
             sum(l_quantity) AS total_qty,
             sum(CASE WHEN year(l_shipdate) = 1996
                      THEN l_quantity ELSE 0 END) AS qty_1996
      FROM lineitem JOIN red ON l_partkey = p_partkey
      GROUP BY 1, 2
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM ps WHERE total_qty > 2 * qty_1996)
    """,
    "q21": """
    WITH per_os AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL '60 days'
                      THEN 1 ELSE 0 END) AS any_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2),
    per_o AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(any_late) AS n_late
      FROM per_os GROUP BY 1)
    SELECT s.l_suppkey AS s_suppkey, CAST(count(*) AS BIGINT) AS numwait
    FROM per_os s JOIN per_o o ON s.l_orderkey = o.l_orderkey
    WHERE s.any_late = 1 AND o.n_supp > 1 AND o.n_late = 1
    GROUP BY 1
    """,
    "q22": """
    WITH coded AS (
      SELECT c_custkey, c_acctbal, CAST(c_custkey % 7 AS INT) AS cntrycode
      FROM customer WHERE CAST(c_custkey % 7 AS INT) IN (1, 2, 3)),
    avg_bal AS (
      SELECT round(avg(c_acctbal), 6) AS a FROM coded WHERE c_acctbal > 0)
    SELECT cntrycode,
           CAST(count(*) AS BIGINT)     AS numcust,
           round(sum(c_acctbal), 2)     AS totacctbal
    FROM coded c
    WHERE c.c_acctbal > (SELECT a FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
}

# tag -> (query fn, key columns [stringified], numeric value columns).
# Key columns are int/string-typed on both engines (never double), so the
# CAST-to-string serialization is formatting-stable; value columns stay
# typed DOUBLE so the driver's float canonicalization applies.
TPCH_SWEEP_SPECS: dict[str, tuple] = {
    "q2": (q2_min_cost_supplier, ["p_partkey", "s_suppkey", "s_name"], ["s_acctbal"]),
    "q5": (q5_regional_volume, ["nation"], ["revenue"]),
    "q7": (q7_bilateral_volume, ["supp_nation", "cust_nation", "ship_year"], ["volume"]),
    "q9": (q9_product_profit, ["supp_nation", "o_year"], ["profit"]),
    "q10": (q10_returned_items, ["c_custkey", "c_name", "nation"], ["revenue", "c_acctbal"]),
    "q11": (q11_important_parts, ["l_partkey"], ["value"]),
    "q13": (q13_customer_distribution, ["c_count"], ["custdist"]),
    "q14": (q14_promo_revenue_share, [], ["promo_share_pct"]),
    "q15": (q15_top_supplier, ["s_suppkey", "s_name"], ["total_revenue"]),
    "q16": (q16_supplier_part_stats, ["p_brand", "p_size"], ["supplier_cnt"]),
    "q17": (q17_small_quantity_revenue, [], ["avg_yearly"]),
    "q19": (q19_disjunctive_revenue, [], ["revenue", "n_items"]),
    "q20": (q20_potential_promotion, ["s_suppkey", "s_name"], []),
    "q21": (q21_waiting_supplier, ["s_suppkey"], ["numwait"]),
    "q22": (q22_global_sales_opportunity, ["cntrycode"], ["numcust", "totacctbal"]),
}

# Derived, not hardcoded: a future spec with more value columns would
# otherwise be silently truncated on BOTH the engine and oracle sides —
# exactly the silent-coverage-loss failure class the sweep exists to stop.
_SWEEP_WIDTH = max(len(vals) for _fn, _keys, vals in TPCH_SWEEP_SPECS.values())


def _sweep_oracle() -> str:
    parts = []
    for tag, (_fn, keys, vals) in TPCH_SWEEP_SPECS.items():
        if keys:
            key = (
                "concat_ws('|', "
                + ", ".join(f"CAST({k} AS VARCHAR)" for k in keys)
                + ")"
            )
        else:
            key = "''"
        vcols = ", ".join(
            f"CAST({vals[i]} AS DOUBLE) AS v{i + 1}"
            if i < len(vals)
            else f"CAST(NULL AS DOUBLE) AS v{i + 1}"
            for i in range(_SWEEP_WIDTH)
        )
        parts.append(
            f"SELECT '{tag}' AS q, {key} AS k, {vcols}\n"
            f"FROM ({TPCH_EXTRA_ORACLES[tag]})"
        )
    return "\nUNION ALL\n".join(parts)


def _sweep_branch(df: DataFrame, tag: str, keys: list, vals: list) -> DataFrame:
    key = (
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        if keys
        else F.lit("")
    )
    cols = [F.lit(tag).alias("q"), key.alias("k")]
    for i in range(_SWEEP_WIDTH):
        src = (
            F.col(vals[i]).cast("double")
            if i < len(vals)
            else F.lit(None).cast("double")
        )
        cols.append(src.alias(f"v{i + 1}"))
    return df.select(*cols)


@register("tpch_analog_sweep", oracle=_sweep_oracle())
def tpch_analog_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 15 TPC-H analog shapes without individual driver-window slots
    (q2 q5 q7 q9 q10 q11 q13 q14 q15 q16 q17 q19 q20 q21 q22), checked as
    ONE tagged-union gate — with q1/q3/q4/q6/q8/q12/q18 individually
    registered, every one of the 22 adapted TPC-H query shapes is now
    DuckDB-oracle-verified by the driver, not just pytest.

    Serialization contract (the union needs one schema): key columns —
    always int- or string-typed — concat to `k` with '|'; numeric results
    stay typed `DOUBLE v1..v2` (null-padded) so cross-engine float
    canonicalization still applies. Each member keeps its full-schema
    individual oracle in TPCH_EXTRA_ORACLES, pytest-checked per analog.

    Scale: each branch is an independent Catalyst plan (broadcast dims,
    single fact shuffles — see the member docstrings); the union is
    evaluation-parallel, not a barrier.

    r13 (guide §7.3 — planning time IS the bottleneck on very wide
    unions): the 15 branch plans are CONSTRUCTED from a thread pool.
    Plan analysis happens JVM-side per py4j call, so concurrent driver
    threads overlap it — measured 4.8–8.5 s single-threaded vs ~1.2 s
    with 8 threads at sf0.1 (the members only build plans; nothing here
    mutates session conf). Futures are collected in spec order, so the
    union tree — and therefore the result — is unchanged.
    """
    from concurrent.futures import ThreadPoolExecutor

    def build(fn, tag, keys, vals):
        return _sweep_branch(fn(spark, sf_dir), tag, keys, vals)

    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [
            pool.submit(build, fn, tag, keys, vals)
            for tag, (fn, keys, vals) in TPCH_SWEEP_SPECS.items()
        ]
        dfs = [f.result() for f in futs]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
