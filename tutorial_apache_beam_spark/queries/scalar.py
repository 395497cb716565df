"""Scalar function surface: string / date / math / conditional / JSON.

The reference's only scalar work is JSON encode/parse and epoch→Instant
(SURVEY §2.6); this module exposes the full engine function surface, all
`pyspark.sql.functions` built-ins (JVM codegen — no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.registry import register


@register(
    "string_functions_on_parts",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           lower(p_brand)                                  AS brand_lower,
           length(p_name)                                  AS name_len,
           substring(p_name, 1, 5)                         AS name_prefix,
           concat(p_brand, ':', p_type)                    AS brand_type,
           replace(p_type, ' ', '_')                       AS type_snake,
           trim(p_name)                                    AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0')           AS size_padded,
           reverse(p_brand)                                AS brand_rev,
           regexp_extract(p_brand, '([0-9]+)', 1)          AS brand_num,
           contains(p_type, 'BRASS')                       AS is_brass,
           array_to_string(string_split(p_name, ' '), '|') AS name_tokens
    FROM part
    """,
)
def string_functions_on_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface over part names/brands/types."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
        # Serialized (array_join) at the gate boundary: the driver's pandas
        # canonicalizer cannot sort list cells. Raw-array form stays in pytest.
        F.array_join(F.split("p_name", " "), "|").alias("name_tokens"),
    )


@register(
    "date_functions_on_orders",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                   AS o_year,
           month(o_orderdate)                                  AS o_month,
           day(o_orderdate)                                    AS o_day,
           quarter(o_orderdate)                                AS o_quarter,
           dayofweek(o_orderdate) + 1                          AS o_dow,
           dayofyear(o_orderdate)                              AS o_doy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', o_orderdate,
                     TIMESTAMP '2002-01-01 00:00:00')          AS days_to_2002,
           o_orderdate + INTERVAL '90 days'                    AS due_date,
           strftime(o_orderdate, '%Y-%m-%d')                   AS iso_date
    FROM orders
    """,
)
def date_functions_on_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface (dayofweek normalized: Spark is 1=Sunday,
    DuckDB 0=Sunday — oracle adds 1)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.dayofweek("o_orderdate").alias("o_dow"),
        F.dayofyear("o_orderdate").alias("o_doy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_date"),
    )


@register(
    "math_conditional_on_lineitem",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           round(abs(l_discount - 0.05), 6)                       AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)                       AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)                      AS qty_floor,
           round(sqrt(l_extendedprice), 6)                        AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)                      AS price_ln,
           round(log10(l_extendedprice + 1), 6)                   AS price_log10,
           round(pow(1 + l_tax, 2), 6)                            AS tax_sq,
           CAST(l_quantity AS BIGINT) % 7                         AS qty_mod7,
           CASE WHEN l_discount >= 0.05 THEN 'high'
                WHEN l_discount >= 0.02 THEN 'mid'
                ELSE 'low' END                                    AS disc_band,
           coalesce(nullif(l_returnflag, 'N'), 'none')            AS flag_or_none,
           greatest(l_tax, l_discount)                            AS max_rate,
           least(l_tax, l_discount)                               AS min_rate
    FROM lineitem
    """,
)
def math_conditional_on_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + CASE/COALESCE/NULLIF/GREATEST/LEAST surface."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
        F.when(F.col("l_discount") >= 0.05, "high")
        .when(F.col("l_discount") >= 0.02, "mid")
        .otherwise("low")
        .alias("disc_band"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "json_map_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)              AS k,
           CAST(json_extract(props, '$.k') AS INT) % 10         AS k_bucket,
           array_to_string(list_sort(json_keys(props)), '|')    AS prop_keys,
           CAST(json_extract(props, '$.k') AS INT) IS NOT NULL  AS has_k
    FROM events
    """,
)
def json_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + MapType surface in one gate (merges round-1's
    `json_props_extraction` + `map_functions_on_props`):

    - `from_json` into a typed struct (schema-on-read; malformed rows
      become NULL, mirroring the reference's drop-on-parse-failure);
    - `from_json` into MAP<STRING,INT> with map_keys / lookup / membership
      (the escape hatch for ragged JSON).
    """
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        F.from_json("props", "k INT").alias("_p"),
        F.from_json("props", "MAP<STRING, INT>").alias("_m"),
    )
    return parsed.select(
        "event_id",
        F.col("_p.k").alias("k"),
        (F.col("_p.k") % 10).alias("k_bucket"),
        # Sorted + serialized at the gate boundary (see string gate note).
        F.array_join(F.array_sort(F.map_keys("_m")), "|").alias("prop_keys"),
        F.col("_m")["k"].isNotNull().alias("has_k"),
    )
