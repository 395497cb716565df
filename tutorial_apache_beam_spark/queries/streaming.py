"""Streaming queries for the correctness gate.

Each runs a Structured Streaming plan over a file-source replay of the
`events` fixture with `trigger(availableNow=True)` (deterministic: drain
everything, then stop) and returns the final sink table. This makes
streaming behavior — including watermark-driven append emission —
DuckDB-oracle-checkable:

- complete-mode output == the batch result of the same plan (Beam's
  unified-model property, SURVEY §5.2),
- append-mode output == batch result restricted to windows closed by the
  final watermark (max event time − delay), which the oracle computes
  with a scalar subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.operators.etl import parse_click_messages
from tutorial_apache_beam_spark.operators.windowing import tumbling_counts
from tutorial_apache_beam_spark.registry import register
from tutorial_apache_beam_spark.streaming.replay import (
    run_stream_to_memory,
    stream_events,
)


@register(
    "streaming_demo2_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 minute', ts)                       AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           user_id,
           count(*)                                                   AS count
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_demo2_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo2 as a real streaming job, complete mode: final state must equal
    the batch aggregation (unified model)."""
    sdf = stream_events(spark, sf_dir)
    agg = tumbling_counts(sdf, "ts", ["user_id"], "1 minute")
    return run_stream_to_memory(agg, spark, output_mode="complete")


@register(
    "streaming_demo2_append",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '2 minutes' AS w FROM events)
    SELECT time_bucket(INTERVAL '1 minute', ts)                       AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           user_id,
           count(*)                                                   AS count
    FROM events
    GROUP BY 1, 2, 3
    HAVING time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute'
           <= (SELECT w FROM wm)
    """,
)
def streaming_demo2_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo2 with a 2-minute watermark (1 m skew + 1 m lateness composed,
    SURVEY W1+W4), append mode: only windows the final watermark closed are
    emitted — Beam's AfterWatermark.pastEndOfWindow firing (W3)."""
    sdf = stream_events(spark, sf_dir).withWatermark("ts", "2 minutes")
    agg = tumbling_counts(sdf, "ts", ["user_id"], "1 minute")
    return run_stream_to_memory(agg, spark, output_mode="append")


@register(
    "streaming_demo1_etl",
    oracle="""
    SELECT date_trunc('second', ts) AS event_time,
           CAST(user_id AS INT)     AS user_id,
           1                        AS click
    FROM events
    """,
)
def streaming_demo1_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo1 as a streaming job: wire-format encode → parse → append.

    Stateless, so append mode emits every row immediately; the final sink
    must be exactly the batch identity projection.
    """
    sdf = stream_events(spark, sf_dir)
    wire = sdf.select(
        F.to_json(
            F.struct(
                F.unix_timestamp("ts").alias("event_time"),
                F.col("user_id").cast("int").alias("user_id"),
                F.lit(1).alias("click"),
            )
        ).alias("value")
    )
    parsed = parse_click_messages(wire)
    return run_stream_to_memory(parsed, spark, output_mode="append")
