"""Reference-parity queries: the Demo1 / Demo2 computations on fixtures.

Reference (citations into /root/reference):
- Demo1 (Demo1.java:33-107): parse JSON click message → typed append row.
- Demo2 (Demo2.java:44-184): parse → event-time 1-minute tumbling window →
  count clicks per user per window.

The batch forms below are the deterministic, oracle-checkable versions; the
streaming forms (same logical plans run incrementally) live in
`tutorial_apache_beam_spark.streaming`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.operators.etl import parse_click_messages
from tutorial_apache_beam_spark.operators.windowing import (
    session_agg,
    sliding_agg,
    tumbling_counts,
)
from tutorial_apache_beam_spark.registry import register


@register(
    "demo2_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 minute', ts)                       AS window_start,
           time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
           user_id,
           count(*)                                                   AS count
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def demo2_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks per user per 1-minute tumbling window (Demo2.java:149-160)."""
    events = load_table(spark, sf_dir, "events")
    return tumbling_counts(events, "ts", ["user_id"], "1 minute")


@register(
    "demo1_click_etl",
    oracle="""
    SELECT date_trunc('second', ts) AS event_time,
           CAST(user_id AS INT)     AS user_id,
           1                        AS click
    FROM events
    """,
)
def demo1_click_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo1's parse-and-append path, end to end (Demo1.java:52-72).

    Encodes each fixture event as the reference's JSON wire format
    ({"event_time": epoch_s, "user_id": ..., "click": 1} — the
    message_publisher.py:98-104 contract), then runs the real parse
    operator (`from_json` + drop-malformed). The oracle is the identity
    projection, which is exactly what a lossless parse must produce.
    """
    events = load_table(spark, sf_dir, "events")
    wire = events.select(
        F.to_json(
            F.struct(
                F.unix_timestamp("ts").alias("event_time"),
                F.col("user_id").cast("int").alias("user_id"),
                F.lit(1).alias("click"),
            )
        ).alias("value")
    )
    return parse_click_messages(wire)


@register(
    "demo1_drop_malformed",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_valid
    FROM events
    WHERE user_id IS NOT NULL
    """,
)
def demo1_drop_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed JSON is dropped silently, not failed (Demo1.java:65-68).

    Interleaves one corrupt payload per event with the valid wire rows; the
    parse must keep exactly the valid ones.
    """
    events = load_table(spark, sf_dir, "events")
    valid = events.select(
        F.to_json(
            F.struct(
                F.unix_timestamp("ts").alias("event_time"),
                F.col("user_id").cast("int").alias("user_id"),
                F.lit(1).alias("click"),
            )
        ).alias("value")
    )
    corrupt = events.select(F.lit("{not json!").alias("value"))
    parsed = parse_click_messages(valid.unionAll(corrupt))
    return parsed.agg(F.count(F.lit(1)).alias("n_valid"))


@register(
    "sliding_window_value_sum",
    oracle="""
    WITH hops AS (SELECT unnest(range(0, 5)) AS i)
    SELECT time_bucket(INTERVAL '1 minute', e.ts) - (h.i * INTERVAL '1 minute') AS window_start,
           time_bucket(INTERVAL '1 minute', e.ts) - (h.i * INTERVAL '1 minute')
             + INTERVAL '5 minutes'                                             AS window_end,
           e.event_type,
           count(*)                                                             AS count,
           round(sum(e.value), 2)                                               AS sum_value
    FROM events e CROSS JOIN hops h
    GROUP BY 1, 2, 3
    """,
)
def sliding_window_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute windows sliding by 1 minute (Beam SlidingWindows parity).

    Each event belongs to 5 hops; the oracle enumerates them explicitly.
    """
    events = load_table(spark, sf_dir, "events")
    out = sliding_agg(
        events,
        "ts",
        ["event_type"],
        "5 minutes",
        "1 minute",
        aggs=[
            F.count(F.lit(1)).alias("count"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    )
    return out


@register(
    "session_window_counts",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT min(ts)                         AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           user_id,
           count(*)                        AS count
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap (Beam Sessions parity).

    Spark's `session_window` merges events < gap apart; session_end is
    last_event + gap. The oracle reproduces that with a lag/cumsum
    sessionization.
    """
    events = load_table(spark, sf_dir, "events")
    return session_agg(events, "ts", ["user_id"], "30 minutes")


@register(
    "demo1_dead_letter_split",
    oracle="""
    SELECT 'parsed' AS branch, count(*) AS n FROM events
    UNION ALL
    SELECT 'dead_letter' AS branch, CAST(count(*) / 2 AS BIGINT) AS n FROM events
    """,
)
def demo1_dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter-queue variant of the Demo1 parse: malformed payloads go
    to a side output (with the raw bytes for replay) instead of vanishing.

    Input = one valid wire message per event + one corrupt payload per two
    events; output = per-branch counts.
    """
    from tutorial_apache_beam_spark.operators.etl import (
        parse_click_messages_with_dlq,
    )

    events = load_table(spark, sf_dir, "events")
    valid = events.select(
        F.to_json(
            F.struct(
                F.unix_timestamp("ts").alias("event_time"),
                F.col("user_id").cast("int").alias("user_id"),
                F.lit(1).alias("click"),
            )
        ).alias("value")
    )
    corrupt = events.filter(F.col("event_id") % 2 == 0).select(
        F.concat(F.lit("{corrupt:"), F.col("event_id").cast("string")).alias("value")
    )
    parsed, dead = parse_click_messages_with_dlq(valid.unionAll(corrupt))
    return (
        parsed.agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("parsed").alias("branch"), "n")
        .unionByName(
            dead.agg(F.count(F.lit(1)).alias("n")).select(
                F.lit("dead_letter").alias("branch"), "n"
            )
        )
    )
