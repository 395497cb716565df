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
    "demo1_malformed_split",
    oracle="""
    SELECT 'drop_parsed' AS branch, count(*) AS n FROM events
    UNION ALL
    SELECT 'dlq_parsed' AS branch, count(*) AS n FROM events
    UNION ALL
    SELECT 'dlq_dead_letter' AS branch, count(*) AS n
    FROM events WHERE event_id % 2 = 0
    """,
)
def demo1_malformed_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input handling, both policies in one gate (merges round-1's
    `demo1_drop_malformed` + `demo1_dead_letter_split`):

    - drop path (Demo1.java:65-68): malformed JSON silently dropped —
      `drop_parsed` must equal the valid-row count;
    - dead-letter path: malformed payloads routed to a side output with the
      raw bytes for replay — `dlq_parsed` / `dlq_dead_letter` count the two
      branches.

    Input = one valid wire message per event, one corrupt payload per even
    event_id (half the corrupt rows of the drop-path input, exercising a
    different malformed density on each path).
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
    corrupt_all = events.select(F.lit("{not json!").alias("value"))
    corrupt_half = events.filter(F.col("event_id") % 2 == 0).select(
        F.concat(F.lit("{corrupt:"), F.col("event_id").cast("string")).alias("value")
    )
    dropped = parse_click_messages(valid.unionAll(corrupt_all))
    parsed, dead = parse_click_messages_with_dlq(valid.unionAll(corrupt_half))
    count = lambda df, tag: df.agg(F.count(F.lit(1)).alias("n")).select(  # noqa: E731
        F.lit(tag).alias("branch"), "n"
    )
    return (
        count(dropped, "drop_parsed")
        .unionByName(count(parsed, "dlq_parsed"))
        .unionByName(count(dead, "dlq_dead_letter"))
    )


@register(
    "sliding_session_windows",
    oracle="""
    WITH hops AS (SELECT unnest(range(0, 5)) AS i),
    sliding AS (
      SELECT time_bucket(INTERVAL '1 minute', e.ts) - (h.i * INTERVAL '1 minute') AS window_start,
             time_bucket(INTERVAL '1 minute', e.ts) - (h.i * INTERVAL '1 minute')
               + INTERVAL '5 minutes'                                             AS window_end,
             e.event_type                                                         AS grp,
             count(*)                                                             AS count,
             round(sum(e.value), 2)                                               AS sum_value
      FROM events e CROSS JOIN hops h
      GROUP BY 1, 2, 3
    ),
    ordered AS (
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
    ), sess AS (
      SELECT min(ts)                         AS window_start,
             max(ts) + INTERVAL '30 minutes' AS window_end,
             CAST(user_id AS VARCHAR)        AS grp,
             count(*)                        AS count,
             CAST(NULL AS DOUBLE)            AS sum_value
      FROM sessions
      GROUP BY user_id, session_id
    )
    SELECT 'sliding' AS kind, * FROM sliding
    UNION ALL
    SELECT 'session' AS kind, * FROM sess
    """,
)
def sliding_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding + session windows in one gate (merges round-1's
    `sliding_window_value_sum` + `session_window_counts`; tumbling is
    `demo2_tumbling_counts` — together the full Beam window-fn surface, W2).

    - sliding: 5-minute windows every 1 minute (each event in 5 hops; the
      oracle enumerates the hops explicitly);
    - session: 30-minute-gap merged sessions, session_end = last event +
      gap, reproduced in SQL via lag/cumsum sessionization.
    """
    events = load_table(spark, sf_dir, "events")
    sliding = sliding_agg(
        events,
        "ts",
        ["event_type"],
        "5 minutes",
        "1 minute",
        aggs=[
            F.count(F.lit(1)).alias("count"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ],
    ).select(
        F.lit("sliding").alias("kind"),
        "window_start",
        "window_end",
        F.col("event_type").alias("grp"),
        "count",
        "sum_value",
    )
    session = session_agg(events, "ts", ["user_id"], "30 minutes").select(
        F.lit("session").alias("kind"),
        F.col("session_start").alias("window_start"),
        F.col("session_end").alias("window_end"),
        F.col("user_id").cast("string").alias("grp"),
        "count",
        F.lit(None).cast("double").alias("sum_value"),
    )
    return sliding.unionByName(session)
