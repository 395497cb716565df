"""The reference's two pipelines, re-expressed on the engine API.

Compare shapes with the reference (citations into /root/reference):

Demo1 (Demo1.java:79-100):
    Pipeline.create(options)
      .apply("ReadPubSubLite", PubsubLiteIO.read(...))
      .apply("ToTableRows", new MessageTransform())
      .apply("WriteBigQueryTables", BigQueryIO.writeTableRows()...)

Demo2 (Demo2.java:115-175):
    .apply("ReadPubSubLite", ...)
    .apply("ToKVElements", parse → KV(user_id, ts))
    .apply("AllowTimestampSkew", WithTimestamps(skew 1m))
    .apply("ConvertToUserIdOnly", MapElements → KV(user_id, null))
    .apply("ToPerMinuteWindow", FixedWindows(1m) + lateness(1m))
    .apply("ToPerMinuteWindowedSum", Count.perKey())
    .apply("ToTableRow", + processing_time)
    .apply("WriteBigQueryTables", ...)

The JSON-lines directory source stands in for the Pub/Sub Lite
subscription (Kafka-wire-compatible in production: swap the source for
`readStream.format("kafka")`, nothing else changes).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.operators.etl import (
    parse_click_messages,
    with_processing_time,
)
from tutorial_apache_beam_spark.plans.pipeline import (
    Count,
    FixedWindows,
    MapElements,
    Pipeline,
    PipelineResult,
    WindowInto,
    WithTimestamps,
    WriteParquet,
)


def demo1_pipeline(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> PipelineResult:
    """Stateless streaming ETL: JSON click messages → typed append table."""
    p = Pipeline(spark)
    (
        p.read_message_stream(source_dir)
        .apply("ToTableRows", MapElements(parse_click_messages))
        .apply("AddProcessingTime", MapElements(with_processing_time))
        .apply(
            "WriteAppendTable",
            WriteParquet(
                sink_dir,
                checkpoint=checkpoint_dir,
                available_now=available_now,
            ),
        )
    )
    return p.run()


def demo2_pipeline(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    allowed_skew: str = "1 minute",
    allowed_lateness: str = "1 minute",
    available_now: bool = True,
) -> PipelineResult:
    """Stateful windowed aggregation: clicks per user per 1-minute window.

    Output mode is append — rows emit once, when the watermark (event time
    minus skew+lateness) passes the window end: Beam's
    AfterWatermark.pastEndOfWindow() firing (SURVEY W3 mapping).
    """
    p = Pipeline(spark)
    (
        p.read_message_stream(source_dir)
        .apply("ToKVElements", MapElements(parse_click_messages))
        .apply("AllowTimestampSkew", WithTimestamps("event_time", allowed_skew))
        .apply(
            "ConvertToUserIdOnly",
            MapElements(lambda df: df.select("event_time", "user_id")),
        )
        .apply(
            "ToPerMinuteWindow",
            WindowInto(FixedWindows(window), allowed_lateness=allowed_lateness),
        )
        .apply("ToPerMinuteWindowedSum", Count.per_key("user_id"))
        .apply(
            "ToTableRow",
            MapElements(
                lambda df: df.select(
                    F.current_timestamp().alias("processing_time"),
                    "window_start",
                    "user_id",
                    "count",
                )
            ),
        )
        .apply(
            "WriteAppendTable",
            WriteParquet(
                sink_dir,
                checkpoint=checkpoint_dir,
                available_now=available_now,
            ),
        )
    )
    return p.run()
