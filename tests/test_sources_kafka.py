"""Kafka source contract without a broker (SURVEY S1; reference
Demo1.java:75-83 reads Pub/Sub Lite, which speaks the Kafka wire protocol).

The spark-sql-kafka package is not on this container's classpath, so these
tests pin everything AROUND the transport: the option wiring, the
normalization of the fixed kafka wire schema to the (value, timestamp)
shape every demo pipeline consumes, and the clear error raised when the
package is missing.
"""

from __future__ import annotations

import pytest

from tutorial_apache_beam_spark.sources.readers import (
    KAFKA_WIRE_SCHEMA,
    kafka_reader_options,
    normalize_kafka,
    stream_kafka,
)


def test_kafka_reader_options_wiring():
    opts = kafka_reader_options("broker:9092", "clicks", "earliest")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "clicks",
        "startingOffsets": "earliest",
    }
    assert kafka_reader_options("b", "t")["startingOffsets"] == "latest"


def test_normalize_kafka_wire_schema(spark):
    import datetime

    raw = spark.createDataFrame(
        [
            (
                None,
                b'{"event_time": 1, "user_id": 2, "click": 1}',
                "clicks",
                0,
                42,
                datetime.datetime(2024, 1, 1, 0, 0, 1),
                0,
            )
        ],
        KAFKA_WIRE_SCHEMA,
    )
    out = normalize_kafka(raw)
    assert out.schema.simpleString() == "struct<value:string,timestamp:timestamp>"
    row = out.collect()[0]
    assert row["value"].startswith('{"event_time"')  # bytes -> string payload


def test_stream_kafka_raises_clear_error_without_package(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        stream_kafka(spark, "broker:9092", "clicks")


def test_to_kafka_wire_shape_and_roundtrip(spark):
    """The publisher encode must produce exactly the kafka sink contract
    (key BINARY, value BINARY) and its JSON payload must parse back
    through the Demo1 consumer path unchanged (publisher/consumer wire
    symmetry — reference message_publisher.py:23-119)."""
    from pyspark.sql import functions as F

    from tutorial_apache_beam_spark.operators.etl import parse_click_messages
    from tutorial_apache_beam_spark.sources.readers import to_kafka_wire

    events = spark.createDataFrame(
        [(1704067200, 7, 1), (1704067201, 9, 0)],
        "event_time BIGINT, user_id BIGINT, click BIGINT",
    )
    wire = to_kafka_wire(events)
    assert wire.schema.simpleString() == "struct<key:binary,value:binary>"
    back = parse_click_messages(
        wire.select(F.col("value").cast("string").alias("value"))
    )
    got = sorted(
        (int(r["event_time"].timestamp()), r["user_id"], r["click"])
        for r in back.select("event_time", "user_id", "click").collect()
    )
    assert got == [(1704067200, 7, 1), (1704067201, 9, 0)]


def test_kafka_writer_options_wiring():
    from tutorial_apache_beam_spark.sources.readers import (
        kafka_writer_options,
    )

    assert kafka_writer_options("b:9092", "clicks") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "clicks",
    }


def test_kafka_wire_golden_corpus(spark):
    """Replay tests/data/kafka_wire_corpus.jsonl (VERDICT r5 item 5):
    the broker-less sandbox can't run the kafka transport e2e, so the
    producer wire bytes are PINNED — re-encoding the recorded fixture
    rows must reproduce the committed (key, value) bytes exactly, and
    every recorded demo1 payload must still parse back through the
    Demo1 consumer path. Any regression in field order, key derivation,
    casting, or JSON formatting fails here instead of against a real
    topic. Re-record (deliberate format changes only) with
    `python tools/record_kafka_corpus.py`."""
    import json
    import os

    from pyspark.sql import functions as F

    from tools.record_kafka_corpus import encode_corpus
    from tutorial_apache_beam_spark.operators.etl import parse_click_messages

    path = os.path.join(
        os.path.dirname(__file__), "data", "kafka_wire_corpus.jsonl"
    )
    recorded = [json.loads(line) for line in open(path)]
    assert {e["schema"] for e in recorded} == {"demo1_input", "demo2_counts"}

    # 1. Byte-identical re-encode of the fixture rows.
    fresh = encode_corpus(spark)
    assert [(e["schema"], e["row"]) for e in fresh] == [
        (e["schema"], e["row"]) for e in recorded
    ]
    for rec, now in zip(recorded, fresh):
        assert now["key"] == rec["key"], rec
        assert now["value"] == rec["value"], rec

    # 2. Recorded demo1 payload bytes still parse through the consumer.
    demo1 = [e for e in recorded if e["schema"] == "demo1_input"]
    raw = spark.createDataFrame(
        [(bytearray.fromhex(e["value"]),) for e in demo1], "value BINARY"
    )
    back = parse_click_messages(
        raw.select(F.col("value").cast("string").alias("value"))
    )
    got = sorted(
        (int(r["event_time"].timestamp()), r["user_id"], r["click"])
        for r in back.collect()
    )
    assert got == sorted(tuple(e["row"]) for e in demo1)


def test_publish_kafka_raises_clear_error_without_package(spark, tmp_path):
    from tutorial_apache_beam_spark.sources.readers import publish_kafka

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("value AS user_id", "timestamp AS ts")
    )
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        publish_kafka(
            stream, "broker:9092", "clicks", str(tmp_path / "ck"),
        )
