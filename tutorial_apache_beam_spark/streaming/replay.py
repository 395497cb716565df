"""Deterministic streaming replay: drive a bounded source through a
streaming plan to completion (the engine's test/correctness harness).

`availableNow` + memory sink makes a streaming run deterministic: the
source exposes everything currently available, the query drains it in
micro-batches, then stops — so CI and the DuckDB correctness gate can
assert on streaming output exactly like batch output (SURVEY §5.2 item 2:
final streaming output == batch output, Beam's unified-model property).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

_counter = itertools.count()


def run_stream_to_memory(
    streaming_df: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    name: str | None = None,
) -> DataFrame:
    """Run a streaming plan to exhaustion into a memory sink; return the
    final result table as a (batch) DataFrame."""
    qname = name or f"replay_{next(_counter)}"
    query = (
        streaming_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(qname)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture `events` table as an unbounded source (file-stream
    replay of parquet — the batch/streaming unification seam).

    Schema must be declared up front for a streaming source; `ts` arrives
    as epoch-nanos long (nanosAsLong) and is converted exactly as the batch
    catalog does, so streaming and batch plans see identical input.
    """
    from pyspark.sql import functions as F

    schema = (
        "event_id BIGINT, ts BIGINT, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    )
    # The file source watches a directory; pathGlobFilter narrows it to the
    # events table inside the fixture dir.
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
