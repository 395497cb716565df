"""GroupIntoBatches (streaming/batching.py): Beam state+timer parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tutorial_apache_beam_spark.streaming.batching import group_into_batches
from tutorial_apache_beam_spark.streaming.replay import (
    run_stream_to_memory,
    stream_events,
)

from tests.conftest import SF_DIR


def test_group_into_batches_invariants(spark):
    """Every element lands in exactly one batch; only a key's last batch may
    be partial; batch_seq is contiguous from 0 per key."""
    sdf = stream_events(spark, SF_DIR).withWatermark("ts", "1 minute")
    out = run_stream_to_memory(
        group_into_batches(sdf, batch_size=64), spark, output_mode="append"
    ).cache()

    n_input = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    # Exactly-once batching: total batched == input, no element twice.
    assert out.agg(F.sum("batch_size")).first()[0] == n_input
    dup = (
        out.select(F.explode("element_ids").alias("e"))
        .groupBy("e")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0

    # batch_size column matches the actual array, and only the
    # highest-seq batch of a key may be smaller than 64.
    assert out.filter(F.size("element_ids") != F.col("batch_size")).count() == 0
    last_seq = (
        out.groupBy("user_id")
        .agg(F.max("batch_seq").alias("last"))
        .select(F.col("user_id").alias("k"), "last")
    )
    non_last = out.join(
        last_seq,
        (F.col("user_id") == F.col("k")) & (F.col("batch_seq") == F.col("last")),
        "left_anti",
    )
    assert non_last.filter(F.col("batch_size") != 64).count() == 0

    # Contiguous sequence numbers: max_seq + 1 == number of batches.
    per_key = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("batch_seq").alias("mx")
    )
    assert per_key.filter(F.col("mx") + 1 != F.col("n")).count() == 0
