"""Source-partitioning contract for single-large-file replays (VERDICT
r8 #4): an availableNow file-stream scan parallelizes per file SPLIT
(ceil(bytes / maxPartitionBytes) tasks, bounded by parquet row groups),
so one big file under the default 128 MiB split reads with ONE task —
measured 7.12 vs 27.8 MiB/s at the 100x events fixture (SCALING.md).
`single_file_scan_scope` sizes the split for a target parallelism and
restores the conf on exit; these tests pin the math, the plan effect,
the restore guarantee, and that results are unchanged under the scope."""

from __future__ import annotations

import os

import pytest

from tutorial_apache_beam_spark.streaming.replay import (
    run_stream_to_memory,
    scan_split_bytes,
    single_file_scan_scope,
    stream_events,
)

# sf0.1, not the conftest sf0.001 default: the split test needs a file
# comfortably above the helper's 1 MiB floor (~2 MiB here).
SF_DIR = "/root/testdata/sf0.1"
EVENTS = f"{SF_DIR}/events.parquet"


def test_scan_split_bytes_math():
    path = EVENTS
    size = os.path.getsize(path)
    got = scan_split_bytes(path, 8)
    assert got == max(1 << 20, -(-size // 8))
    # Floor: never below 1 MiB even for tiny files / huge targets.
    assert scan_split_bytes(path, 10**9) == 1 << 20


def test_scope_splits_the_scan_and_restores_conf(spark):
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    size = os.path.getsize(EVENTS)
    target = 8
    # Only meaningful when the file is big enough that the 1 MiB floor
    # still yields multiple splits.
    assert size > (1 << 20), "fixture too small for a split test"
    with single_file_scan_scope(spark, EVENTS, target):
        n = spark.read.parquet(EVENTS).rdd.getNumPartitions()
        want = -(-size // scan_split_bytes(EVENTS, target))
        assert n == want and n > 1
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == prev

    # Restore guarantee on error too.
    with pytest.raises(RuntimeError, match="boom"):
        with single_file_scan_scope(spark, EVENTS, target):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == prev


def test_scope_defaults_to_default_parallelism(spark):
    with single_file_scan_scope(spark, EVENTS):
        got = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    assert got == scan_split_bytes(
        EVENTS, int(spark.sparkContext.defaultParallelism)
    )


def test_drain_rows_identical_under_scope(spark):
    """Splitting the scan changes parallelism, never results: the same
    availableNow drain row count with and without the scope."""
    import pyspark.sql.functions as F

    def drain():
        sdf = stream_events(spark, SF_DIR).groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        out = run_stream_to_memory(sdf, spark, output_mode="complete")
        return sorted(map(tuple, out.collect()))

    base = drain()
    with single_file_scan_scope(spark, EVENTS, 8):
        split = drain()
    assert split == base and len(base) > 0
