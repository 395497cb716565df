"""Regression: fixture loaders must work on a SparkSession they didn't build.

Round-1 driver failure mode: the correctness harness constructs its own
SparkSession without `spark.sql.legacy.parquet.nanosAsLong`, and every
`events` read died with PARQUET_TYPE_ILLEGAL before a single row moved.
These tests strip the conf from the live session (runtime-settable both
ways) and assert the loaders restore it themselves.
"""

from __future__ import annotations

import pytest

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.streaming.replay import (
    run_stream_to_memory,
    stream_events,
)

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def bare_conf_spark(spark):
    """The session with the nanos conf stripped, restored afterwards."""
    spark.conf.unset(NANOS_CONF)
    try:
        yield spark
    finally:
        spark.conf.set(NANOS_CONF, "true")


def test_load_events_without_preset_conf(bare_conf_spark):
    df = load_table(bare_conf_spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0


def test_load_other_table_untouched_by_guard(bare_conf_spark):
    # Non-events tables read fine regardless; the guard only targets events.
    df = load_table(bare_conf_spark, SF_DIR, "orders")
    assert df.count() > 0


def test_stream_events_without_preset_conf(bare_conf_spark):
    from pyspark.sql import functions as F

    src = stream_events(bare_conf_spark, SF_DIR)
    out = run_stream_to_memory(
        src.groupBy().agg(F.count("*").alias("n")),
        bare_conf_spark,
        output_mode="complete",
    )
    assert out.collect()[0]["n"] > 0
