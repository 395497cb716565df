"""Fixture-table catalog: schema-checked parquet loading.

The driver fixtures (`/root/testdata/sf*/`) are a TPC-H-ish star schema plus
an `events` stream table and LLM-extension tables (`documents`,
`embeddings`). This module is the single place the engine touches paths, so
every query sees identical, type-normalized inputs.

Scale note: `spark.read.parquet` gives vectorized columnar scans with
predicate pushdown and column pruning for free; at 100 TB the same loader
works unchanged — partition pruning comes from directory layout, and
`spark.sql.files.maxPartitionBytes` controls split sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize whichever physical `ts` form the fixture shipped
    (epoch-nanos BIGINT under nanosAsLong, or TIMESTAMP_NTZ) to plain
    TimestampType. The ONE conversion shared by the batch catalog and
    the streaming replay source (streaming/replay.stream_events), so the
    two paths can never silently diverge on input types."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing types.

    `events.ts` has shipped in two physical forms across fixture
    generations: parquet INT64 TIMESTAMP(NANOS) (arrives as epoch-nanos
    long under `spark.sql.legacy.parquet.nanosAsLong=true`; µs-granular, so
    `ts div 1000` in 64-bit integer arithmetic is lossless) and naive
    TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ). Both are normalized to
    TimestampType — the session TZ is pinned to UTC, so the NTZ→TZ cast is
    an identity on values and every downstream plan sees the type it was
    verified with.
    """
    if name == "events":
        # Self-sufficient: the conf is runtime-settable, and a harness-owned
        # SparkSession (e.g. the driver's correctness gate) won't have it.
        # Without it a NANOS-form fixture fails with PARQUET_TYPE_ILLEGAL
        # before any row is touched; harmless for the MICROS form.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all fixture tables present under `sf_dir`."""
    return {
        name: load_table(spark, sf_dir, name)
        for name in TABLES
        if os.path.exists(f"{sf_dir}/{name}.parquet")
    }


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load and register every fixture table as a temp view (for spark.sql)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
