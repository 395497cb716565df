"""Batch sink writers (SURVEY K1/K2 breadth): every columnar/text format
Spark ships natively, one writer surface.

The reference's only sink is a BigQuery table append (Demo1.java:96-105,
Demo2.java:170-182); the engine-scope equivalents are the file-format
sinks here (partitioned parquet being the BigQuery-analog default) plus
the bucketed table writer in operators/maintenance.py.

Scale notes: `partition_by` columns become directory partitions — choose
low-cardinality keys (date, not user id) so the file count stays sane;
writers never coalesce by default (parallel writes at shuffle width), and
a caller that needs fewer output files should repartition on the
partition columns first so each partition directory gets contiguous
writers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "orc", "json", "csv", "avro")


def _avro_jar_missing(fmt: str, ex: Exception) -> bool:
    """Avro is the one native format Spark ships as an EXTERNAL module
    (spark-avro); detect exactly its classpath failure (option typos,
    path errors, etc. must propagate untouched)."""
    return fmt == "avro" and "Failed to find data source" in str(ex)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write `df` to `path` in any native format (parquet/orc/json/csv,
    plus avro — via the spark-avro module when on the classpath, else
    the pure-Python fallback for flat schemas; see avro_fallback.py).

    CSV gets a header by default (schema-first on read-back — never
    inferSchema in production, it is a full extra pass).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    try:
        writer.save(path)
    except Exception as ex:  # pragma: no branch
        if not _avro_jar_missing(fmt, ex):
            raise
        # No spark-avro on the classpath: fall back to the clean-room
        # pure-Python container writer (sources/avro_fallback.py — flat
        # primitive schemas, local paths, distributed one-file-per-
        # partition, Hive `col=value` layout for partition_by). Anything
        # outside its subset raises THERE with the jar remediation, so
        # nothing is silently mis-written.
        from tutorial_apache_beam_spark.sources.avro_fallback import (
            write_avro_fallback,
        )

        write_avro_fallback(df, path, mode=mode, partition_by=partition_by)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Read `path` back in any native format. Text formats (json/csv)
    REQUIRE `schema` — their files carry no types, and inferSchema is a
    banned extra pass. Columnar formats (parquet/orc) carry their own.

    This is the format-PARAMETRIC roundtrip reader paired with
    `write_table`; the primary per-format read surface (and the place the
    schema-first policy is defined) is `sources/readers.py` — keep the
    two consistent when the policy changes."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt!r}")
    if fmt in ("json", "csv") and schema is None:
        raise ValueError(f"{fmt} read-back requires an explicit schema")
    # parquet/orc/avro carry their own schema
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load(path)
    except Exception as ex:  # pragma: no branch
        if not _avro_jar_missing(fmt, ex):
            raise
        from tutorial_apache_beam_spark.sources.avro_fallback import (
            read_avro_fallback,
        )

        return read_avro_fallback(spark, path)
