"""Partition retention — the reference's table-TTL as a maintenance job.

The reference's sink tables are day-partitioned with a 7-day expiry
enforced by BigQuery itself (deployment/modules/infra/google_bigquery.tf:
17-21, 35-39). Vanilla parquet has no built-in TTL, so the engine provides
it as an explicit maintenance operator over a `partitionBy(date)` layout:
drop whole partition directories older than the cutoff.

Deleting directories (not rows) keeps the job metadata-only — no data
files are read, which is the only retention strategy that works at 100 TB.
"""

from __future__ import annotations

import re
import shutil
from dataclasses import dataclass
from datetime import date, timedelta
from pathlib import Path

from pyspark.sql import SparkSession

# Only yyyy-MM-dd counts as an expirable date partition — exactly what
# `partitionBy(to_date(...))` writes and what Spark's partition
# inference types as DATE. Python 3.11's bare date.fromisoformat also
# accepts compact (20240101) and ISO week-date (2024-W01-1) spellings;
# Spark types those as INTEGER/STRING partitions, so an ungated parse
# would DELETE a non-date partition whose value merely looks like an
# old date to Python (same hazard class as the avro fallback's gated
# partition inference; differential-tested against live Spark in
# tests/test_retention_date_differential.py).
_ISO_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _partition_date(value: str) -> date | None:
    """The partition value as a date iff Spark's own layout would call it
    one; None (never expire) otherwise."""
    if not _ISO_DATE_RE.match(value):
        return None
    try:
        return date.fromisoformat(value)
    except ValueError:  # e.g. 2024-13-40: shape matches, not a date
        return None


@dataclass
class RetentionReport:
    kept: list[str]
    dropped: list[str]


def apply_retention(
    table_path: str,
    partition_col: str,
    keep_days: int,
    today: date,
    spark: SparkSession | None = None,
) -> RetentionReport:
    """Drop `<table>/<partition_col>=<date>` directories older than
    `today - keep_days`. Returns what was kept/dropped.

    `today` is explicit (no wall-clock reads) so runs are reproducible and
    testable. Partition values must be ISO dates — the layout produced by
    `df.write.partitionBy(to_date(...))`.

    Filesystem access goes through Hadoop's FileSystem API (the sink's
    convention) so retention works on ANY supported scheme — an earlier
    pathlib implementation silently no-op'd on hdfs:// / s3a:// tables,
    returning an empty "success" report while TTL was never enforced.
    `spark` defaults to the active session; the pathlib fallback is used
    only for local paths when no session exists, and a non-local path
    without a session raises instead of pretending.
    """
    cutoff = today - timedelta(days=keep_days)
    prefix = f"{partition_col}="
    kept: list[str] = []
    dropped: list[str] = []

    spark = spark or SparkSession.getActiveSession()
    if spark is not None:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path
        root = HPath(table_path)
        fs = root.getFileSystem(hconf)
        children = (
            sorted(fs.listStatus(root), key=lambda s: s.getPath().getName())
            if fs.exists(root)
            else []
        )
        for st in children:
            name = st.getPath().getName()
            if not st.isDirectory() or not name.startswith(prefix):
                continue
            value = name[len(prefix):]
            part_date = _partition_date(value)
            if part_date is None:
                kept.append(name)  # non-date partition: never expire
                continue
            if part_date < cutoff:
                fs.delete(st.getPath(), True)
                dropped.append(name)
            else:
                kept.append(name)
        return RetentionReport(kept=kept, dropped=dropped)

    if "://" in table_path and not table_path.startswith("file:"):
        raise ValueError(
            f"apply_retention on non-local path {table_path!r} requires "
            "an active SparkSession (Hadoop FileSystem access)"
        )
    root = Path(table_path)
    for child in sorted(root.iterdir()) if root.exists() else []:
        if not child.is_dir() or not child.name.startswith(prefix):
            continue
        value = child.name[len(prefix):]
        part_date = _partition_date(value)
        if part_date is None:
            kept.append(child.name)  # non-date partition: never expire
            continue
        if part_date < cutoff:
            shutil.rmtree(child)
            dropped.append(child.name)
        else:
            kept.append(child.name)
    return RetentionReport(kept=kept, dropped=dropped)


def refresh_after_retention(spark: SparkSession, table_path: str) -> None:
    """Invalidate cached file listings for THIS table after partition
    deletion: refreshByPath drops the path's FileIndex metadata and any
    cache entries built over it, so pre-existing DataFrames re-list
    instead of failing on deleted files — without evicting the session's
    unrelated caches (which clearCache() would, and which never touched
    file-listing metadata anyway)."""
    spark.catalog.refreshByPath(table_path)
