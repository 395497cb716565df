"""Shared pytest fixtures: one SparkSession + a DuckDB oracle comparator."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tutorial_apache_beam_spark import get_spark
from tutorial_apache_beam_spark.catalog import TABLES
from tutorial_apache_beam_spark.protoshim import ensure_protobuf_runtime

# Activate the vendored protobuf runtime (if the real wheel is absent)
# BEFORE any fixture launches the JVM, so Python workers inherit the
# PYTHONPATH and the state-v2 (transformWithState) e2e tests can run.
try:
    PROTOBUF_RUNTIME = ensure_protobuf_runtime()
except ImportError:  # pragma: no cover - shim should always import
    PROTOBUF_RUNTIME = None

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(
        app_name="engine-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for order-insensitive comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if hasattr(v, "isoformat"):  # datetime/date — tz-naive text
        return v.isoformat(sep=" ") if hasattr(v, "hour") else v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return repr(v)


def rows_to_multiset(cols, rows):
    """(sorted-cols, sorted normalized row tuples) — driver-style compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, duck_con, sql, check_names=True):
    """Row-count + column-name + order-insensitive value comparison."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    if check_names:
        assert sorted(s_cols) == sorted(d_cols), (
            f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
        )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    )
    s_set = rows_to_multiset(s_cols, s_rows)
    d_set = rows_to_multiset(d_cols, d_rows)
    if s_set != d_set:
        diff_s = [r for r in s_set if r not in d_set][:5]
        diff_d = [r for r in d_set if r not in s_set][:5]
        raise AssertionError(
            f"value mismatch; spark-only={diff_s} duck-only={diff_d}"
        )
