"""Differential test: retention's expirable-date gate vs live Spark's
partition inference (VERDICT r8 #8 — the pattern that found the Avro
partition-inference and Hive-escaping deviations applies to every
surface that re-implements a Spark behavior in Python).

The hazard class: `apply_retention` decides from a directory NAME
whether a partition is an expired DATE and deletes it recursively.
Python 3.11's bare `date.fromisoformat` accepts spellings Spark types
as INTEGER/STRING partitions — compact `20240101`, ISO week-dates
`2024-W01-1` — so the ungated parse this test was written against would
have deleted a non-date partition whose value merely looks like an old
date to Python. Retention may only expire what Spark itself would call
a DATE.

Direction of safety: retention-expirable must be a SUBSET of
Spark-infers-DATE; any future deviation in the keep direction would be
allow-listed (keeping data is safe, deleting it is not). Measured live:
the strict yyyy-MM-dd gate agrees with Spark's inference on every case
below — even unpadded `2024-1-1` is a STRING to Spark (its inference
does not go through java.sql.Date.valueOf's lenient parse), so
KEEP_DEVIATIONS is currently empty.
"""

from __future__ import annotations

from datetime import date

import pytest

from tutorial_apache_beam_spark.operators.retention import (
    _partition_date,
    apply_retention,
)

# (value, expirable) — expirable means retention MAY delete it when old.
CASES = [
    ("2024-01-01", True),   # the layout partitionBy(to_date(...)) writes
    ("0001-01-01", True),
    ("2024-13-40", False),  # shape matches, not a calendar date
    ("20240101", False),    # 3.11 fromisoformat accepts; Spark: INTEGER
    ("2024-W01-1", False),  # ISO week-date; Spark: STRING
    ("2024W011", False),
    ("2024-1-1", False),    # unpadded — measured live: Spark infers
                            # STRING too (inference is stricter than
                            # java.sql.Date.valueOf)
    ("2024-01-01T00:00:00", False),  # timestamp partition, not a date
    ("2024-001", False),
    ("99999999", False),
    ("__HIVE_DEFAULT_PARTITION__", False),
    ("abc", False),
]

# Spellings where live Spark infers DATE but retention refuses to expire
# — the safe direction. Currently empty: the strict gate measured equal
# to Spark's inference on every case.
KEEP_DEVIATIONS: set[str] = set()


def test_gate_unit_table():
    for value, expirable in CASES:
        got = _partition_date(value)
        assert (got is not None) == expirable, (value, got)
    assert _partition_date("2024-01-01") == date(2024, 1, 1)


@pytest.mark.parametrize("value,expirable", CASES)
def test_expirable_iff_spark_infers_date(spark, tmp_path, value, expirable):
    # Each value gets its OWN table: partition inference unifies types
    # across sibling directories, which would mask per-value behavior.
    tbl = tmp_path / "tbl"
    safe = value.replace(":", "%3A")  # the one Hive-escaped char here
    spark.range(1).write.parquet(f"{tbl}/day={safe}")
    inferred = dict(spark.read.parquet(str(tbl)).dtypes)["day"]
    if expirable:
        assert inferred == "date", f"{value}: retention would delete a {inferred} partition"
    elif value in KEEP_DEVIATIONS:
        assert inferred == "date"  # pin that the deviation is real
    else:
        assert inferred != "date", (
            f"{value}: Spark now infers date; retention keeps it (safe) — "
            "move to KEEP_DEVIATIONS if intended"
        )


def test_retention_keeps_lookalike_partitions_end_to_end(spark, tmp_path):
    """The bug this gate prevents, end to end: a table holding a real old
    date partition AND an integer partition that 3.11's fromisoformat
    parses as an older date. Retention must drop only the real date."""
    tbl = tmp_path / "tbl"
    for v in ("2024-01-01", "20230101", "2024-W01-1"):
        spark.range(1).write.parquet(f"{tbl}/day={v}")
    report = apply_retention(
        str(tbl), "day", keep_days=7, today=date(2025, 6, 1), spark=spark
    )
    assert report.dropped == ["day=2024-01-01"]
    assert sorted(report.kept) == ["day=20230101", "day=2024-W01-1"]
    assert (tbl / "day=20230101").exists()
    assert (tbl / "day=2024-W01-1").exists()
