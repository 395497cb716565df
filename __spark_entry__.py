"""Driver contract for the spark-graft builder (PySpark target).

Thin delegator into `tutorial_apache_beam_spark.registry`, which collects
one (queries, oracle_sql) pair per implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tutorial_apache_beam_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Demo2-equivalent per-user per-minute click counts."""
    from tutorial_apache_beam_spark.queries.demo import demo2_tumbling_counts

    return demo2_tumbling_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
