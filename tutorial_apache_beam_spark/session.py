"""SparkSession construction with scale-aware defaults.

Local mode is the test harness; the same config set is what we would ship on
a 1000-executor cluster (AQE, skew-join handling, partition-size-targeted
coalescing, pushdown-friendly parquet options). Nothing here is
local-specific except the master URL and shuffle-partition count, both
overridable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At cluster scale, shuffle partitions should target ~128-200 MB per task
# post-AQE; locally we match the core count so tiny SF data doesn't get
# over-parallelized. AQE coalescing makes the static number a ceiling, not a
# tuning knob, so a large static value + AQE is the scale-safe choice.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tutorial_apache_beam_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults chosen for correctness-vs-DuckDB comparability (UTC session
    timezone, ANSI off for permissive casts) and for scale (AQE on with
    partition coalescing + skew-join splitting; Arrow for the Pandas-UDF
    escape hatch; nanosecond parquet timestamps read as longs so the
    catalog can convert them losslessly).
    """
    # Python workers (mapInPandas / pandas_udf) un-pickle closures that
    # reference this package; make sure they can import it no matter where
    # the driver process was launched from. Must happen before the JVM
    # starts — workers inherit PYTHONPATH from it.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{existing}" if existing else repo_root
        )
    # Same before-the-JVM constraint for the protobuf runtime: the
    # state-v2 (transformWithState) "driver worker" is a separate Python
    # process that gets NO addPyFile includes — only the JVM's inherited
    # PYTHONPATH reaches it, so the vendored shim must be on it now.
    from tutorial_apache_beam_spark.protoshim import ensure_protobuf_runtime

    try:
        ensure_protobuf_runtime()
    except ImportError:  # pragma: no cover - vendored shim always imports
        pass

    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        # AQE: runtime re-planning — coalesce small post-shuffle partitions,
        # split skewed ones, convert to broadcast joins when a side turns out
        # small. This is the core of "survives a 100x scale-up".
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for every Python<->JVM crossing (pandas_udf,
        # applyInPandas, toPandas) — the only acceptable Python path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Fixture `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark
        # refuses by default; read as long and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Let the planner pick a shuffled-hash join when its size
        # conditions hold (guide §9 baseline; r13 measured: the seven
        # join-heavy relational gates run ~10-15% faster at sf0.1,
        # sign-consistent across interleaved rounds). Scale-safe by
        # construction: the planner only chooses SHJ when plan stats
        # bound the build side per partition (canBuildLocalHashMap),
        # falling back to sort-merge otherwise, and AQE skew splitting
        # still applies. Override: SPARK_GRAFT_PREFER_SMJ=true restores
        # the Spark default.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # Push filterless MIN/MAX/COUNT down to parquet footer statistics
        # (off by default): a full-table COUNT(*) at 100 TB becomes a
        # footer sweep instead of a data scan. Catalyst only applies it
        # when semantics are exact (no filters, no partial groupings).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
