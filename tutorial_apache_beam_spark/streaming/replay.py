"""Deterministic streaming replay: drive a bounded source through a
streaming plan to completion (the engine's test/correctness harness).

`availableNow` + memory sink makes a streaming run deterministic: the
source exposes everything currently available, the query drains it in
micro-batches, then stops — so CI and the DuckDB correctness gate can
assert on streaming output exactly like batch output (SURVEY §5.2 item 2:
final streaming output == batch output, Beam's unified-model property).
"""

from __future__ import annotations

import contextlib
import itertools
import os

from pyspark.sql import DataFrame, SparkSession

_counter = itertools.count()

# Parquet footer schemas per source path (fixtures are immutable).
_SCHEMA_CACHE: dict[str, object] = {}

# State-store partition count for replay runs. A streaming aggregation/join
# runs one state-store task per shuffle partition PER MICRO-BATCH, and the
# count is frozen into the checkpoint at first start — so it must be sized
# to the job's load, not inherited from the batch default. The fixture
# replays are MiB-scale, where 32 partitions is pure fixed overhead
# (measured 3-4x slower than 8 at sf0.1); a production job at cluster scale
# should instead set this to 2-3x total executor cores BEFORE first start
# (resizing later means a new checkpoint). Override: SPARK_GRAFT_STREAM_PARTITIONS.
STREAM_STATE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))


def run_stream_to_memory(
    streaming_df: DataFrame,
    spark: SparkSession,
    output_mode: str = "complete",
    name: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a streaming plan to exhaustion into a memory sink; return the
    final result table as a (batch) DataFrame.

    `state_partitions` (default STREAM_STATE_PARTITIONS) temporarily sets
    spark.sql.shuffle.partitions while the query runs: each fresh memory
    sink gets a fresh checkpoint, so the stream's state layout is sized here
    without touching the session's batch default.
    """
    qname = name or f"replay_{next(_counter)}"
    parts = STREAM_STATE_PARTITIONS if state_partitions is None else state_partitions
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    query = None
    try:
        query = (
            streaming_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    except BaseException:
        # Same guard as run_streams_to_memory: an interrupted
        # awaitTermination must not leave the query draining into the
        # session (and its sink rows growing) forever.
        if query is not None:
            try:
                query.stop()
            except Exception:
                pass
            try:
                spark.catalog.dropTempView(qname)
            except Exception:
                pass
        raise
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(qname)


def run_streams_to_memory(
    plans: list[tuple[DataFrame, str]],
    spark: SparkSession,
    state_partitions: int | None = None,
) -> list[DataFrame]:
    """Drain several independent streaming plans CONCURRENTLY into memory
    sinks; return their result tables in order.

    Structured Streaming runs each query on its own micro-batch thread,
    so independent availableNow drains overlap instead of paying their
    ~1 s fixed startup (checkpoint init, file listing) serially — a
    multi-mode/multi-join gate drains in max() rather than sum() of its
    members. Queries are all STARTED before any is awaited; the
    shuffle-partition override is applied for the whole start window
    (each query captures the conf at its own start).
    """
    parts = STREAM_STATE_PARTITIONS if state_partitions is None else state_partitions
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    names, queries = [], []
    try:
        for streaming_df, output_mode in plans:
            qname = f"replay_{next(_counter)}"
            names.append(qname)
            queries.append(
                streaming_df.writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(qname)
                .trigger(availableNow=True)
                .start()
            )
        for q in queries:
            q.awaitTermination()
    except BaseException:
        # A failed .start() or awaitTermination() must not leak the
        # already-running sibling queries (and their memory-sink tables)
        # into the session.
        for q in queries:
            try:
                q.stop()
            except Exception:
                pass
        for n in names:
            # q.stop() only terminates the query — the partially-drained
            # memory-sink temp view would stay registered (and pinned in
            # driver memory) without an explicit drop.
            try:
                spark.catalog.dropTempView(n)
            except Exception:
                pass
        raise
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return [spark.table(n) for n in names]


def stream_events(
    spark: SparkSession, sf_dir: str, glob: str = "events.parquet"
) -> DataFrame:
    """The fixture `events` table as an unbounded source (file-stream
    replay of parquet — the batch/streaming unification seam).

    Schema must be declared up front for a streaming source; it is taken
    from a footer-only batch read of the same file so the replay adapts to
    whichever physical form the fixture generation used (epoch-nanos long
    or naive TIMESTAMP(MICROS)), and `ts` is normalized to TimestampType
    exactly as the batch catalog does — streaming and batch plans see
    identical input.
    """
    # Same self-sufficiency guard as catalog.load_table: the file-stream
    # source hits the same PARQUET_TYPE_ILLEGAL on a NANOS-form fixture if
    # the session wasn't built by session.get_spark.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # Footer-only read: discovers the fixture's physical schema without
    # scanning data. Cached per source path — fixtures are immutable, and
    # replay-heavy gates build several streams over the same files.
    cache_key = f"{sf_dir}/{glob}"
    schema = _SCHEMA_CACHE.get(cache_key)
    if schema is None:
        schema = spark.read.parquet(cache_key).schema
        _SCHEMA_CACHE[cache_key] = schema
    # The file source watches a directory; pathGlobFilter narrows it to the
    # events table inside the fixture dir.
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(sf_dir)
    )
    from tutorial_apache_beam_spark.catalog import normalize_events_ts

    return normalize_events_ts(raw)


# ---------------------------------------------------------------------------
# Source-partitioning contract for file replays
# ---------------------------------------------------------------------------
#
# An availableNow file-stream scan parallelizes per FILE SPLIT:
# ceil(file_bytes / spark.sql.files.maxPartitionBytes) tasks per file,
# each bounded below by parquet row-group boundaries. The default 128 MiB
# therefore reads ONE ~116 MiB file with ONE task — measured at the 100x
# events fixture as 7.12 MiB/s vs 27.8 MiB/s for the same bytes in 100
# files (SCALING.md "Stateful streaming at 100x"). In production the
# source's own partitioning (Kafka topic partitions — the reference
# provisions capacity PER partition, main.tf:31-38) provides the fan-out;
# a single-large-file replay must provide it via the split size instead.


def scan_split_bytes(path: str, target_partitions: int) -> int:
    """The spark.sql.files.maxPartitionBytes value that splits `path`
    into ~target_partitions scan tasks (>= 1 MiB: below that, per-split
    scheduling overhead beats the parallelism on local disks; actual
    split count is capped by the file's parquet row-group count)."""
    size = os.path.getsize(path)
    return max(1 << 20, -(-size // target_partitions))


@contextlib.contextmanager
def single_file_scan_scope(
    spark: SparkSession, path: str, target_partitions: int | None = None
):
    """Scope spark.sql.files.maxPartitionBytes so a drain over one large
    file scans in parallel, restoring the conf on exit (the engine's
    operator-owned conf-scope convention — see
    operators/dedup._join_expansion_scope). Wrap the WHOLE drain
    (start through awaitTermination): the file source re-plans its scan
    per micro-batch, reading the conf live.
    """
    if target_partitions is None:
        target_partitions = int(spark.sparkContext.defaultParallelism)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes",
        str(scan_split_bytes(path, target_partitions)),
    )
    try:
        yield
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
