"""Sink-table maintenance: bucketed layouts and small-file compaction.

Two operational jobs the reference delegates to BigQuery (clustered tables,
automatic storage optimization — `deployment/modules/infra/google_bigquery.tf`)
but a parquet/warehouse engine must provide itself:

- **Bucketed tables** (`write_bucketed`): pre-shuffle a table once at write
  time into N buckets on its join/agg key. Every later equi-join or groupBy
  on that key between same-bucketed tables runs with ZERO exchange — the
  single biggest shuffle eliminator for repeated fact⋈fact joins at 100 TB.
  Spark persists bucket metadata in the catalog, so this must go through
  `saveAsTable`, not a bare path write.

- **Compaction** (`compact_partitions`): streaming append sinks (SURVEY K1)
  emit one file per micro-batch per partition; at scale a table rots into
  millions of KB-sized files and every scan drowns in open() calls and
  listing RPCs. Compaction rewrites each date partition into
  ceil(bytes / target_file_bytes) files. It processes partitions as a unit
  (atomic swap per partition dir) so readers never see a half-compacted
  partition, and skips partitions already at target shape.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# One size heuristic for every driver-probe guard in the engine — a fix
# to the estimate must not silently diverge between the graph and upsert
# probes.
from tutorial_apache_beam_spark.operators.graph import (
    _row_bytes as _partition_value_bytes,
)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) catalog table.

    `num_buckets` is a layout contract, not a tuning knob: both sides of a
    co-located join must share it (Spark 3.1+ can coalesce mismatched
    bucket counts when one divides the other, but identical is the fast
    path). Size it so one bucket of the LARGEST table using the layout is
    ~128-256 MB — at 100 TB that means thousands of buckets, which is fine:
    buckets are files, not tasks, and AQE coalesces small reads.

    Sorting within buckets (`sort_cols`) additionally enables sort-merge
    joins with no per-task sort.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)  # external table location
    writer.saveAsTable(table)


@dataclass
class CompactionReport:
    compacted: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    files_before: int = 0
    files_after: int = 0


def _data_files(part_dir: Path) -> list[Path]:
    return [
        p
        for p in part_dir.iterdir()
        if p.is_file() and p.name.endswith(".parquet") and not p.name.startswith(("_", "."))
    ]


def compact_partitions(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    partition_filter: "callable | None" = None,
) -> CompactionReport:
    """Rewrite each `<col>=<value>` partition of a parquet table into
    ceil(partition_bytes / target_file_bytes) files.

    Partition-at-a-time with a write-to-temp-then-swap: the rewrite lands in
    a sibling temp dir and replaces the partition dir only after success, so
    a crash mid-job leaves every partition either old or new, never mixed.
    Partitions already at/below the target file count are skipped — the job
    is safe to run on a schedule, costing only a directory listing when
    there is nothing to do.

    At cluster scale the same loop runs with cloud-storage renames; the
    per-partition unit keeps the job restartable and the listing cost
    bounded (one partition's files in memory at a time, never the table's).

    INTERACTION WITH THE EXACTLY-ONCE SINK (operational rule): the
    sink's crash recovery self-replaces a replayed batch by deleting its
    `bid<id>-` files before re-adding them. Compaction REWRITES files
    into merged `part-` names, so a batch compacted away can no longer
    self-delete — a subsequent replay of that batch would duplicate its
    rows. Safe schedule: compact only partitions the streaming sink has
    finished writing — pass `partition_filter` (dir name → bool, e.g.
    ``lambda p: p < f"event_date={watermark_day}"``) to scope the job to
    closed partitions; filtered-out partitions are reported as skipped
    and their files are never touched. The retention job is safe either
    way — a replay into a dropped partition is re-dropped by the next
    run.
    """
    if "://" in table_path and not table_path.startswith("file:"):
        # The temp-write-then-double-rename swap below is atomic only on
        # filesystems with real directory renames (local, HDFS). Object
        # stores emulate rename as copy+delete — a crash mid-"swap" CAN
        # leave a mixed or missing partition, voiding the one guarantee
        # this job makes, so refuse loudly instead of silently no-op'ing
        # (Path.exists() is false for s3a:// and would report an empty
        # "success"). At cluster scale on object storage, compaction
        # belongs to a transactional table format's rewrite (Delta
        # OPTIMIZE / Iceberg rewrite_data_files).
        raise ValueError(
            f"compact_partitions on non-local path {table_path!r}: the "
            "atomic partition swap requires rename semantics (local/HDFS "
            "paths); use a transactional table format's compaction on "
            "object stores"
        )
    root = Path(table_path.removeprefix("file:"))
    report = CompactionReport()
    part_dirs = [
        d for d in sorted(root.iterdir()) if d.is_dir() and "=" in d.name
    ] if root.exists() else []
    for part_dir in part_dirs:
        files = _data_files(part_dir)
        report.files_before += len(files)
        if partition_filter is not None and not partition_filter(
            part_dir.name
        ):
            report.skipped.append(part_dir.name)
            report.files_after += len(files)
            continue
        part_bytes = sum(f.stat().st_size for f in files)
        want = max(1, math.ceil(part_bytes / target_file_bytes))
        if len(files) < min_files_to_compact or len(files) <= want:
            report.skipped.append(part_dir.name)
            report.files_after += len(files)
            continue
        tmp = root / f"_compact_{part_dir.name}_{uuid.uuid4().hex[:8]}"
        (
            spark.read.parquet(str(part_dir))
            .repartition(want)
            .write.mode("overwrite")
            .parquet(str(tmp))
        )
        # Swap: move new data files into place of the old partition dir.
        swap = part_dir.with_name(part_dir.name + ".old")
        os.rename(part_dir, swap)
        os.rename(tmp, part_dir)
        # Drop the _SUCCESS marker (partition dirs of a partitioned table
        # hold only data files) and the old data.
        marker = part_dir / "_SUCCESS"
        if marker.exists():
            marker.unlink()
        shutil.rmtree(swap)
        report.compacted.append(part_dir.name)
        report.files_after += len(_data_files(part_dir))
    return report




def _probe_touched_partitions(
    df: DataFrame,
    partition_col: str,
    max_touched_partitions: int,
    touched_byte_budget: int,
    what: str,
) -> list:
    """The guarded driver probe both incremental-maintenance ops share
    (a fix to the guard logic must not silently diverge between them —
    same rationale as the module-header note on the byte heuristic):
    collect at most max+1 DISTINCT partition values, enforce the width
    cap and the byte budget, return the touched values."""
    probe = (
        df.select(partition_col)
        .distinct()
        .limit(max_touched_partitions + 1)
        .collect()
    )
    if len(probe) > max_touched_partitions:
        raise ValueError(
            f"{what} touch more than {max_touched_partitions} distinct "
            f"{partition_col!r} partitions; incremental maintenance at "
            "that width rewrites most of the table anyway — use a plain "
            "partitioned overwrite/rewrite, or raise "
            "max_touched_partitions explicitly"
        )
    touched = [r[0] for r in probe]
    est_bytes = sum(_partition_value_bytes(v) for v in touched)
    if est_bytes > touched_byte_budget:
        raise ValueError(
            f"touched-partition values estimate {est_bytes} bytes on the "
            f"driver, over the {touched_byte_budget}-byte budget — "
            "partition values this wide should not be collected; raise "
            "touched_byte_budget only if the driver is sized for it"
        )
    return touched


# Directory name Spark/Hive gives the NULL partition. A NULL partition
# VALUE is a real, writable partition — the maintenance ops must treat it
# as one, not let it fall through null-propagating predicates.
_HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _touched_filter(partition_col: str, touched: list):
    """Row predicate for "partition value is in `touched`", NULL-correct.

    A plain `col.isin(touched)` evaluates to NULL (→ row dropped) for
    every NULL partition value, so when `touched` contains None the read
    silently excluded the __HIVE_DEFAULT_PARTITION__ rows: upsert then
    dynamic-overwrote that directory with updates-only rows (dropping
    every existing non-updated row), and delete_keys never saw the rows
    it was shipped tombstones for. NULL membership has to be an explicit
    isNull() branch, not a list element.
    """
    from pyspark.sql import functions as F

    non_null = [v for v in touched if v is not None]
    pred = (
        F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    )
    if len(non_null) != len(touched):
        pred = pred | F.col(partition_col).isNull()
    return pred


def _keyed_anti_join(
    existing: DataFrame,
    keyed: DataFrame,
    join_keys: list[str],
    partition_col: str,
) -> DataFrame:
    """existing LEFT ANTI JOIN keyed on `join_keys`, with NULL-SAFE
    equality on the partition column only. A NULL partition value names a
    real partition (__HIVE_DEFAULT_PARTITION__), so an update/tombstone
    carrying NULL must match the existing NULL-partition rows — plain
    `=` never matches NULL, and the old row would survive as a stale
    duplicate (upsert) or silently escape deletion (delete_keys). NULLs
    in the KEY columns keep SQL MERGE semantics: no match, so a NULL-key
    update inserts and a NULL-key tombstone deletes nothing."""
    import functools
    import operator

    from pyspark.sql import functions as F

    left, right = existing.alias("__ex"), keyed.alias("__up")
    cond = functools.reduce(
        operator.and_,
        [
            F.col(f"__ex.{c}").eqNullSafe(F.col(f"__up.{c}"))
            if c == partition_col
            else F.col(f"__ex.{c}") == F.col(f"__up.{c}")
            for c in join_keys
        ],
    )
    return left.join(right, on=cond, how="left_anti")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path` via Hadoop's API — the same
    any-scheme access retention uses. Every filesystem touch in the
    incremental-maintenance ops goes through this: an os.path/scandir
    implementation silently reported "no table" on hdfs:// / s3a://
    paths, which made `upsert_partitions` skip the anti-join merge
    (replacing whole partitions with just the updates — data loss) and
    made `delete_keys` a silent no-op, exactly the bug class the
    retention rewrite fixed for local-only TTL."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _partition_dir_names(
    spark: SparkSession, table_dir: str, partition_col: str
) -> list[str]:
    """Names of `<partition_col>=...` child directories, any scheme."""
    fs, root = _hadoop_fs(spark, table_dir)
    if not fs.exists(root):
        return []
    prefix = f"{partition_col}="
    return [
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    ]


def _has_partitioned_table(
    spark: SparkSession, table_dir: str, partition_col: str
) -> bool:
    return bool(_partition_dir_names(spark, table_dir, partition_col))


class _dynamic_overwrite:
    """Context manager: set partitionOverwriteMode=dynamic, restore the
    previous value (or unset) on exit — shared by both maintenance ops."""

    _KEY = "spark.sql.sources.partitionOverwriteMode"

    def __init__(self, spark: SparkSession):
        self._spark = spark

    def __enter__(self):
        self._old = self._spark.conf.get(self._KEY, None)
        self._spark.conf.set(self._KEY, "dynamic")

    def __exit__(self, *exc):
        if self._old is None:
            self._spark.conf.unset(self._KEY)
        else:
            self._spark.conf.set(self._KEY, self._old)
        return False


def upsert_partitions(
    spark: SparkSession,
    updates: DataFrame,
    table_dir: str,
    partition_col: str,
    key_cols: list[str],
    max_touched_partitions: int = 10_000,
    touched_byte_budget: int = 64 * 1024 * 1024,
) -> int:
    """Keyed upsert into a partitioned parquet table, rewriting ONLY the
    partitions the updates touch (the MERGE-INTO shape BigQuery gives the
    reference for free, rebuilt on dynamic partition overwrite).

    Semantics — PARTITION-SCOPED replacement: within each touched
    partition, an update row replaces any existing row with the same
    (key, partition) pair; all other existing rows survive — including a
    same-key row sitting in a DIFFERENT partition, touched or not. A key
    that "moves" partitions therefore leaves its old row behind as a
    stale duplicate; true key-global MERGE semantics would require
    scanning every partition of the table, which is exactly the cost
    this pruned incremental upsert exists to avoid. Callers with moving
    keys must ship a delete/tombstone for the old partition
    (`delete_keys` below is that ship) or run a periodic global dedup.
    Returns the number of partitions rewritten.

    Scale design: the only driver-side materialization is the DISTINCT
    set of touched partition VALUES — and that probe is guarded the same
    way as graph.connected_components' edge probe: a limit-probe counts
    at most `max_touched_partitions`+1 values (never the full set), and
    the collected values' estimated bytes must fit
    `touched_byte_budget`; breaching either raises instead of silently
    OOMing the driver (an updates batch touching >10k partitions is a
    backfill, which should use a plain partitioned overwrite, not an
    upsert). Existing data is read with a partition-pruned filter
    (`.explain` shows PartitionFilters); the write uses Spark's dynamic
    partitionOverwriteMode so untouched partitions' files are left in
    place. Not transactional across partitions — a failed job can leave
    some partitions updated and others not (each partition swap itself
    is atomic in the committer); idempotent re-run converges, the same
    recovery contract as the checkpointed streaming sink.
    """
    touched = _probe_touched_partitions(
        updates, partition_col, max_touched_partitions,
        touched_byte_budget, "updates",
    )
    if not touched:
        return 0
    if _has_partitioned_table(spark, table_dir, partition_col):
        from pyspark.sql import functions as F

        existing = spark.read.parquet(table_dir).filter(
            _touched_filter(partition_col, touched)
        )
        # Partition values DETERMINE directory names, so the updates'
        # partition column must be in the TABLE's type before the union:
        # a divergent type (double 1.0 vs the table's bigint 1) would
        # widen through unionByName and write a NEW 'day=1.0' directory
        # NEXT TO 'day=1' — dynamic overwrite then replaces neither, and
        # the "replaced" row survives alongside its replacement
        # (verified live). Lossy casts (string 'x' -> null, double 1.5
        # -> bigint 1) would silently misplace rows, so they raise.
        table_pc_type = existing.schema[partition_col].dataType
        if updates.schema[partition_col].dataType != table_pc_type:
            aligned = F.col(partition_col).cast(table_pc_type)
            lossy = updates.filter(
                F.col(partition_col).isNotNull()
                & (
                    aligned.isNull()
                    | (
                        aligned.cast(
                            updates.schema[partition_col].dataType
                        )
                        != F.col(partition_col)
                    )
                )
            )
            if lossy.limit(1).count():
                raise ValueError(
                    f"upsert_partitions: updates' {partition_col!r} type "
                    f"({updates.schema[partition_col].dataType.simpleString()}) "
                    "does not losslessly cast to the table's partition "
                    f"type ({table_pc_type.simpleString()}); cast the "
                    "updates frame explicitly"
                )
            updates = updates.withColumn(partition_col, aligned)
        # Anti-join on (key, partition): keep existing rows not replaced
        # by an update IN THE SAME PARTITION — see the semantics note.
        join_keys = (
            key_cols
            if partition_col in key_cols
            else [*key_cols, partition_col]
        )
        survivors = _keyed_anti_join(
            existing,
            updates.select(*join_keys).distinct(),
            join_keys,
            partition_col,
        )
        merged = survivors.select(*updates.columns).unionByName(updates)
    else:
        merged = updates

    with _dynamic_overwrite(spark):
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_dir)
        )
    return len(touched)


def delete_keys(
    spark: SparkSession,
    tombstones: DataFrame,
    table_dir: str,
    partition_col: str,
    key_cols: list[str],
    max_touched_partitions: int = 10_000,
    touched_byte_budget: int = 64 * 1024 * 1024,
) -> int:
    """Partition-pruned keyed DELETE — the tombstone-ship half of the
    moving-key contract `upsert_partitions` documents: a key that moved
    partitions leaves a stale row in its OLD partition; shipping a
    tombstone (partition_col, *key_cols) here removes exactly that row
    while rewriting only the partitions the tombstones touch.

    `tombstones` needs only the partition + key columns (extra columns
    are ignored). Same scale guards as the upsert (shared helpers —
    `_probe_touched_partitions`, `_dynamic_overwrite`): the only driver
    materialization is the limit-probed, byte-budgeted DISTINCT set of
    touched partition values; the rewrite uses dynamic partition
    overwrite so untouched partitions' files are never listed or moved.
    Deleting a key absent from a touched partition is a no-op (idempotent
    re-ship converges — same recovery contract as the upsert). Returns
    the number of partitions rewritten.

    Emptied-table contract: tombstoning a table's LAST rows leaves a
    data-less table_dir, which a plain `spark.read.parquet` cannot infer
    a schema from — the same end state `apply_retention` produces when
    every partition expires. Directory-backed tables have no catalog
    metadata to survive zero data; readers of a maybe-emptied table must
    guard (as the maintenance ops themselves do via the partition-dir
    check) or keep schema in an external catalog.
    """
    from pyspark.sql import functions as F

    touched = _probe_touched_partitions(
        tombstones, partition_col, max_touched_partitions,
        touched_byte_budget, "tombstones",
    )
    if not touched:
        return 0
    if not _has_partitioned_table(spark, table_dir, partition_col):
        return 0
    join_keys = (
        key_cols if partition_col in key_cols else [*key_cols, partition_col]
    )
    touched_table = spark.read.parquet(table_dir).filter(
        _touched_filter(partition_col, touched)
    )
    survivors = _keyed_anti_join(
        touched_table,
        tombstones.select(*join_keys).distinct(),
        join_keys,
        partition_col,
    ).persist()
    # A partition whose every row is tombstoned yields rows in no output
    # partition — dynamic overwrite would then leave its old files in
    # place. Real engines solve this with deletion vectors/metadata; here
    # the kept-partition set (bounded by `touched`, so driver-safe) is
    # computed BEFORE the write mutates the table, and emptied partitions
    # are swept after the commit. BOTH sweep sets (kept AND touched_strs)
    # derive from the TABLE-side typed column cast to Spark's string
    # form: the table read may infer a typed partition column (DATE,
    # BOOLEAN, ...) while the tombstone frame carries a divergent type
    # that still JOINS via implicit cast (double 1.0 vs bigint 1, string
    # 'True' vs boolean) — a tombstone-derived string ('1.0') would then
    # miss the real directory name ('day=1') and silently leave the
    # emptied partition's old files behind, resurrecting deleted rows.
    # (survivors is persisted: the kept collect and the overwrite below
    # would otherwise each run the touched-partition scan + anti-join.)
    # (None → the Hive default-partition directory name: a NULL value
    # casts to SQL NULL, not to the magic string the directory carries,
    # so without the mapping an emptied NULL partition's files would
    # survive the sweep and resurrect the deleted rows.)
    kept = {
        r[0] if r[0] is not None else _HIVE_DEFAULT_PARTITION
        for r in survivors.select(
            F.col(partition_col).cast("string")
        ).distinct().collect()
    }
    touched_strs = {
        r[0] if r[0] is not None else _HIVE_DEFAULT_PARTITION
        for r in touched_table.select(F.col(partition_col).cast("string"))
        .distinct()
        .collect()
    }
    with _dynamic_overwrite(spark):
        (
            survivors.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(table_dir)
        )
        # Sweep by LISTING the real partition directories and unescaping
        # their values (Spark Hive-escapes special characters in
        # partition paths, e.g. ':' -> '%3A' — reconstructing the dir
        # name from the raw value would miss those and silently leave
        # the stale partition behind). Hadoop FS, like every other
        # filesystem touch here, so the sweep works on any scheme.
        # (The listed Path objects are deleted directly — re-building a
        # Path from an escaped name string would URI-unescape it and
        # target a directory that doesn't exist.)
        from urllib.parse import unquote

        prefix = f"{partition_col}="
        fs, root = _hadoop_fs(spark, table_dir)
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not st.isDirectory() or not name.startswith(prefix):
                continue
            val_str = unquote(name[len(prefix):])
            if val_str in touched_strs and val_str not in kept:
                fs.delete(st.getPath(), True)
    survivors.unpersist()
    return len(touched)
