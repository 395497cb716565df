"""Bucketed-layout and compaction maintenance jobs (operators.maintenance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.operators.maintenance import (
    compact_partitions,
    write_bucketed,
)

from tests.conftest import SF_DIR


@pytest.fixture
def no_broadcast(spark):
    """Force shuffle-based join strategies so the bucketing effect is visible."""
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    """Two tables bucketed on the join key sort-merge-join with zero
    shuffle exchanges — the co-located-join contract that makes repeated
    fact⋈fact joins viable at 100 TB."""
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders",
        bucket_cols=["o_custkey"],
        num_buckets=4,
        sort_cols=["o_custkey"],
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        customer.select("c_custkey", "c_name"),
        "b_customer",
        bucket_cols=["c_custkey"],
        num_buckets=4,
        sort_cols=["c_custkey"],
        path=str(tmp_path / "b_customer"),
    )
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # And the result is the same as the plain (shuffling) join.
        expected = (
            orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path, no_broadcast):
    """Aggregation on the bucket key also needs no shuffle: rows for one
    key are already co-located in one bucket."""
    orders = load_table(spark, SF_DIR, "orders")
    write_bucketed(
        orders.select("o_custkey", "o_totalprice"),
        "b_orders_agg",
        bucket_cols=["o_custkey"],
        num_buckets=4,
        path=str(tmp_path / "b_orders_agg"),
    )
    try:
        agg = (
            spark.table("b_orders_agg")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("total"))
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
        assert agg.count() == orders.select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_agg")


def _file_counts(table_dir):
    return {
        d.name: len([f for f in d.iterdir() if f.name.endswith(".parquet")])
        for d in table_dir.iterdir()
        if d.is_dir() and "=" in d.name
    }


def test_compaction_rewrites_fragmented_partitions(spark, tmp_path):
    """A micro-batch-fragmented partitioned sink compacts to one file per
    partition, preserving content exactly; a second run is a no-op."""
    events = load_table(spark, SF_DIR, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    sink = tmp_path / "sink"
    # Simulate many tiny micro-batch appends: 6 writes of 3 files each.
    for i in range(6):
        (
            events.filter(F.col("event_id") % 6 == i)
            .repartition(3)
            .write.mode("append")
            .partitionBy("event_date")
            .parquet(str(sink))
        )
    before = _file_counts(sink)
    assert max(before.values()) >= 6, f"fixture not fragmented: {before}"
    total_before = spark.read.parquet(str(sink)).count()

    report = compact_partitions(spark, str(sink), target_file_bytes=1 << 30)
    after = _file_counts(sink)
    assert set(report.compacted) == set(before), report
    assert all(n == 1 for n in after.values()), after
    assert report.files_after < report.files_before

    # Content is intact (count + a value checksum).
    df = spark.read.parquet(str(sink))
    assert df.count() == total_before
    assert df.select(F.sum("event_id")).first()[0] == events.select(
        F.sum("event_id")
    ).first()[0]

    # Idempotent: second run touches nothing.
    report2 = compact_partitions(spark, str(sink), target_file_bytes=1 << 30)
    assert report2.compacted == []
    assert set(report2.skipped) == set(before)


def test_upsert_partitions_rewrites_only_touched(spark, tmp_path):
    """Keyed upsert: replaced key updated, new key added, untouched rows
    AND untouched partitions survive byte-identical (their files are not
    rewritten), and the initial write path works on an empty dir."""
    import os

    from tutorial_apache_beam_spark.operators.maintenance import (
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [
            ("2024-01-01", 1, "a"),
            ("2024-01-01", 2, "b"),
            ("2024-01-02", 3, "c"),
            ("2024-01-03", 4, "d"),
        ],
        "day STRING, k BIGINT, v STRING",
    )
    # initial create through the same API
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 3

    untouched_files = {
        e.name: os.path.getmtime(e.path)
        for e in os.scandir(os.path.join(tdir, "day=2024-01-03"))
        if e.name.endswith(".parquet")
    }

    updates = spark.createDataFrame(
        [
            ("2024-01-01", 2, "B2"),   # replace existing key
            ("2024-01-02", 9, "new"),  # new key in existing partition
            ("2024-01-04", 5, "e"),    # brand-new partition
        ],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, updates, tdir, "day", ["k"]) == 3

    # partition-column type inference reads day= back as DATE; compare
    # its canonical string form
    got = sorted(
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    )
    assert got == [
        ("2024-01-01", 1, "a"),
        ("2024-01-01", 2, "B2"),
        ("2024-01-02", 3, "c"),
        ("2024-01-02", 9, "new"),
        ("2024-01-03", 4, "d"),
        ("2024-01-04", 5, "e"),
    ]
    # dynamic overwrite left the untouched partition's files alone
    after = {
        e.name: os.path.getmtime(e.path)
        for e in os.scandir(os.path.join(tdir, "day=2024-01-03"))
        if e.name.endswith(".parquet")
    }
    assert after == untouched_files

    # no-op updates: zero partitions rewritten
    empty = spark.createDataFrame([], "day STRING, k BIGINT, v STRING")
    assert upsert_partitions(spark, empty, tdir, "day", ["k"]) == 0


def test_upsert_is_partition_scoped_not_key_global(spark, tmp_path):
    """ADVICE r4: an update key in touched partition P1 must NOT delete a
    same-key row living in another touched partition P2 — replacement is
    scoped to (key, partition). The stale-row caveat for moving keys is
    documented, not silently 'fixed' by cross-partition deletes."""
    from tutorial_apache_beam_spark.operators.maintenance import (
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("2024-01-01", 1, "p1-old"), ("2024-01-02", 1, "p2-old")],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 2

    # Touch BOTH partitions; replace key 1 only in P1.
    updates = spark.createDataFrame(
        [("2024-01-01", 1, "p1-new"), ("2024-01-02", 2, "p2-extra")],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, updates, tdir, "day", ["k"]) == 2
    got = sorted(
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    )
    assert got == [
        ("2024-01-01", 1, "p1-new"),
        ("2024-01-02", 1, "p2-old"),  # survived: same key, other partition
        ("2024-01-02", 2, "p2-extra"),
    ]


def test_upsert_moving_key_tombstone_recovery_e2e(spark, tmp_path):
    """VERDICT r5 item 7: exercise the documented moving-key contract end
    to end. A key that moves partitions leaves a stale duplicate in its
    old partition (shown), and shipping a tombstone via `delete_keys`
    repairs it — including the emptied-partition sweep and idempotent
    re-ship."""
    from tutorial_apache_beam_spark.operators.maintenance import (
        delete_keys,
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("2024-01-01", 1, "v1"), ("2024-01-01", 2, "other")],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 1

    # Key 1 "moves" to 2024-01-02: the upsert touches only the new
    # partition, so the old row is left behind as a stale duplicate.
    moved = spark.createDataFrame(
        [("2024-01-02", 1, "v2")], "day STRING, k BIGINT, v STRING"
    )
    assert upsert_partitions(spark, moved, tdir, "day", ["k"]) == 1
    rows = sorted(
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    )
    assert rows == [
        ("2024-01-01", 1, "v1"),  # STALE: documented hazard, pre-repair
        ("2024-01-01", 2, "other"),
        ("2024-01-02", 1, "v2"),
    ]

    # Repair: ship the tombstone for (old partition, key).
    tomb = spark.createDataFrame(
        [("2024-01-01", 1)], "day STRING, k BIGINT"
    )
    assert delete_keys(spark, tomb, tdir, "day", ["k"]) == 1
    rows = sorted(
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    )
    assert rows == [("2024-01-01", 2, "other"), ("2024-01-02", 1, "v2")]

    # Idempotent re-ship converges (no-op on an absent key).
    assert delete_keys(spark, tomb, tdir, "day", ["k"]) == 1
    assert spark.read.parquet(tdir).count() == 2

    # Tombstoning a partition's LAST row sweeps the emptied directory so
    # dynamic overwrite can't resurrect stale files.
    tomb2 = spark.createDataFrame(
        [("2024-01-01", 2)], "day STRING, k BIGINT"
    )
    assert delete_keys(spark, tomb2, tdir, "day", ["k"]) == 1
    import os

    assert not os.path.isdir(os.path.join(tdir, "day=2024-01-01"))
    rows = sorted(
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    )
    assert rows == [("2024-01-02", 1, "v2")]

    # Empty tombstone frame and absent table are clean no-ops.
    empty = spark.createDataFrame([], "day STRING, k BIGINT")
    assert delete_keys(spark, empty, tdir, "day", ["k"]) == 0
    assert (
        delete_keys(spark, tomb, str(tmp_path / "nope"), "day", ["k"]) == 0
    )


def test_delete_keys_sweeps_hive_escaped_partition_values(spark, tmp_path):
    """Review r6: Spark Hive-escapes special characters in partition
    directory names ('a b:c' -> 'day=a b%3Ac'); the emptied-partition
    sweep must find those via the REAL directory listing, not by
    reconstructing the name from the raw value."""
    import os

    from tutorial_apache_beam_spark.operators.maintenance import (
        delete_keys,
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a b:c", 1, "v1"), ("plain", 2, "v2")],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 2
    # The escaped directory actually exists (guards the fixture itself).
    assert os.path.isdir(os.path.join(tdir, "day=a b%3Ac"))

    tomb = spark.createDataFrame([("a b:c", 1)], "day STRING, k BIGINT")
    assert delete_keys(spark, tomb, tdir, "day", ["k"]) == 1
    assert not os.path.isdir(os.path.join(tdir, "day=a b%3Ac"))
    rows = [
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    ]
    assert rows == [("plain", 2, "v2")]


def test_upsert_partition_probe_is_capped(spark, tmp_path):
    """VERDICT r4 item 7: the touched-partition collect is guarded like
    the union-find edge probe — a width cap (limit-probe, never a full
    count) and a byte budget for pathologically wide partition values."""
    import pytest

    from tutorial_apache_beam_spark.operators.maintenance import (
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    wide = spark.createDataFrame(
        [(f"day-{i}", i, "v") for i in range(6)],
        "day STRING, k BIGINT, v STRING",
    )
    with pytest.raises(ValueError, match="more than 4 distinct"):
        upsert_partitions(
            spark, wide, tdir, "day", ["k"], max_touched_partitions=4
        )

    fat = spark.createDataFrame(
        [("x" * 4096, 1, "v"), ("y" * 4096, 2, "v")],
        "day STRING, k BIGINT, v STRING",
    )
    with pytest.raises(ValueError, match="byte"):
        upsert_partitions(
            spark, fat, tdir, "day", ["k"], touched_byte_budget=1024
        )
    # nothing was written by either refused call
    import os

    assert not os.path.isdir(tdir)


def test_compaction_partition_filter_protects_open_partitions(spark, tmp_path):
    """The exactly-once/compaction interaction guard (r5): a
    partition_filter scopes the job to closed partitions — filtered-out
    dirs are reported skipped and their files stay byte-identical (a
    replayed batch there can still self-replace by bid prefix)."""
    import os

    from tutorial_apache_beam_spark.operators.maintenance import (
        compact_partitions,
    )

    tdir = tmp_path / "tbl"
    df = spark.createDataFrame(
        [(d, i, "v") for d in ("2024-01-01", "2024-01-02") for i in range(8)],
        "day STRING, k BIGINT, v STRING",
    )
    # fragment both partitions: 8 files each
    df.repartition(8).write.partitionBy("day").parquet(str(tdir))

    open_part = "day=2024-01-02"
    before = {
        e.name: os.path.getmtime(e.path)
        for e in os.scandir(tdir / open_part)
        if e.name.endswith(".parquet")
    }
    report = compact_partitions(
        spark,
        str(tdir),
        partition_filter=lambda p: p < open_part,  # only the closed day
    )
    assert "day=2024-01-01" in report.compacted
    assert open_part in report.skipped
    after = {
        e.name: os.path.getmtime(e.path)
        for e in os.scandir(tdir / open_part)
        if e.name.endswith(".parquet")
    }
    assert after == before  # untouched, not just "not merged"
    # table content survives intact
    assert spark.read.parquet(str(tdir)).count() == 16


def test_delete_keys_sweep_survives_tombstone_type_divergence(spark, tmp_path):
    """Review r6 (live-verified bug): a tombstone whose partition column
    TYPE diverges from the table's (double 1.0 vs bigint 1) still joins
    via implicit cast and empties the partition — but a sweep set built
    from the TOMBSTONE's string form ('1.0') misses the real directory
    name ('day=1'), leaving the old files behind so the deleted rows
    resurrect. Both sweep sets must derive from the table-side column."""
    import os

    from tutorial_apache_beam_spark.operators.maintenance import (
        delete_keys,
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 10, "v1"), (2, 20, "v2")],
        "day BIGINT, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 2
    assert os.path.isdir(os.path.join(tdir, "day=1"))

    # Tombstone built with a float partition value (e.g. via pandas
    # float64): str form '1.0' != directory value '1'.
    tomb = spark.createDataFrame([(1.0, 10)], "day DOUBLE, k BIGINT")
    assert delete_keys(spark, tomb, tdir, "day", ["k"]) == 1
    # The emptied partition's directory must be swept...
    assert not os.path.isdir(os.path.join(tdir, "day=1"))
    # ...so the deleted row cannot resurrect.
    rows = [
        (r["day"], r["k"], r["v"]) for r in spark.read.parquet(tdir).collect()
    ]
    assert rows == [(2, 20, "v2")]


def test_upsert_aligns_divergent_partition_type(spark, tmp_path):
    """Review r6 follow-up (live-verified sibling of the delete_keys
    sweep bug): updates whose partition column type diverges from the
    table's (double 1.0 vs bigint 1) used to widen through unionByName
    and write a NEW 'day=1.0' directory next to 'day=1' — the replaced
    row then survived alongside its replacement. Lossless casts are now
    aligned to the table's type; lossy ones raise."""
    import os

    import pytest

    from tutorial_apache_beam_spark.operators.maintenance import (
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 10, "v1"), (2, 20, "v2")],
        "day BIGINT, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 2

    upd = spark.createDataFrame(
        [(1.0, 10, "v1b")], "day DOUBLE, k BIGINT, v STRING"
    )
    assert upsert_partitions(spark, upd, tdir, "day", ["k"]) == 1
    # ONE directory per logical partition, and the old row is replaced.
    dirs = sorted(d for d in os.listdir(tdir) if d.startswith("day="))
    assert dirs == ["day=1", "day=2"]
    rows = sorted(
        (r["day"], r["k"], r["v"]) for r in spark.read.parquet(tdir).collect()
    )
    assert rows == [(1, 10, "v1b"), (2, 20, "v2")]

    # A lossy partition value (1.5 would truncate into day=1) raises
    # instead of silently misplacing the row.
    bad = spark.createDataFrame(
        [(1.5, 11, "x")], "day DOUBLE, k BIGINT, v STRING"
    )
    with pytest.raises(ValueError, match="losslessly"):
        upsert_partitions(spark, bad, tdir, "day", ["k"])


def test_maintenance_ops_work_on_file_scheme_uris(spark, tmp_path):
    """r6: every filesystem touch in upsert/delete goes through Hadoop's
    FileSystem API — an os.path implementation reported "no table" for
    any URI scheme, making upsert skip its anti-join merge (data loss:
    untouched same-partition rows replaced by just the updates) and
    delete_keys a silent no-op. `file:` is the scheme this sandbox can
    exercise; the code path is scheme-generic."""
    from tutorial_apache_beam_spark.operators.maintenance import (
        delete_keys,
        upsert_partitions,
    )

    import os

    turi = f"file:{tmp_path}/tbl"
    base = spark.createDataFrame(
        [(1, 10, "keep"), (1, 11, "replace"), (2, 20, "other")],
        "day BIGINT, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, turi, "day", ["k"]) == 2
    upd = spark.createDataFrame([(1, 11, "new")], "day BIGINT, k BIGINT, v STRING")
    assert upsert_partitions(spark, upd, turi, "day", ["k"]) == 1
    rows = sorted(
        (r["day"], r["k"], r["v"]) for r in spark.read.parquet(turi).collect()
    )
    # The merge ran: the untouched same-partition row survives.
    assert rows == [(1, 10, "keep"), (1, 11, "new"), (2, 20, "other")]

    tomb = spark.createDataFrame([(2, 20)], "day BIGINT, k BIGINT")
    assert delete_keys(spark, tomb, turi, "day", ["k"]) == 1
    spark.catalog.clearCache()
    rows = sorted(
        (r["day"], r["k"], r["v"]) for r in spark.read.parquet(turi).collect()
    )
    assert rows == [(1, 10, "keep"), (1, 11, "new")]
    # The emptied day=2 directory was swept (Hadoop-FS sweep).
    assert sorted(
        d for d in os.listdir(tmp_path / "tbl") if d.startswith("day=")
    ) == ["day=1"]


def test_compaction_refuses_object_store_paths(spark):
    """r6: compaction's atomicity is a rename guarantee; on an object
    store the swap is copy+delete and can crash half-done — and the old
    pathlib listing silently reported an empty success. Refuse loudly."""
    with pytest.raises(ValueError, match="non-local"):
        compact_partitions(spark, "s3a://bucket/tbl")


def test_upsert_preserves_null_partition_rows(spark, tmp_path):
    """ADVICE r6: a NULL partition value is a real partition
    (__HIVE_DEFAULT_PARTITION__). `isin(touched)` never matches NULL, so
    the pre-fix upsert read no existing rows for it yet dynamic overwrite
    still replaced the directory with updates-only rows — silently
    dropping every existing non-updated NULL-partition row. The anti-join
    must also be null-safe on the partition column, or the replaced key's
    old row survives as a stale duplicate."""
    from tutorial_apache_beam_spark.operators.maintenance import (
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [
            (None, 1, "null-keep"),
            (None, 2, "null-old"),
            ("2024-01-01", 3, "dated"),
        ],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 2

    updates = spark.createDataFrame(
        [(None, 2, "null-NEW"), (None, 9, "null-ins")],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, updates, tdir, "day", ["k"]) == 1

    got = sorted(
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    )
    assert got == [
        ("2024-01-01", 3, "dated"),
        ("None", 1, "null-keep"),  # existing non-updated NULL row survives
        ("None", 2, "null-NEW"),   # replaced exactly once (null-safe join)
        ("None", 9, "null-ins"),
    ]


def test_delete_keys_deletes_and_sweeps_null_partition(spark, tmp_path):
    """ADVICE r6 (delete half): tombstones carrying a NULL partition value
    must actually delete the NULL-partition rows, and an emptied NULL
    partition's __HIVE_DEFAULT_PARTITION__ directory must be swept like
    any other (None casts to SQL NULL, not the magic dir string)."""
    import os

    from tutorial_apache_beam_spark.operators.maintenance import (
        delete_keys,
        upsert_partitions,
    )

    tdir = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(None, 1, "a"), (None, 2, "b"), ("2024-01-01", 3, "c")],
        "day STRING, k BIGINT, v STRING",
    )
    assert upsert_partitions(spark, base, tdir, "day", ["k"]) == 2

    # Delete one of two NULL-partition rows: row gone, directory stays.
    tomb = spark.createDataFrame([(None, 2)], "day STRING, k BIGINT")
    assert delete_keys(spark, tomb, tdir, "day", ["k"]) == 1
    spark.catalog.clearCache()
    got = sorted(
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    )
    assert got == [("2024-01-01", 3, "c"), ("None", 1, "a")]

    # Delete the last NULL-partition row: directory swept.
    tomb2 = spark.createDataFrame([(None, 1)], "day STRING, k BIGINT")
    assert delete_keys(spark, tomb2, tdir, "day", ["k"]) == 1
    spark.catalog.clearCache()
    assert sorted(
        d for d in os.listdir(tmp_path / "tbl") if d.startswith("day=")
    ) == ["day=2024-01-01"]
    got2 = [
        (str(r["day"]), r["k"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    ]
    assert got2 == [("2024-01-01", 3, "c")]
