"""Source/sink surface: CSV and JSON batch readers (schema-first), the
partitioned parquet append sink with partition pruning, and the
foreachBatch idempotent-append pattern (SURVEY K1/K2)."""

from __future__ import annotations

import contextlib
import io
import json

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tutorial_apache_beam_spark.catalog import load_table


def _events(spark, n=200):
    return load_table(spark, SF_DIR, "events").limit(n)


def test_csv_roundtrip_schema_first(spark, tmp_path):
    ev = _events(spark).select("event_id", "user_id", "event_type", "value")
    path = str(tmp_path / "csv")
    ev.write.option("header", True).csv(path)
    back = spark.read.schema(
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).option("header", True).csv(path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_json_roundtrip_schema_first(spark, tmp_path):
    ev = _events(spark).select("event_id", "event_type", "props")
    path = str(tmp_path / "json")
    ev.write.json(path)
    back = spark.read.schema("event_id BIGINT, event_type STRING, props STRING").json(
        path
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, ev.collect()))


def test_partitioned_sink_prunes_partitions(spark, tmp_path):
    """Day-partitioned append table (the reference's BigQuery
    time_partitioning analog, K2): a date-filtered read must scan only the
    matching partition directories."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "dt", F.to_date("ts")
    )
    path = str(tmp_path / "by_day")
    ev.write.partitionBy("dt").parquet(path)

    back = spark.read.parquet(path)
    one_day = back.filter(F.col("dt") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    plan = buf.getvalue()
    # Partition pruning shows up as a partition filter on dt, and the row
    # count must match the unpartitioned filter.
    assert "PartitionFilters" in plan and "dt" in plan
    expected = ev.filter(F.col("dt") == "2024-01-05").count()
    assert one_day.count() == expected


def test_foreachbatch_idempotent_append(spark, tmp_path):
    """foreachBatch + overwrite-by-batch-id directory = an idempotent sink:
    re-processing a batch replaces rather than duplicates (the engine's
    answer to the reference's per-insert retry policy, K1)."""
    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    (src / "a.json").write_text(
        "\n".join(json.dumps({"v": i}) for i in range(10)) + "\n"
    )

    def write_batch(batch_df, batch_id):
        # Partition the sink by batch id and overwrite that partition:
        # replaying batch N is a no-op-equivalent, not a duplication.
        batch_df.withColumn("_batch", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{out}/batch={batch_id}")

    def run():
        q = (
            spark.readStream.schema("v BIGINT")
            .json(str(src))
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = spark.read.parquet(f"{out}/batch=0").count()
    # Simulate a redelivery: re-write batch 0 (as a retried task would)
    # and confirm the overwrite keeps it exact, not duplicated.
    # (Materialized first — overwriting a path being read is invalid.)
    rows = spark.read.parquet(f"{out}/batch=0").drop("_batch").collect()
    replay = spark.createDataFrame(rows, "v BIGINT")
    write_batch(replay, 0)
    assert spark.read.parquet(f"{out}/batch=0").count() == first == 10


def test_retention_sessionless_fallback_and_nonlocal_guard(
    spark, tmp_path, monkeypatch
):
    """r6: retention went through Hadoop's FileSystem API so TTL works on
    any scheme. The two non-Hadoop branches need pinning too: with no
    active session a LOCAL path falls back to pathlib (same report), and
    a non-local path raises instead of silently no-op'ing (the original
    bug this rewrite fixed)."""
    from datetime import date

    import pytest
    from pyspark.sql import SparkSession

    from tutorial_apache_beam_spark.operators import retention as ret

    root = tmp_path / "tbl"
    for name in ("dt=2024-01-01", "dt=2024-01-20", "dt=oddball"):
        (root / name).mkdir(parents=True)
        (root / name / "part-0.parquet").write_bytes(b"x")

    monkeypatch.setattr(
        SparkSession, "getActiveSession", staticmethod(lambda: None)
    )
    report = ret.apply_retention(
        str(root), "dt", keep_days=7, today=date(2024, 1, 21)
    )
    assert report.dropped == ["dt=2024-01-01"]
    assert sorted(report.kept) == ["dt=2024-01-20", "dt=oddball"]
    assert not (root / "dt=2024-01-01").exists()

    with pytest.raises(ValueError, match="requires"):
        ret.apply_retention(
            "s3a://bucket/tbl", "dt", keep_days=7, today=date(2024, 1, 21)
        )


def test_retention_drops_old_partitions(spark, tmp_path):
    from datetime import date

    from tutorial_apache_beam_spark.operators.retention import apply_retention

    ev = load_table(spark, SF_DIR, "events").withColumn("dt", F.to_date("ts"))
    path = str(tmp_path / "by_day")
    ev.write.partitionBy("dt").parquet(path)
    before = spark.read.parquet(path).select("dt").distinct().count()

    # Fixture dates span 2024-01-01..2024-01-30; keep the last 7 days.
    report = apply_retention(path, "dt", keep_days=7, today=date(2024, 1, 31))
    assert len(report.dropped) > 0
    assert len(report.kept) + len(report.dropped) == before

    spark.catalog.clearCache()
    after = spark.read.parquet(path)
    assert after.select("dt").distinct().count() == len(report.kept)
    assert after.agg(F.min("dt")).collect()[0][0] >= date(2024, 1, 24)


def _delete_last_commit_marker(ckpt):
    """Remove the newest checkpoint commit marker AND its Hadoop
    ChecksumFileSystem shadow (`.N.crc`) — leaving the orphan CRC behind
    makes the restarted query's own commit rename fail."""
    commits = sorted(
        (p for p in (ckpt / "commits").iterdir() if not p.name.startswith(".")),
        key=lambda p: int(p.name),
    )
    last = commits[-1]
    crc = last.parent / f".{last.name}.crc"
    last.unlink()
    if crc.exists():
        crc.unlink()


def _drain_write_parquet(spark, src, out, ckpt, exactly_once, files_per_trigger=1):
    from tutorial_apache_beam_spark.plans.pipeline import (
        Pipeline,
        WriteParquet,
    )

    rows = (
        spark.readStream.schema("v BIGINT")
        .option("maxFilesPerTrigger", files_per_trigger)
        .json(str(src))
    )
    p = Pipeline(spark)
    p.create(rows).apply(
        "Sink",
        WriteParquet(
            str(out),
            checkpoint=str(ckpt),
            available_now=True,
            exactly_once=exactly_once,
        ),
    )
    p.run().wait_until_finish()


def test_write_parquet_exactly_once_after_mid_drain_crash(spark, tmp_path):
    """Crash-recovery for the checkpointed WriteParquet sink (K1): kill
    the drain in the worst window — the batch's table files are written
    but its checkpoint commit marker is not — then restart from the same
    checkpoint and require exactly-once output.

    The crash window is reproduced faithfully rather than by luck:
    deleting `commits/<last>` from the checkpoint leaves offsets/<last>
    in place, which is byte-for-byte the on-disk state a crash between
    the foreachBatch return and the epoch commit leaves behind; on
    restart Spark re-executes that batch from its pinned offsets."""
    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    for b in range(3):  # one file per micro-batch via maxFilesPerTrigger=1
        (src / f"f{b}.json").write_text(
            "\n".join(
                json.dumps({"v": v}) for v in range(b * 100, b * 100 + 100)
            )
            + "\n"
        )

    _drain_write_parquet(spark, src, out, ckpt, exactly_once=True)
    assert spark.read.parquet(str(out)).count() == 300

    # Simulate the crash: last batch's data landed, commit marker lost.
    _delete_last_commit_marker(ckpt)

    _drain_write_parquet(spark, src, out, ckpt, exactly_once=True)
    spark.catalog.clearCache()
    result = spark.read.parquet(str(out))
    assert result.count() == 300  # replayed batch replaced, not appended
    assert result.groupBy("v").count().filter("count > 1").count() == 0
    assert sorted(r["v"] for r in result.collect()) == list(range(300))


def test_write_parquet_default_append_duplicates_in_crash_window(
    spark, tmp_path
):
    """The default (at-least-once) sink DOES duplicate in that same crash
    window — documenting why the exactly_once grade exists and proving
    the crash simulation actually exercises the window."""
    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    for b in range(2):
        (src / f"f{b}.json").write_text(
            "\n".join(
                json.dumps({"v": v}) for v in range(b * 10, b * 10 + 10)
            )
            + "\n"
        )

    _drain_write_parquet(spark, src, out, ckpt, exactly_once=False)
    _delete_last_commit_marker(ckpt)
    _drain_write_parquet(spark, src, out, ckpt, exactly_once=False)
    assert spark.read.parquet(str(out)).count() == 30  # 10 duplicated


def test_write_parquet_exactly_once_partitioned(spark, tmp_path):
    """exactly_once + partition_by: staged partition subdirs survive the
    rename, the table stays partition-discoverable, and a replayed batch
    self-replaces inside its partitions."""
    from tutorial_apache_beam_spark.plans.pipeline import (
        Pipeline,
        WriteParquet,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    (src / "a.json").write_text(
        "\n".join(json.dumps({"v": i, "g": i % 2}) for i in range(20)) + "\n"
    )

    def run():
        rows = spark.readStream.schema("v BIGINT, g BIGINT").json(str(src))
        p = Pipeline(spark)
        p.create(rows).apply(
            "Sink",
            WriteParquet(
                str(out),
                checkpoint=str(ckpt),
                partition_by=["g"],
                available_now=True,
                exactly_once=True,
            ),
        )
        p.run().wait_until_finish()

    run()
    first = spark.read.parquet(str(out))
    assert first.count() == 20
    assert sorted(first.select("g").distinct().toPandas()["g"]) == [0, 1]

    _delete_last_commit_marker(ckpt)
    run()
    spark.catalog.clearCache()
    again = spark.read.parquet(str(out))
    assert again.count() == 20
    assert again.groupBy("v").count().filter("count > 1").count() == 0


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """A restarted query resumes from its checkpoint: the second run
    processes only files that arrived after the first, and the sink holds
    every record exactly once (K1's exactly-once across restarts — the
    engine's replacement for the reference's per-insert retry policy)."""
    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run():
        q = (
            spark.readStream.schema("v BIGINT")
            .json(str(src))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src / "a.json").write_text(
        "\n".join(json.dumps({"v": i}) for i in range(100)) + "\n"
    )
    run()
    assert spark.read.parquet(str(out)).count() == 100

    # Restart with the same checkpoint after new data lands: only the new
    # file is read — a.json is NOT reprocessed, so no duplicates.
    (src / "b.json").write_text(
        "\n".join(json.dumps({"v": i}) for i in range(100, 150)) + "\n"
    )
    run()
    result = spark.read.parquet(str(out))
    assert result.count() == 150
    assert result.groupBy("v").count().filter("count > 1").count() == 0


def test_commit_batch_exactly_once_converges_from_partial_attempt(
    spark, tmp_path
):
    """Drive _commit_batch_exactly_once directly through its worst
    on-disk states (r5, marker-aware since r6): after clean commits of
    batches 1, 2 and 20, the table is polluted with what a crash
    mid-replay of the LATEST batch (20 — the only batch structured
    streaming ever replays: its `_eo-attempt-20` marker is still on
    disk) leaves behind — a half-renamed duplicate file under the
    batch's bid prefix AND a leftover _staging dir with divergent
    content. Replaying the batch must converge to exactly batches
    1 ∪ 2 ∪ 20. The digit-prefix hazard (bid2- must never match bid20-
    files) is exercised by simulating batch 2 as the uncommitted-latest
    (touching its marker) and replaying it against a bid2- duplicate."""
    import shutil

    from tutorial_apache_beam_spark.plans.pipeline import (
        _commit_batch_exactly_once,
    )

    expected = (
        list(range(0, 10)) + list(range(100, 110)) + list(range(2000, 2010))
    )
    out = tmp_path / "tbl"
    b1 = spark.range(0, 10).withColumnRenamed("id", "v")
    b2 = spark.range(100, 110).withColumnRenamed("id", "v")
    _commit_batch_exactly_once(b1, 1, str(out), None)
    _commit_batch_exactly_once(b2, 2, str(out), None)
    b20 = spark.range(2000, 2010).withColumnRenamed("id", "v")
    _commit_batch_exactly_once(b20, 20, str(out), None)
    assert spark.read.parquet(str(out)).count() == 30
    # Only the latest batch's attempt marker survives (older batches'
    # epochs are committed and can never replay).
    assert [p.name for p in out.iterdir() if p.name.startswith("_eo-")] == [
        "_eo-attempt-20"
    ]

    # pollute: duplicate one bid20- file (half-renamed prior attempt with
    # a different task split) + leftover staging with divergent rows
    bid20 = [p for p in out.iterdir() if p.name.startswith("bid20-")]
    assert bid20
    shutil.copy(bid20[0], out / ("bid20-" + "deadbeef-" + bid20[0].name[6:]))
    dup_rows = spark.read.parquet(str(bid20[0])).count()
    assert dup_rows > 0
    staging = out / "_staging-20"
    spark.range(5000, 5003).withColumnRenamed("id", "v").write.mode(
        "overwrite"
    ).parquet(str(staging))
    # the polluted table over-counts batch 20 (readers exclude _staging)
    assert spark.read.parquet(str(out)).count() == 30 + dup_rows

    _commit_batch_exactly_once(b20, 20, str(out), None)
    spark.catalog.clearCache()
    vals = sorted(r["v"] for r in spark.read.parquet(str(out)).collect())
    assert vals == expected
    assert not any(p.name.startswith("_staging") for p in out.iterdir())

    # Digit-prefix hazard: replay batch 2 (simulate it being the
    # uncommitted-latest by restoring its marker) against a stale bid2-
    # duplicate — bid20- files must survive untouched.
    (out / "_eo-attempt-2").touch()
    bid2 = [p for p in out.iterdir() if p.name.startswith("bid2-")]
    assert bid2
    shutil.copy(bid2[0], out / ("bid2-" + "deadbeef-" + bid2[0].name[5:]))
    _commit_batch_exactly_once(b2, 2, str(out), None)
    spark.catalog.clearCache()
    vals = sorted(r["v"] for r in spark.read.parquet(str(out)).collect())
    assert vals == expected
    # A replay without a marker (an already-committed epoch — outside
    # streaming's replay window, which only ever re-runs the LATEST
    # uncommitted batch) skips the sweep: the stale duplicate survives
    # and the re-rename lands a second copy of the batch — documenting
    # the contract boundary the marker scheme trades for O(1) commits.
    bid2 = [p for p in out.iterdir() if p.name.startswith("bid2-")]
    dup2 = out / ("bid2-" + "cafebabe-" + bid2[0].name[5:])
    shutil.copy(bid2[0], dup2)
    dup2_rows = spark.read.parquet(str(dup2)).count()
    for p in out.iterdir():
        if p.name.startswith("_eo-attempt-"):
            p.unlink()
    _commit_batch_exactly_once(b2, 2, str(out), None)
    spark.catalog.clearCache()
    assert (
        spark.read.parquet(str(out)).count()
        == len(expected) + dup2_rows + 10
    )


def test_write_parquet_exactly_once_mid_commit_crash_windows(spark, tmp_path):
    """Kill the exactly-once foreachBatch writer INSIDE the commit
    protocol — not merely after it returned (the existing crash test's
    window) — at every named point: after staging, after the attempt
    marker + stale sweep, after a strict SUBSET of the renames (the
    nastiest state: the table holds half a batch), and after all renames
    but before the staging cleanup. Each crash restarts from the same
    checkpoint and must read back exactly-once: no duplicate, no missing
    row. Injection uses plans.pipeline._EO_TEST_FAULT (the avro task
    commit's pattern) because local mode never retries and a real kill
    can't be aimed between two renames."""
    import pytest

    from tutorial_apache_beam_spark.plans import pipeline as plmod
    from tutorial_apache_beam_spark.plans.pipeline import (
        MapElements,
        Pipeline,
        WriteParquet,
    )

    src = tmp_path / "src"
    src.mkdir()
    for b in range(3):  # one file per micro-batch via maxFilesPerTrigger=1
        (src / f"f{b}.json").write_text(
            "\n".join(
                json.dumps({"v": v}) for v in range(b * 100, b * 100 + 100)
            )
            + "\n"
        )

    def drain(out, ckpt):
        rows = (
            spark.readStream.schema("v BIGINT")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        p = Pipeline(spark)
        (
            p.create(rows)
            # 4 part files per batch so the mid-rename window is a real
            # half-committed state, not an all-or-nothing single rename.
            .apply("Fan", MapElements(lambda df: df.repartition(4)))
            .apply(
                "Sink",
                WriteParquet(
                    str(out),
                    checkpoint=str(ckpt),
                    available_now=True,
                    exactly_once=True,
                ),
            )
        )
        p.run().wait_until_finish()

    # (stage, detail) to crash at, always inside batch 1's commit so a
    # previously committed batch (0) sits in the table when we die.
    windows = [("staged", None), ("marker", None), ("renamed", 1), ("moved", None)]
    for stage_name, detail in windows:
        out = tmp_path / f"out_{stage_name}"
        ckpt = tmp_path / f"ckpt_{stage_name}"
        seen = {"batch": -1}

        def fault(stage, d, _target=(stage_name, detail)):
            if stage == "staged":
                seen["batch"] = d
            if seen["batch"] != 1:
                return
            if stage == _target[0] and (_target[1] is None or d == _target[1]):
                raise RuntimeError(f"injected crash at {stage}/{d}")

        plmod._EO_TEST_FAULT = fault
        try:
            with pytest.raises(Exception, match="injected crash"):
                drain(out, ckpt)
        finally:
            plmod._EO_TEST_FAULT = None

        spark.catalog.clearCache()
        if stage_name == "renamed":
            # Prove the window is real: the table holds batch 0 plus a
            # strict subset of batch 1's files at the moment of death.
            partial = spark.read.parquet(str(out)).count()
            assert 100 < partial < 200

        drain(out, ckpt)  # restart from the same checkpoint
        spark.catalog.clearCache()
        result = spark.read.parquet(str(out))
        vals = sorted(r["v"] for r in result.collect())
        assert vals == list(range(300)), f"window {stage_name}: {len(vals)} rows"
        assert (
            result.groupBy("v").count().filter("count > 1").count() == 0
        ), f"window {stage_name} duplicated rows"


def test_write_parquet_exactly_once_mid_commit_crash_partitioned(
    spark, tmp_path
):
    """The mid-rename crash window on a PARTITIONED table: renames walk
    partition subdirectories, so dying between them leaves some
    partitions holding the new batch's files and others not — recovery
    must self-replace across ALL partitions, not just the ones that
    committed before the crash."""
    import pytest

    from tutorial_apache_beam_spark.plans import pipeline as plmod
    from tutorial_apache_beam_spark.plans.pipeline import (
        Pipeline,
        WriteParquet,
    )

    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    for b in range(2):
        (src / f"f{b}.json").write_text(
            "\n".join(
                json.dumps({"v": v, "g": v % 3})
                for v in range(b * 30, b * 30 + 30)
            )
            + "\n"
        )

    def drain():
        rows = (
            spark.readStream.schema("v BIGINT, g BIGINT")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        p = Pipeline(spark)
        p.create(rows).apply(
            "Sink",
            WriteParquet(
                str(out),
                checkpoint=str(ckpt),
                partition_by=["g"],
                available_now=True,
                exactly_once=True,
            ),
        )
        p.run().wait_until_finish()

    seen = {"batch": -1}

    def fault(stage, d):
        if stage == "staged":
            seen["batch"] = d
        # Die after the FIRST of batch 1's three partition-dir renames.
        if seen["batch"] == 1 and stage == "renamed" and d == 0:
            raise RuntimeError("injected crash at renamed/0")

    plmod._EO_TEST_FAULT = fault
    try:
        with pytest.raises(Exception, match="injected crash"):
            drain()
    finally:
        plmod._EO_TEST_FAULT = None

    # Half-committed state across partitions: batch 0's 30 rows plus
    # exactly one partition's worth of batch 1.
    spark.catalog.clearCache()
    partial = spark.read.parquet(str(out)).count()
    assert 30 < partial < 60

    drain()
    spark.catalog.clearCache()
    result = spark.read.parquet(str(out))
    vals = sorted(r["v"] for r in result.collect())
    assert vals == list(range(60))
    assert result.groupBy("v").count().filter("count > 1").count() == 0
    # Partition dirs remain discoverable with correct values.
    assert sorted(
        r["g"] for r in result.select("g").distinct().collect()
    ) == [0, 1, 2]
