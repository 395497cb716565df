"""The avro fallback READ path is distributed (VERDICT r8 #1).

Until r9 the reader materialized every row through the driver
(files → rows → createDataFrame), making it the one source whose input
size was capped by driver memory. Now the driver touches HEADERS only;
the row decode runs in executor Python workers over
`binaryFile` + `mapPartitions`. These tests pin that contract:
poisoning the driver process's decode function must not affect the
read (workers import the module fresh), and the work must actually be
split across multiple input partitions.
"""

from __future__ import annotations

import os

import pytest

from tutorial_apache_beam_spark.sources import avro_fallback
from tutorial_apache_beam_spark.sources.avro_fallback import (
    read_avro_fallback,
    write_avro_fallback,
)


def test_decode_runs_on_executors_not_driver(spark, tmp_path, monkeypatch):
    """Replace the driver module's `_decode_container` with a bomb. The
    executor closure references it by name; Python workers are separate
    processes that import the module fresh, so the read only succeeds
    if every row is decoded OFF the driver. (The old driver-side reader
    called read_container → _decode_container in-process and would
    explode here.)"""
    df = spark.range(10_000).selectExpr(
        "id", "cast(id % 7 as string) as k"
    ).repartition(8)
    out = str(tmp_path / "t.avro")
    write_avro_fallback(df, out, codec="deflate")

    def bomb(*a, **k):
        raise AssertionError(
            "row decode ran in the DRIVER process — the read path "
            "must decode on executors"
        )

    monkeypatch.setattr(avro_fallback, "_decode_container", bomb)
    back = read_avro_fallback(spark, out)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id)").collect()[0][0] == \
        10_000 * 9_999 // 2


def test_header_only_driver_pass_reads_few_bytes(spark, tmp_path,
                                                 monkeypatch):
    """The driver's per-file pass must read headers, not payloads:
    instrument read_header's stream and assert the driver consumed a
    tiny prefix of each multi-megabyte file."""
    df = spark.range(300_000).selectExpr(
        "id", "repeat('x', 64) as pad"
    ).repartition(4)
    out = str(tmp_path / "big.avro")
    write_avro_fallback(df, out)
    sizes = {
        n: os.path.getsize(os.path.join(out, n))
        for n in os.listdir(out) if n.endswith(".avro")
    }
    assert min(sizes.values()) > 1_000_000  # payloads are MBs

    consumed = {}
    real_open = open

    class Meter:
        def __init__(self, fh, name):
            self._fh, self._name = fh, name

        def read(self, n=-1):
            b = self._fh.read(n)
            consumed[self._name] = consumed.get(self._name, 0) + len(b)
            return b

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self._fh.close()

    def spy_open(path, mode="r", *a, **k):
        fh = real_open(path, mode, *a, **k)
        if str(path).endswith(".avro") and "b" in mode:
            return Meter(fh, os.path.basename(str(path)))
        return fh

    monkeypatch.setattr(avro_fallback, "open", spy_open, raising=False)
    back = read_avro_fallback(spark, out)
    # driver pass done at this point (it happens eagerly); each file's
    # driver-side consumption is header-sized, not payload-sized
    assert set(consumed) == set(sizes)
    assert all(v < 4096 for v in consumed.values()), consumed
    assert back.count() == 300_000


def test_input_splits_across_partitions(spark, tmp_path):
    """One container file per writer partition → the binaryFile scan
    yields at least as many decode units as files can fill; with 16
    writer partitions the read must not collapse to one task."""
    df = spark.range(100_000).repartition(16)
    out = str(tmp_path / "t.avro")
    write_avro_fallback(df, out)
    nfiles = len([n for n in os.listdir(out) if n.endswith(".avro")])
    assert nfiles == 16
    back = read_avro_fallback(spark, out)
    # the decode RDD preserves binaryFile's partitioning; tiny files
    # may bin-pack, but 16 files on local[32] must not serialize into
    # a single partition
    assert back.rdd.getNumPartitions() > 1
    assert back.count() == 100_000


def test_partitioned_tree_distributed_roundtrip(spark, tmp_path):
    """Hive-partitioned tree through the distributed path: partition
    values (typed + escaped + NULL) are appended on executors from the
    broadcast path→values map."""
    df = spark.createDataFrame(
        [(1, "a:1"), (2, "plain"), (3, None), (4, "a:1")],
        "v BIGINT, k STRING",
    ).repartition(3)
    out = str(tmp_path / "p.avro")
    write_avro_fallback(df, out, partition_by=["k"])
    back = read_avro_fallback(spark, out)
    got = sorted((r["v"], r["k"]) for r in back.collect())
    assert got == [(1, "a:1"), (2, "plain"), (3, None), (4, "a:1")]


def test_drifted_tree_distributed(spark, tmp_path):
    """Schema resolution applies per file ON the executors: a tree
    whose second file added a column decodes under the widest schema in
    the distributed path too (not just read_container)."""
    import tempfile

    out = str(tmp_path / "t.avro")
    os.makedirs(out)

    def add(df, prefix):
        tmp = tempfile.mkdtemp()
        write_avro_fallback(df.coalesce(1), tmp)
        src = [n for n in os.listdir(tmp) if n.endswith(".avro")][0]
        os.rename(os.path.join(tmp, src),
                  os.path.join(out, f"{prefix}-{src}"))

    add(spark.range(50).selectExpr("id"), "aa")
    # the added column must be nullable: only a defaulted (here:
    # default-null) reader-only field can fill rows from older files
    add(spark.createDataFrame(
        [(i, float(i * 2)) for i in range(50, 100)],
        "id BIGINT, dbl DOUBLE",
    ), "bb")
    back = read_avro_fallback(spark, out)
    assert back.columns == ["id", "dbl"]
    rows = {r["id"]: r["dbl"] for r in back.collect()}
    assert len(rows) == 100
    assert rows[10] is None and rows[60] == 120.0
