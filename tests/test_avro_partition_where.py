"""Option-based partition pruning for the avro_fallback DataSource
(r12, VERDICT r11 item 2): `partitionWhere` is evaluated DRIVER-SIDE at
plan time against each file's typed Hive partition values — the safe
alternative to pushFilters, whose per-relation scan cache is broken on
Spark 4.1.2 (pinned by the sentinel in tests/test_avro_datasource.py,
which must stay green alongside these)."""

from __future__ import annotations

import glob
import os
from datetime import date

import pytest
from pyspark.sql import types as T

from tutorial_apache_beam_spark.sources.avro_datasource import (
    AvroFallbackDataSource,
    _parse_partition_where,
    register_avro_fallback,
)
from tutorial_apache_beam_spark.sources.avro_fallback import (
    write_avro_fallback,
)


@pytest.fixture()
def registered(spark):
    register_avro_fallback(spark)
    return spark


def _day_tree(spark, path, days=(1, 2, 3), rows_per_day=4):
    df = spark.createDataFrame(
        [
            (d * 100 + i, f"v{d}_{i}", d)
            for d in days
            for i in range(rows_per_day)
        ],
        "id BIGINT, payload STRING, day BIGINT",
    )
    write_avro_fallback(df, path, partition_by=["day"])


# --- parser unit layer -------------------------------------------------------


PCOLS = ["day", "tag", "dt"]
PTYPES = [T.LongType(), T.StringType(), T.DateType()]


def _keep(expr):
    return _parse_partition_where(expr, PCOLS, PTYPES)


def test_parser_operators_and_logic():
    keep = _keep("day >= 2 AND day < 4")
    assert [keep((d, "x", None)) for d in (1, 2, 3, 4)] == [
        False, True, True, False,
    ]
    keep = _keep("day = 1 OR tag = 'b'")
    assert keep((1, "a", None)) and keep((5, "b", None))
    assert not keep((5, "a", None))
    keep = _keep("NOT (day = 1 OR day = 2)")
    assert keep((3, None, None)) and not keep((1, None, None))
    keep = _keep("day IN (1, 3)")
    assert keep((3, None, None)) and not keep((2, None, None))
    keep = _keep("day NOT IN (1, 3)")
    assert keep((2, None, None)) and not keep((3, None, None))
    keep = _keep("day != 2")
    assert keep((1, None, None)) and not keep((2, None, None))


def test_parser_string_escape_and_date():
    keep = _keep("tag = 'it''s'")
    assert keep((0, "it's", None)) and not keep((0, "its", None))
    keep = _keep("dt >= DATE '2024-01-02'")
    assert keep((0, "", date(2024, 1, 2)))
    assert not keep((0, "", date(2024, 1, 1)))
    # ISO string coerces for a date column too
    keep = _keep("dt = '2024-01-03'")
    assert keep((0, "", date(2024, 1, 3)))


def test_parser_three_valued_null_semantics():
    """SQL WHERE semantics: UNKNOWN excludes; IS NULL is the only way a
    __HIVE_DEFAULT_PARTITION__ value matches."""
    assert not _keep("day = 2")((None, "x", None))
    assert not _keep("day != 2")((None, "x", None))
    assert not _keep("day IN (1, 2)")((None, "x", None))
    assert not _keep("NOT day = 2")((None, "x", None))
    assert _keep("day IS NULL")((None, "x", None))
    assert _keep("day IS NOT NULL")((7, "x", None))
    # UNKNOWN OR TRUE = TRUE; UNKNOWN AND TRUE = UNKNOWN (excluded)
    assert _keep("day = 2 OR tag = 'x'")((None, "x", None))
    assert not _keep("day = 2 AND tag = 'x'")((None, "x", None))


def test_parser_loud_errors():
    with pytest.raises(ValueError, match="not a partition column"):
        _keep("payload = 'x'")
    with pytest.raises(ValueError, match="not numeric"):
        _keep("day = 'two'")
    with pytest.raises(ValueError, match="not a quoted string"):
        _keep("tag = 2")
    with pytest.raises(ValueError, match="trailing input"):
        _keep("day = 1 day = 2")
    with pytest.raises(ValueError, match="expected a comparison"):
        _keep("day LIKE '1'")
    with pytest.raises(ValueError):
        _keep("dt = DATE 'not-a-date'")


# --- files-touched layer -----------------------------------------------------


def test_batch_partitions_contain_only_matching_files(spark, tmp_path):
    """The pruned file list IS the reader's plan: partitions() built for
    a partitionWhere relation reference only matching files."""
    tree = str(tmp_path / "tree")
    _day_tree(spark, tree)
    ds = AvroFallbackDataSource(
        {"path": tree, "partitionwhere": "day <> 2"}
    )
    reader = ds.reader(ds.schema())
    files = [fp for p in reader.partitions() for fp, _ in p.files]
    assert files, "pruned plan must not be empty"
    assert all("day=2" not in fp for fp in files)
    full = AvroFallbackDataSource({"path": tree})
    all_files = [
        fp for p in full.reader(full.schema()).partitions()
        for fp, _ in p.files
    ]
    assert len(all_files) > len(files)


def test_batch_prune_never_decodes_pruned_files(registered, tmp_path):
    """A pruned partition whose file has CORRUPT data blocks (valid
    header — headers are read tree-wide for schema resolution) decodes
    fine when pruned away, and fails loudly when it isn't — direct
    evidence the pruned file is never opened for data."""
    spark = registered
    tree = str(tmp_path / "tree")
    _day_tree(spark, tree)
    victim = glob.glob(f"{tree}/day=3/*.avro")[0]
    with open(victim, "ab") as fh:
        fh.write(b"\x07garbage-not-a-block")

    pruned = (
        spark.read.format("avro_fallback")
        .option("partitionWhere", "day IN (1, 2)")
        .load(tree)
    )
    got = sorted((r["id"], r["day"]) for r in pruned.collect())
    assert [d for _, d in got] == [1] * 4 + [2] * 4

    with pytest.raises(Exception):
        spark.read.format("avro_fallback").load(tree).collect()


def test_prune_does_not_change_schema(registered, tmp_path):
    spark = registered
    tree = str(tmp_path / "tree")
    _day_tree(spark, tree)
    full = spark.read.format("avro_fallback").load(tree)
    pruned = (
        spark.read.format("avro_fallback")
        .option("partitionWhere", "day = 1")
        .load(tree)
    )
    assert pruned.schema == full.schema


def test_null_partition_matches_only_is_null(registered, tmp_path):
    spark = registered
    tree = str(tmp_path / "tree")
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id BIGINT, tag STRING"
    )
    write_avro_fallback(df, tree, partition_by=["tag"])
    nulls = (
        spark.read.format("avro_fallback")
        .option("partitionWhere", "tag IS NULL")
        .load(tree)
    )
    assert [r["id"] for r in nulls.collect()] == [2]
    eq = (
        spark.read.format("avro_fallback")
        .option("partitionWhere", "tag = 'a'")
        .load(tree)
    )
    assert [r["id"] for r in eq.collect()] == [1]


def test_streaming_reader_honors_partition_where(registered, tmp_path):
    """The same option prunes the STREAMING reader — initial files and
    late-arriving ones; pruned late files are never opened (not even
    header-validated) but stay accounted in the offset."""
    spark = registered
    tree = str(tmp_path / "tree")
    _day_tree(spark, tree, days=(1, 2))
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("avro_fallback")
            .option("partitionWhere", "day = 2")
            .load(tree)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r["id"], r["day"])
            for r in spark.read.parquet(sink).collect()
        )

    first = drain()
    assert [d for _, d in first] == [2] * 4

    # late files: one matching, one pruned. The pruned one has a VALID
    # header (headers are scanned tree-wide at plan time for schema
    # resolution — full-tree by design, so pruning can never change the
    # derived schema) but CORRUPT data blocks, proving pruned files are
    # never opened for decode.
    late = spark.createDataFrame(
        [(900, "late", 2), (901, "junk", 9)],
        "id BIGINT, payload STRING, day BIGINT",
    )
    write_avro_fallback(
        late, str(tmp_path / "late"), partition_by=["day"]
    )
    late_file = glob.glob(str(tmp_path / "late" / "day=2" / "*.avro"))[0]
    junk_file = glob.glob(str(tmp_path / "late" / "day=9" / "*.avro"))[0]
    with open(junk_file, "ab") as fh:
        fh.write(b"\x07garbage-not-a-block")
    os.makedirs(f"{tree}/day=9", exist_ok=True)
    os.rename(junk_file, f"{tree}/day=9/junk.avro")
    os.rename(late_file, f"{tree}/day=2/late.avro")

    second = drain()
    assert second == first + [(900, 2)]


# --- differential fuzz layer (r13, VERDICT r12 item 4) -----------------------


def test_partition_where_differential_fuzz_vs_duckdb():
    """Property-fuzz the recursive-descent partitionWhere compiler
    against DuckDB evaluating the SAME predicate over the SAME typed
    partition tuples (the repo's differential pattern, e.g.
    test_hive_escape_differential). The parser guards correctness-
    relevant pruning — a wrong keep() silently drops partitions — so
    its three-valued WHERE semantics must agree with a real SQL engine
    on every generated predicate: int/string/date columns, every
    comparison operator, IN/NOT IN, IS [NOT] NULL, AND/OR/NOT nesting,
    parens, float-vs-int comparison, ISO-string date coercion, and
    quote-escaped strings. Seeded, 300 expressions x 24 tuples."""
    import random
    from datetime import date as _date

    import duckdb

    rng = random.Random(0xA5C3)

    day_vals = [None, -2, 0, 1, 2, 3, 100]
    tag_vals = [None, "", "a", "b", "it's", "x y", "ü"]
    dt_vals = [None] + [_date(2024, 1, d) for d in (1, 2, 3, 4)]
    tuples = [
        (rng.choice(day_vals), rng.choice(tag_vals), rng.choice(dt_vals))
        for _ in range(24)
    ]

    day_lits = ["-2", "0", "1", "2", "3", "4", "1.5", "-0.5", "1e1"]
    tag_lits = ["'a'", "'b'", "'it''s'", "''", "'ü'", "'z'", "'x y'"]
    dt_lits = [
        "DATE '2024-01-01'", "DATE '2024-01-02'", "DATE '2024-01-03'",
        "DATE '2024-01-05'", "'2024-01-02'", "'2024-01-04'",
    ]
    CMP = ["=", "!=", "<>", "<", "<=", ">", ">="]

    def leaf() -> str:
        col, lits = rng.choice(
            [("day", day_lits), ("tag", tag_lits), ("dt", dt_lits)]
        )
        kind = rng.random()
        if kind < 0.15:
            return f"{col} IS {'NOT ' if rng.random() < 0.5 else ''}NULL"
        if kind < 0.35:
            n = rng.randint(1, 3)
            inner = ", ".join(rng.choice(lits) for _ in range(n))
            neg = "NOT " if rng.random() < 0.5 else ""
            return f"{col} {neg}IN ({inner})"
        return f"{col} {rng.choice(CMP)} {rng.choice(lits)}"

    def expr(depth: int = 0) -> str:
        r = rng.random()
        if depth < 3 and r < 0.30:
            return f"({expr(depth + 1)} AND {expr(depth + 1)})"
        if depth < 3 and r < 0.55:
            return f"({expr(depth + 1)} OR {expr(depth + 1)})"
        if depth < 3 and r < 0.65:
            return f"NOT {expr(depth + 1)}"
        return leaf()

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t(rid INT, day BIGINT, tag VARCHAR, dt DATE)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?)",
        [(i, *tup) for i, tup in enumerate(tuples)],
    )

    for i in range(300):
        e = expr()
        keep = _parse_partition_where(
            e, ["day", "tag", "dt"],
            [T.LongType(), T.StringType(), T.DateType()],
        )
        mine = {j for j, tup in enumerate(tuples) if keep(tup)}
        duck = {
            r[0]
            for r in con.execute(
                f"SELECT rid FROM t WHERE {e}"
            ).fetchall()
        }
        assert mine == duck, (
            f"expr #{i} diverged from DuckDB: {e!r}\n"
            f"parser kept {sorted(mine)}, duckdb kept {sorted(duck)}"
        )
