"""Clean-room avro fallback: spec-vector, golden-byte, and round-trip
verification.

No avro reader exists in this container (no jar, no fastavro), so the
verification strategy is layered instead of circular:
1. the binary primitives are pinned to the Apache Avro spec's OWN worked
   examples (the table in §Binary Encoding and the 'foo' string example),
2. a whole container with an injected sync marker is pinned as golden
   bytes (any encode change fails loudly),
3. the distributed writer round-trips through the reader across every
   supported type, nulls, unicode, and empty partitions.
"""

from __future__ import annotations

import hashlib
import io
from datetime import date, datetime

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    decode_long,
    encode_long,
    read_avro_fallback,
    read_container,
    spark_schema_to_avro,
    write_avro_fallback,
)


def test_long_encoding_matches_spec_examples():
    """The exact example table from the Avro spec (§Binary Encoding):
    0→00, -1→01, 1→02, -2→03, 2→04, plus the boundary forms -64→7f and
    64→80 01 that exercise the varint continuation bit."""
    spec_vectors = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
    }
    for n, wire in spec_vectors.items():
        assert encode_long(n) == wire, n
        assert decode_long(io.BytesIO(wire)) == n


def test_long_encoding_roundtrips_extremes():
    for n in (2**62, -(2**62), 2**63 - 1, -(2**63), 123456789, -987654321):
        assert decode_long(io.BytesIO(encode_long(n))) == n


def test_string_encoding_matches_spec_example():
    """Spec: the three-character string 'foo' encodes as 06 66 6f 6f."""
    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _encode_value,
    )

    out = bytearray()
    _encode_value("string", "foo", out)
    assert bytes(out) == b"\x06\x66\x6f\x6f"


def test_golden_container_bytes():
    """A fixed record set with an injected sync marker produces pinned
    bytes — any drift in header framing, union branch indexes, or value
    encoding fails here before it can corrupt interchange files."""
    from pyspark.sql import types as T

    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _field_plan,
        write_container,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
        ]
    )
    rows = [(1, "a", 1.5), (2, None, None), (3, "β", -0.25)]
    fh = io.BytesIO()
    n = write_container(
        rows,
        _field_plan(schema),
        spark_schema_to_avro(schema),
        fh,
        sync=b"\x00" * 16,
    )
    assert n == 3
    digest = hashlib.md5(fh.getvalue()).hexdigest()
    assert digest == GOLDEN_MD5, (
        f"container bytes drifted: {digest} (len {len(fh.getvalue())})"
    )
    # and the reader recovers the records exactly
    fh.seek(0)
    got_schema, got_rows = read_container(fh)
    assert [f["name"] for f in got_schema["fields"]] == [
        "id", "name", "score",
    ]
    assert got_rows == rows


# Pinned after byte-level verification against the spec: header =
# magic + 2-entry metadata map + zero sync; block = count 0x06 (=3),
# size 0x3c (=30); records verified nibble-by-nibble (id varints, union
# branch indexes, string lengths, LE doubles) in the r6 session log.
# Re-pinned r9: nullable fields now declare `"default": null` in the
# schema JSON (metadata-only change — the block bytes are untouched;
# only the header's schema string and its length varint moved), the
# enabler for §Schema Resolution's added-field evolution.
GOLDEN_MD5 = "3b27bbfca07cfa2dbc82b4cb6acc5ed9"


def test_write_read_roundtrip_all_types(spark, tmp_path):
    """Distributed write (one container per partition) → reader → exact
    value and schema equality across every supported type, with nulls,
    unicode, bytes, and an EMPTY partition in the mix."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("small", T.IntegerType(), True),
            T.StructField("ratio", T.DoubleType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("d", T.DateType(), True),
            T.StructField("ts", T.TimestampType(), True),
        ]
    )
    rows = [
        (1, True, 7, 2.5, "héllo", bytearray(b"\x00\xff"), date(2024, 1, 31),
         datetime(2024, 1, 31, 23, 59, 59, 123456)),
        (2, None, None, None, None, None, None, None),
        (3, False, -1, -0.125, "", bytearray(b""), date(1969, 12, 31),
         datetime(1960, 6, 1, 0, 0, 0, 1)),
    ]
    df = spark.createDataFrame(rows, schema).repartition(4)  # empty parts
    out = str(tmp_path / "tbl.avro")
    write_avro_fallback(df, out, codec="deflate")
    back = read_avro_fallback(spark, out)
    assert back.schema == schema
    canon = lambda df: sorted(
        (r["id"], r["flag"], r["small"], r["ratio"], r["name"],
         bytes(r["payload"]) if r["payload"] is not None else None,
         r["d"], r["ts"])
        for r in df.collect()
    )
    assert canon(back) == canon(df)


def test_writer_surface_falls_back_without_jar(spark, tmp_path):
    """write_table/read_table with fmt='avro': no spark-avro on this
    classpath, so the surface transparently uses the fallback and the
    round-trip still succeeds (the pre-r6 behavior was a hard error)."""
    from tutorial_apache_beam_spark.sources.writers import (
        read_table,
        write_table,
    )

    df = spark.range(100).withColumnRenamed("id", "v")
    out = str(tmp_path / "t.avro")
    write_table(df, out, fmt="avro")
    back = read_table(spark, out, fmt="avro")
    assert sorted(r["v"] for r in back.collect()) == list(range(100))


def test_fallback_guards(spark, tmp_path):
    """Non-local paths and unrepresentable types refuse with the jar
    remediation instead of mis-writing. (Structs/arrays/maps became
    first-class in r10, decimal in r11; the remaining write refusal is
    non-string map keys, see tests/test_avro_nested.py.)"""
    from pyspark.sql import functions as F

    df = spark.range(3)
    with pytest.raises(ValueError, match="spark-avro"):
        write_avro_fallback(df, "s3a://bucket/t.avro")
    iv = df.select(F.make_interval(F.lit(0), F.lit(1)).alias("iv"))
    with pytest.raises(NotImplementedError, match="spark-avro"):
        write_avro_fallback(iv, str(tmp_path / "x.avro"))


def test_codec_surface():
    """r8: the writer used to stamp ANY codec string into the file
    metadata while compressing only deflate — a conforming reader would
    then try to decompress plain bytes. Unknown codecs now refuse at
    write AND read; the stdlib spec codecs round-trip; the external-lib
    codecs raise the remediation when their package is absent."""
    import io as _io

    from pyspark.sql import types as T

    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _codec_pair,
        _field_plan,
        write_container,
    )

    schema = T.StructType([T.StructField("id", T.LongType(), False)])
    plan, avro_schema = _field_plan(schema), spark_schema_to_avro(schema)
    rows = [(i,) for i in range(2000)]
    for codec in ("null", "deflate", "bzip2", "xz"):
        fh = _io.BytesIO()
        write_container(iter(rows), plan, avro_schema, fh, codec=codec)
        fh.seek(0)
        _, got = read_container(fh)
        assert got == rows, codec
    with pytest.raises(ValueError, match="unknown avro codec"):
        write_container(iter(rows), plan, avro_schema, _io.BytesIO(),
                        codec="gzip")
    # reader refuses a container whose metadata names an unknown codec
    fh = _io.BytesIO()
    write_container(iter(rows), plan, avro_schema, fh, codec="null")
    tampered = fh.getvalue().replace(b"null", b"gzip", 1)
    with pytest.raises(ValueError, match="unknown avro codec"):
        read_container(_io.BytesIO(tampered))
    # external-lib codecs: round-trip when installed, remediation if not
    for codec in ("snappy", "zstandard"):
        try:
            compress, decompress = _codec_pair(codec)
        except NotImplementedError as ex:
            assert "package" in str(ex)
            continue
        assert decompress(compress(b"payload" * 100)) == b"payload" * 100


def test_task_commit_protocol_deterministic_names(spark, tmp_path):
    """ADVICE r6: filenames are deterministic per (job salt, Spark
    partition id), written via dot-hidden temp + os.replace — so a
    retried attempt overwrites its predecessor instead of leaving a
    truncated file beside a complete one. Verify the layout contract:
    names are part-{partitionId:05d}-{salt}.avro, no temp residue, and
    the reader skips a crashed attempt's lingering temp file."""
    import os
    import re

    df = spark.range(40).repartition(4)
    out = str(tmp_path / "t.avro")
    write_avro_fallback(df, out)
    names = sorted(os.listdir(out))
    assert all(re.fullmatch(r"part-\d{5}-[0-9a-f]{8}\.avro", n) for n in names)
    # one salt per job, one file per non-empty Spark partition id
    salts = {n.split("-")[2].split(".")[0] for n in names}
    assert len(salts) == 1
    pids = sorted(int(n.split("-")[1]) for n in names)
    assert pids == sorted(set(pids))  # distinct partition ids
    # a crashed attempt's temp file is invisible to the reader
    with open(os.path.join(out, ".part-99999-deadbeef.avro.tmp-7"), "wb") as f:
        f.write(b"truncated garbage")
    back = read_avro_fallback(spark, out)
    assert sorted(r["id"] for r in back.collect()) == list(range(40))


def test_partitioned_layout_escaping_and_null(spark, tmp_path):
    """Hive-style partition dirs: values escaped exactly as Spark's
    catalog escapes them (':' -> '%3A'), NULL -> __HIVE_DEFAULT_PARTITION__,
    partition columns dropped from the container payload and appended
    (typed) on read-back."""
    import os

    df = spark.createDataFrame(
        [("a:1", 1, "x"), ("plain", 2, "y"), (None, 3, "z")],
        "k STRING, v BIGINT, w STRING",
    )
    out = str(tmp_path / "p.avro")
    write_avro_fallback(df, out, partition_by=["k"])
    dirs = sorted(d for d in os.listdir(out) if "=" in d)
    assert dirs == ["k=__HIVE_DEFAULT_PARTITION__", "k=a%3A1", "k=plain"]
    back = read_avro_fallback(spark, out)
    # partition column appended after data columns, NULL restored
    assert back.columns == ["v", "w", "k"]
    got = sorted(
        ((r["k"] or ""), r["v"], r["w"]) for r in back.collect()
    )
    assert got == [("", 3, "z"), ("a:1", 1, "x"), ("plain", 2, "y")]
    # homogeneous numeric values infer the typed column
    df2 = spark.createDataFrame(
        [(1, 10), (2, 20)], "day BIGINT, v BIGINT"
    )
    out2 = str(tmp_path / "p2.avro")
    write_avro_fallback(df2, out2, partition_by=["day"])
    typed = read_avro_fallback(spark, out2)
    assert dict(typed.dtypes)["day"] == "bigint"


def test_mixed_partition_values_demote_to_string(spark, tmp_path):
    """ADVICE r7: the demotion path in _partition_spark_type was
    advertised by a comment but never exercised — mixed typed/untyped
    values across partition dirs (day=1 beside day=x) must read back as
    one STRING column with every value intact, exactly as Spark demotes
    conflicting partition inferences."""
    df = spark.createDataFrame(
        [("1", 10), ("x", 20), (None, 30)], "day STRING, v BIGINT"
    )
    out = str(tmp_path / "mixed.avro")
    write_avro_fallback(df, out, partition_by=["day"])
    back = read_avro_fallback(spark, out)
    assert dict(back.dtypes)["day"] == "string"
    got = sorted((r["day"], r["v"]) for r in back.collect()
                 if r["day"] is not None)
    assert got == [("1", 10), ("x", 20)]
    assert [r["v"] for r in back.collect() if r["day"] is None] == [30]


def test_partition_inference_rejects_python_only_numerics():
    """ADVICE r7/r8: bare int()/float() accept spellings Spark's
    PartitioningUtils rejects — '1_0' (underscore literal),
    'nan'/'inf' — silently corrupting string partition values that
    merely look numeric to Python; and REJECT spellings Spark accepts
    via Java's Double.parseDouble — whitespace-trimmed ('  7 '),
    [dDfF]-suffixed ('1.5d'), hex floats ('0x1p3'), signed specials
    ('+NaN'). The Java-grammar-gated parse matches Spark on both sides
    (each case verified live in the differential test)."""
    from datetime import date as _date

    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _infer_partition_value,
    )

    # canonical forms parse typed, Spark-style (signed longs included,
    # like Java's Long.parseLong)
    assert _infer_partition_value("7") == 7
    assert _infer_partition_value("-42") == -42
    assert _infer_partition_value("+7") == 7
    assert isinstance(_infer_partition_value("+7"), int)
    assert _infer_partition_value("2.5") == 2.5
    assert _infer_partition_value("-0.125") == -0.125
    assert _infer_partition_value("1e3") == 1000.0
    assert _infer_partition_value(".5") == 0.5
    assert _infer_partition_value("2024-01-31") == _date(2024, 1, 31)
    # Python-only spellings stay strings (lowercase nan/inf included —
    # Java's Double.parseDouble is case-exact on the special literals)
    for s in ("1_0", "nan", "inf", "-inf", "0x10", "1_000.5", "1e",
              "--3", "1.5dd", "NaNf", "Infinityd", "0xp3", ".e3", "d",
              "+d", " 2024-01-31 "):
        assert _infer_partition_value(s) == s, s
    # ...but the exact Java special literals parse as doubles, matching
    # Spark's measured inference (differential test pins this live)
    assert _infer_partition_value("Infinity") == float("inf")
    assert _infer_partition_value("-Infinity") == float("-inf")
    for s in ("NaN", "+NaN", "-NaN"):
        nan = _infer_partition_value(s)
        assert isinstance(nan, float) and nan != nan, s
    # Java-only spellings Spark types as DOUBLE (ADVICE r8, all probed
    # live): parseDouble trims chars <= U+0020 (longs and dates do NOT
    # trim — '  7 ' is a double 7.0, not a long), allows a [dDfF]
    # suffix on numeric forms, and accepts hex-significand floats
    for s, want in (("  7 ", 7.0), ("7 ", 7.0), (" 7", 7.0),
                    ("7\t", 7.0), (" 2.5d ", 2.5), ("1.5d", 1.5),
                    ("1.5D", 1.5), ("2f", 2.0), ("1e3F", 1000.0),
                    ("0x1p3", 8.0), ("-0x1p-2", -0.25), ("0x.8p1", 1.0),
                    ("0x1p3d", 8.0)):
        got = _infer_partition_value(s)
        assert isinstance(got, float) and got == want, (s, got)
    # week-date / compact ISO forms Spark keeps as strings (compact
    # digits parse as LONG, like Spark, not as a date)
    assert _infer_partition_value("2026-W33-5") == "2026-W33-5"
    assert _infer_partition_value("20260815") == 20260815
    # invalid calendar date shaped like yyyy-MM-dd stays a string
    assert _infer_partition_value("2024-13-45") == "2024-13-45"
    # beyond-int64 digit strings stay strings: a LongType bigint would
    # crash createDataFrame on read-back (Spark falls back to decimal;
    # this subset falls back to string)
    big = "99999999999999999999"
    assert _infer_partition_value(big) == big
    assert _infer_partition_value("-" + big) == "-" + big
    assert _infer_partition_value(str(2**63 - 1)) == 2**63 - 1
    assert _infer_partition_value(str(-(2**63))) == -(2**63)


def test_task_commit_failure_injection(spark, tmp_path):
    """VERDICT r7 #5: simulate the actual commit hazards — an attempt
    that dies mid-write (after the temp file exists, before the rename)
    then retries, and a speculative duplicate attempt racing the winner.
    Exact row counts and zero temp residue must survive both. Driven
    through _write_task_partition directly because local mode sets
    task maxFailures=1 (a foreachPartition raise kills the job, no
    retry)."""
    import os

    from pyspark.sql import types as T

    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _field_plan,
        _write_task_partition,
    )

    # data schema excludes the partition column, as the writer drops it
    schema = T.StructType([T.StructField("id", T.LongType(), False)])
    plan = _field_plan(schema)
    avro_schema = spark_schema_to_avro(schema)
    out = str(tmp_path / "inject.avro")
    os.makedirs(out)
    rows = [{"id": i, "grp": "a" if i % 2 else "b"} for i in range(20)]

    def run_attempt(attempt, rows_, fault=None):
        _write_task_partition(
            rows_, out, ["grp"], ["id"], plan, avro_schema, "null",
            "part-00003-cafe0123", attempt, fault=fault,
        )

    # attempt 7 dies in the widest crash window: temp fully written,
    # rename never happens
    class Die(RuntimeError):
        pass

    def crash(out_dir, tmp):
        assert os.path.exists(tmp)
        raise Die()

    with pytest.raises(Die):
        run_attempt(7, rows, fault=crash)
    # the crash left ONLY dot-hidden temp residue — no visible .avro
    visible = [
        os.path.join(dp, n)
        for dp, _, ns in os.walk(out)
        for n in ns
        if n.endswith(".avro") and not n.startswith(".")
    ]
    assert visible == []
    # retry (same partition id/stem, new attempt id) commits cleanly
    run_attempt(8, rows)
    back = read_avro_fallback(spark, out)
    assert sorted(r["id"] for r in back.collect()) == list(range(20))
    # a speculative duplicate attempt replaces the SAME final files with
    # identical content — still exact rows, no duplication
    run_attempt(9, rows)
    back2 = read_avro_fallback(spark, out)
    assert sorted(r["id"] for r in back2.collect()) == list(range(20))
    # exactly one visible file per partition dir; the attempt-7 crash
    # left its dot-hidden temp in the first group it processed (the
    # fault fires before the loop reaches the second), invisible to the
    # reader but still on disk
    all_entries = []
    for d in ("grp=a", "grp=b"):
        entries = os.listdir(os.path.join(out, d))
        assert [n for n in entries if not n.startswith(".")] == [
            "part-00003-cafe0123.avro"
        ]
        all_entries += entries
    assert any(n.endswith(".tmp-7") for n in all_entries)


def test_incompatible_schema_drift_refused(spark, tmp_path):
    """r8 refused ALL drift; r9 resolves spec-resolvable drift (see
    test_avro_schema_resolution.py) and must still refuse GENUINELY
    incompatible drift — here the same field name written as BIGINT in
    one file and STRING in another (no spec promotion either way), which
    no candidate reader schema can reconcile."""
    import os

    df_a = spark.createDataFrame([(1, "x")], "id BIGINT, name STRING")
    df_b = spark.createDataFrame([("7", 2)], "id STRING, v BIGINT")
    out = str(tmp_path / "drift.avro")
    write_avro_fallback(df_a.coalesce(1), out)
    tmp2 = str(tmp_path / "second.avro")
    write_avro_fallback(df_b.coalesce(1), tmp2)
    src = [n for n in os.listdir(tmp2) if n.endswith(".avro")][0]
    os.rename(os.path.join(tmp2, src), os.path.join(out, "zz-" + src))
    with pytest.raises(ValueError, match="schema drift"):
        read_avro_fallback(spark, out)


def test_non_utc_session_refused_for_timestamps(spark, tmp_path):
    """ADVICE r6: the timestamp-micros codec assumes naive == UTC; a
    non-UTC session would shift every value silently, so both paths
    verify the session zone (timestamp-free schemas stay unaffected)."""
    df_ts = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0))], "id BIGINT, ts TIMESTAMP"
    )
    out = str(tmp_path / "tz.avro")
    write_avro_fallback(df_ts, out)  # UTC session: fine
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone"):
            write_avro_fallback(df_ts, str(tmp_path / "tz2.avro"))
        with pytest.raises(ValueError, match="timeZone"):
            read_avro_fallback(spark, out)
        # timestamp-free schema is zone-independent: still allowed
        write_avro_fallback(
            spark.range(3), str(tmp_path / "tz3.avro")
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
