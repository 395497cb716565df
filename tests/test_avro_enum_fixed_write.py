"""Enum/fixed on the avro WRITE path via a declared writer schema (r12,
VERDICT r11 item 3): Spark has no enum/fixed column types, so the
declared `avroSchema` option / `avro_schema=` kwarg is the only route to
those wire types — validated at plan time (`writer_plan_for_avro_schema`),
encoded with per-value symbol-membership and length checks, and readable
back by both this module's reader and any Java-Avro consumer (golden
wire bytes pinned against the spec's encoding rules)."""

from __future__ import annotations

import io
import json

import pytest
from pyspark.sql import types as T

from tutorial_apache_beam_spark.sources.avro_datasource import (
    register_avro_fallback,
)
from tutorial_apache_beam_spark.sources.avro_fallback import (
    _decode_container,
    read_avro_fallback,
    write_avro_fallback,
    write_container,
    writer_plan_for_avro_schema,
)

SUIT = {
    "type": "enum",
    "name": "Suit",
    "symbols": ["SPADES", "HEARTS", "DIAMONDS", "CLUBS"],
}
MAC = {"type": "fixed", "name": "Mac2", "size": 2}


def _schema(fields):
    return {"type": "record", "name": "r", "fields": fields}


@pytest.fixture()
def registered(spark):
    register_avro_fallback(spark)
    return spark


def test_golden_wire_bytes_enum_and_fixed():
    """Spec §enum: 'an int, representing the zero-based position of the
    symbol' — HEARTS (index 1) zigzags to 0x02; §fixed: 'the number of
    bytes declared in the schema', no length prefix. Pinned as raw block
    bytes with an injected sync marker."""
    avro = _schema([
        {"name": "suit", "type": SUIT},
        {"name": "mac", "type": MAC},
    ])
    spark_schema = T.StructType([
        T.StructField("suit", T.StringType(), False),
        T.StructField("mac", T.BinaryType(), False),
    ])
    plan = writer_plan_for_avro_schema(spark_schema, avro)
    buf = io.BytesIO()
    sync = b"\x00" * 16
    write_container([("HEARTS", b"\xab\xcd")], plan, avro, buf, sync=sync)
    raw = buf.getvalue()
    # block payload: count=1 (0x02), size=3 (0x06), then 02 ab cd
    assert b"\x02\x06\x02\xab\xcd" + sync in raw
    # and the reader maps it straight back
    _, rows = _decode_container(io.BytesIO(raw))
    assert list(rows) == [("HEARTS", b"\xab\xcd")]


def test_datasource_writer_roundtrip_enum_fixed(registered, tmp_path):
    spark = registered
    avro = _schema([
        {"name": "id", "type": "long"},
        {"name": "suit", "type": ["null", SUIT], "default": None},
        {"name": "mac", "type": MAC},
    ])
    df = spark.createDataFrame(
        [(1, "SPADES", b"\x01\x02"), (2, None, b"\x03\x04")],
        T.StructType([
            T.StructField("id", T.LongType(), False),
            T.StructField("suit", T.StringType(), True),
            T.StructField("mac", T.BinaryType(), False),
        ]),
    )
    out = str(tmp_path / "out")
    (
        df.write.format("avro_fallback")
        .option("avroSchema", json.dumps(avro))
        .mode("overwrite")
        .save(out)
    )
    back = spark.read.format("avro_fallback").load(out)
    # enum reads back as its symbol string, fixed as binary
    assert back.schema["suit"].dataType == T.StringType()
    assert back.schema["mac"].dataType == T.BinaryType()
    assert sorted(map(tuple, back.collect())) == [
        (1, "SPADES", b"\x01\x02"),
        (2, None, b"\x03\x04"),
    ]
    # the DECLARED schema (with the enum) is what landed in metadata
    import glob as _glob

    from tutorial_apache_beam_spark.sources.avro_fallback import (
        read_header,
    )

    with open(_glob.glob(f"{out}/*.avro")[0], "rb") as fh:
        meta_schema, _, _ = read_header(fh)
    assert {"type": "enum", "name": "Suit"}.items() <= {
        k: v
        for k, v in meta_schema["fields"][1]["type"][1].items()
    }.items()


def test_helper_roundtrip_partitioned_enum(registered, tmp_path):
    spark = registered
    avro = _schema([{"name": "suit", "type": SUIT}])
    df = spark.createDataFrame(
        [("HEARTS", 1), ("CLUBS", 2)],
        T.StructType([
            T.StructField("suit", T.StringType(), False),
            T.StructField("day", T.LongType(), False),
        ]),
    )
    out = str(tmp_path / "out")
    # declared schema covers the DATA columns (partition col dropped)
    write_avro_fallback(df, out, partition_by=["day"], avro_schema=avro)
    back = read_avro_fallback(spark, out)
    assert sorted(map(tuple, back.collect())) == [
        ("CLUBS", 2), ("HEARTS", 1),
    ]


def test_widening_int_column_under_long_declaration(registered, tmp_path):
    spark = registered
    avro = _schema([{"name": "n", "type": "long"}])
    df = spark.createDataFrame(
        [(5,)], T.StructType([T.StructField("n", T.IntegerType(), False)])
    )
    out = str(tmp_path / "out")
    write_avro_fallback(df, out, avro_schema=avro)
    back = read_avro_fallback(spark, out)
    assert back.schema["n"].dataType == T.LongType()
    assert [r["n"] for r in back.collect()] == [5]


def test_plan_time_refusals():
    string_col = T.StructType([T.StructField("s", T.StringType(), False)])
    with pytest.raises(ValueError, match="must match the written data"):
        writer_plan_for_avro_schema(
            string_col, _schema([{"name": "other", "type": "string"}])
        )
    with pytest.raises(ValueError, match="BINARY column"):
        writer_plan_for_avro_schema(
            string_col, _schema([{"name": "s", "type": MAC}])
        )
    with pytest.raises(ValueError, match="STRING column"):
        writer_plan_for_avro_schema(
            T.StructType([T.StructField("s", T.LongType(), False)]),
            _schema([{"name": "s", "type": SUIT}]),
        )
    with pytest.raises(ValueError, match="declared non-nullable"):
        writer_plan_for_avro_schema(
            T.StructType([T.StructField("s", T.StringType(), True)]),
            _schema([{"name": "s", "type": SUIT}]),
        )
    with pytest.raises(ValueError, match="general union"):
        writer_plan_for_avro_schema(
            string_col,
            _schema([{"name": "s", "type": ["string", "long"]}]),
        )
    with pytest.raises(ValueError, match="precision/scale"):
        writer_plan_for_avro_schema(
            T.StructType([T.StructField("d", T.DecimalType(10, 2), False)]),
            _schema([{
                "name": "d",
                "type": {
                    "type": "bytes", "logicalType": "decimal",
                    "precision": 12, "scale": 2,
                },
            }]),
        )
    with pytest.raises(ValueError, match="cannot encode"):
        writer_plan_for_avro_schema(
            T.StructType([T.StructField("s", T.StringType(), False)]),
            _schema([{"name": "s", "type": "bytes"}]),
        )
    # r13 (ADVICE r12, adjudicated already-closed): a FIXED-backed
    # decimal whose fixed size cannot hold `precision` digits refuses
    # at PLAN time on the WRITE path too — the declared schema parses
    # through _tag_of_avro, whose capacity check (r11 review) fires
    # before any task could hit int.to_bytes OverflowError. Pinned
    # here so the write path keeps that guarantee: decimal(10,2)
    # needs a 5-byte two's complement (fixed(4) holds 9 digits).
    undersized = {
        "type": "fixed", "name": "dfx", "size": 4,
        "logicalType": "decimal", "precision": 10, "scale": 2,
    }
    with pytest.raises(
        NotImplementedError, match="cannot fit in fixed"
    ):
        writer_plan_for_avro_schema(
            T.StructType([T.StructField("d", T.DecimalType(10, 2), False)]),
            _schema([{"name": "d", "type": undersized}]),
        )
    # The exact-size fixed still plans fine.
    writer_plan_for_avro_schema(
        T.StructType([T.StructField("d", T.DecimalType(10, 2), False)]),
        _schema([{"name": "d", "type": dict(undersized, size=5)}]),
    )


def test_encode_time_refusals():
    avro = _schema([
        {"name": "suit", "type": SUIT},
        {"name": "mac", "type": MAC},
    ])
    spark_schema = T.StructType([
        T.StructField("suit", T.StringType(), False),
        T.StructField("mac", T.BinaryType(), False),
    ])
    plan = writer_plan_for_avro_schema(spark_schema, avro)
    with pytest.raises(ValueError, match="not a symbol of enum"):
        write_container(
            [("JOKERS", b"\x00\x00")], plan, avro, io.BytesIO()
        )
    with pytest.raises(ValueError, match="exactly 2 bytes"):
        write_container(
            [("HEARTS", b"\x00\x00\x00")], plan, avro, io.BytesIO()
        )


def test_datasource_write_read_seeded_random_schemas(registered, tmp_path):
    """Seeded randomized DataSource write → fallback read equality (the
    e2e hop the pure-python fuzz can't cover: task staging, commit
    protocol, Arrow row transfer). Three seeds, mixed declared
    enum/fixed/plain fields, nullable at random."""
    import random

    spark = registered
    for seed in (7, 21, 99):
        rng = random.Random(seed)
        sfields, afields, cols = [], [], []
        for i in range(rng.randint(1, 4)):
            kind = rng.choice(["enum", "fixed", "long", "string"])
            nullable = rng.random() < 0.5
            if kind == "enum":
                syms = [f"S{seed}_{i}_{k}" for k in range(rng.randint(1, 5))]
                atype = {"type": "enum", "name": f"E{i}", "symbols": syms}
                stype = T.StringType()
                gen = lambda syms=syms, rng=rng: rng.choice(syms)
            elif kind == "fixed":
                size = rng.randint(0, 5)
                atype = {"type": "fixed", "name": f"F{i}", "size": size}
                stype = T.BinaryType()
                gen = lambda size=size, rng=rng: bytes(
                    rng.randrange(256) for _ in range(size)
                )
            elif kind == "long":
                atype, stype = "long", T.LongType()
                gen = lambda rng=rng: rng.randint(-(2**62), 2**62)
            else:
                atype, stype = "string", T.StringType()
                gen = lambda rng=rng: "".join(
                    rng.choice("abc xyz'é") for _ in range(rng.randint(0, 7))
                )
            if nullable:
                atype = ["null", atype]
                base = gen
                gen = lambda base=base, rng=rng: (
                    None if rng.random() < 0.3 else base()
                )
            sfields.append(T.StructField(f"c{i}", stype, nullable))
            afields.append({"name": f"c{i}", "type": atype})
            cols.append(gen)
        rows = [tuple(g() for g in cols) for _ in range(rng.randint(1, 12))]
        df = spark.createDataFrame(rows, T.StructType(sfields))
        out = str(tmp_path / f"out_{seed}")
        (
            df.write.format("avro_fallback")
            .option("avroSchema", json.dumps(
                {"type": "record", "name": "r", "fields": afields}
            ))
            .mode("overwrite")
            .save(out)
        )
        back = spark.read.format("avro_fallback").load(out)
        assert sorted(map(tuple, back.collect()), key=repr) == sorted(
            rows, key=repr
        ), f"seed {seed}"
