"""Decimal and millis/local-timestamp logical types in the avro fallback
(r11, VERDICT r10 item 2) — the most common Java-produced interchange
types were the first wall on the no-JAR read path after r10.

Spec provenance (Avro 1.12 §Logical Types):
- decimal: "a byte array containing the two's-complement representation
  of the unscaled integer value in big-endian byte order", over bytes or
  fixed; "for the purposes of schema resolution, two schemas that are
  decimal logical types match if their scales and precisions match";
  scale "must be zero or a positive integer less than or equal to the
  precision";
- timestamp-millis: "number of milliseconds from 1 January 1970
  00:00:00.000 UTC" on long;
- local-timestamp-millis/micros: same counts "from 1 January 1970
  00:00:00.000" in LOCAL time (no zone) — Spark's TimestampNTZType.

Golden wire bytes below are derived from the spec's two's-complement
rule by hand (1234 = 0x04D2; -1234 = 0xFB2E in 16 bits), so the codec is
verified against the SPEC, not against this module's own reader.
"""

from __future__ import annotations

import io
import json
from datetime import datetime
from decimal import Decimal

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _decode_value,
    _default_value,
    _encode_value,
    _parse_avro_type,
    _tag_to_spark,
    _value_converter,
    encode_long,
    read_avro_fallback,
    read_container,
    write_avro_fallback,
    write_container,
)

try:
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    pytest.skip("pyspark required", allow_module_level=True)


DEC_BYTES_T = {
    "type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2,
}
DEC_FIXED_T = {
    "type": "fixed", "name": "amount", "size": 4,
    "logicalType": "decimal", "precision": 9, "scale": 2,
}
TS_MILLIS_T = {"type": "long", "logicalType": "timestamp-millis"}
LTS_MICROS_T = {"type": "long", "logicalType": "local-timestamp-micros"}
LTS_MILLIS_T = {"type": "long", "logicalType": "local-timestamp-millis"}


def test_parse_tags_and_spark_mapping():
    tag, nullable = _parse_avro_type(DEC_BYTES_T, "f")
    assert tag == ("decimal", 10, 2, "bytes") and not nullable
    assert _tag_to_spark(tag) == T.DecimalType(10, 2)

    tag, _ = _parse_avro_type(DEC_FIXED_T, "f")
    assert tag == ("decimal", 9, 2, 4)
    assert _tag_to_spark(tag) == T.DecimalType(9, 2)

    # scale defaults to 0 per spec
    tag, _ = _parse_avro_type(
        {"type": "bytes", "logicalType": "decimal", "precision": 5}, "f"
    )
    assert tag == ("decimal", 5, 0, "bytes")

    assert _tag_to_spark("timestamp-millis") == T.TimestampType()
    assert _tag_to_spark("local-timestamp-micros") == T.TimestampNTZType()
    assert _tag_to_spark("local-timestamp-millis") == T.TimestampNTZType()
    assert _parse_avro_type(TS_MILLIS_T, "f")[0] == "timestamp-millis"
    assert _parse_avro_type(LTS_MICROS_T, "f")[0] == "local-timestamp-micros"
    assert _parse_avro_type(LTS_MILLIS_T, "f")[0] == "local-timestamp-millis"


def test_decimal_golden_wire_bytes():
    """1234 → 0x04D2, -1234 → 0xFB2E (two's complement, big-endian,
    minimal length), bytes form length-prefixed, fixed form padded."""
    btag = ("decimal", 10, 2, "bytes")
    out = bytearray()
    _encode_value(btag, Decimal("12.34"), out)
    assert bytes(out) == encode_long(2) + b"\x04\xd2"
    assert _decode_value(btag, io.BytesIO(bytes(out))) == Decimal("12.34")

    out = bytearray()
    _encode_value(btag, Decimal("-12.34"), out)
    assert bytes(out) == encode_long(2) + b"\xfb\x2e"
    assert _decode_value(btag, io.BytesIO(bytes(out))) == Decimal("-12.34")

    out = bytearray()
    _encode_value(btag, Decimal("0.00"), out)
    assert bytes(out) == encode_long(1) + b"\x00"

    # fixed(4): sign-extended to the declared width (a Java writer pads)
    ftag = ("decimal", 9, 2, 4)
    assert _decode_value(
        ftag, io.BytesIO(b"\x00\x00\x04\xd2")
    ) == Decimal("12.34")
    assert _decode_value(
        ftag, io.BytesIO(b"\xff\xff\xfb\x2e")
    ) == Decimal("-12.34")
    out = bytearray()
    _encode_value(ftag, Decimal("12.34"), out)
    assert bytes(out) == b"\x00\x00\x04\xd2"

    # non-minimal bytes decode fine (the spec only fixes the value)
    assert _decode_value(
        btag, io.BytesIO(encode_long(3) + b"\x00\x04\xd2")
    ) == Decimal("12.34")

    with pytest.raises(EOFError, match="truncated avro decimal"):
        _decode_value(btag, io.BytesIO(encode_long(2) + b"\x04"))
    with pytest.raises(ValueError, match="does not fit scale"):
        _encode_value(btag, Decimal("1.234"), bytearray())
    with pytest.raises(ValueError, match="exceeds declared precision"):
        _encode_value(
            ("decimal", 3, 2, "bytes"), Decimal("12.34"), bytearray()
        )


def test_decimal_38_digits_survive_default_context():
    """r11 review: Decimal.scaleb under Python's DEFAULT 28-digit
    context silently rounds wider decimals on encode AND decode; the
    codec pins an explicit wide context. 38 significant digits (Spark's
    bound) must round-trip bit-exactly."""
    tag = ("decimal", 38, 2, "bytes")
    v = Decimal("123456789012345678901234567890123456.78")
    out = bytearray()
    _encode_value(tag, v, out)
    got = _decode_value(tag, io.BytesIO(bytes(out)))
    assert got == v and str(got) == str(v)
    # and through a reader-field default (the third scaleb site)
    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _default_value,
    )

    unscaled = 12345678901234567890123456789012345678
    n = (unscaled.bit_length() + 8) // 8
    raw = unscaled.to_bytes(n, "big", signed=True)
    assert _default_value(tag, raw.decode("latin-1")) == v


def test_fixed_decimal_capacity_matches_spec_bound():
    """Spec: max precision for fixed(n) = floor(log10(2^(8n-1)-1)) —
    fixed(1) holds 2 digits (127), not 3 (r11 review off-by-one)."""
    ok = {
        "type": "fixed", "name": "f", "size": 1,
        "logicalType": "decimal", "precision": 2,
    }
    assert _parse_avro_type(ok, "f")[0] == ("decimal", 2, 0, 1)
    bad = dict(ok, precision=3)
    with pytest.raises(NotImplementedError, match="cannot fit in fixed"):
        _parse_avro_type(bad, "f")
    # fixed(16): 38 ok (spec bound), 39 > Spark bound anyway
    ok16 = {
        "type": "fixed", "name": "g", "size": 16,
        "logicalType": "decimal", "precision": 38,
    }
    assert _parse_avro_type(ok16, "f")[0] == ("decimal", 38, 0, 16)


def test_timestamp_millis_and_local_golden_decode():
    wire = encode_long(1_700_000_000_123)
    got = _decode_value("timestamp-millis", io.BytesIO(wire))
    assert got == datetime(2023, 11, 14, 22, 13, 20, 123_000)
    got = _decode_value("local-timestamp-millis", io.BytesIO(wire))
    assert got == datetime(2023, 11, 14, 22, 13, 20, 123_000)
    wire = encode_long(1_700_000_000_123_456)
    got = _decode_value("local-timestamp-micros", io.BytesIO(wire))
    assert got == datetime(2023, 11, 14, 22, 13, 20, 123_456)


def test_invalid_decimal_attrs_refused():
    for frag, msg in [
        ({"type": "bytes", "logicalType": "decimal"}, "invalid precision"),
        (
            {"type": "bytes", "logicalType": "decimal", "precision": 0},
            "invalid precision",
        ),
        (
            {
                "type": "bytes", "logicalType": "decimal",
                "precision": 4, "scale": 5,
            },
            "invalid precision/scale",
        ),
        (
            {
                "type": "bytes", "logicalType": "decimal",
                "precision": 4, "scale": -1,
            },
            "invalid precision/scale",
        ),
        (
            {"type": "bytes", "logicalType": "decimal", "precision": 39},
            "DecimalType bound",
        ),
        (
            {"type": "string", "logicalType": "decimal", "precision": 4},
            "bytes or fixed only",
        ),
        (
            {
                "type": "fixed", "name": "f", "size": 1,
                "logicalType": "decimal", "precision": 10,
            },
            "cannot fit in fixed",
        ),
    ]:
        with pytest.raises(NotImplementedError, match=msg):
            _parse_avro_type(frag, "field 'x'")


def test_time_of_day_still_refused():
    for lt, base in (("time-millis", "int"), ("time-micros", "long")):
        with pytest.raises(NotImplementedError, match=lt):
            _parse_avro_type({"type": base, "logicalType": lt}, "f")


def _hand_container(fields, encoded_rows, sync=b"\x5a" * 16):
    """Forge the container a Java writer would produce (header via the
    real writer at 0 rows, block payload hand-encoded)."""
    schema = {"type": "record", "name": "r", "fields": fields}
    hdr = io.BytesIO()
    write_container(iter([]), [], schema, hdr, sync=sync)
    payload = b"".join(encoded_rows)
    block = (
        encode_long(len(encoded_rows)) + encode_long(len(payload))
        + payload + sync
    )
    return hdr.getvalue() + block


def test_java_logicals_read_through_container():
    fields = [
        {"name": "ts", "type": TS_MILLIS_T},
        {"name": "amount", "type": DEC_FIXED_T},
        {"name": "maybe_d", "type": ["null", DEC_BYTES_T]},
        {"name": "lts", "type": LTS_MICROS_T},
    ]
    rows = [
        encode_long(86_400_000)                    # 1970-01-02 00:00
        + b"\x00\x00\x04\xd2"                      # 12.34
        + encode_long(0)                           # null
        + encode_long(1_000_000),                  # 00:00:01 local
        encode_long(0)
        + b"\xff\xff\xfb\x2e"                      # -12.34
        + encode_long(1) + encode_long(1) + b"\x7f"  # 1.27
        + encode_long(0),
    ]
    data = _hand_container(fields, rows)
    _, got = read_container(io.BytesIO(data))
    assert got == [
        (
            datetime(1970, 1, 2), Decimal("12.34"), None,
            datetime(1970, 1, 1, 0, 0, 1),
        ),
        (
            datetime(1970, 1, 1), Decimal("-12.34"), Decimal("1.27"),
            datetime(1970, 1, 1),
        ),
    ]


def test_spark_roundtrip_decimal_and_ntz(spark, tmp_path):
    """Distributed e2e: DecimalType + TimestampNTZType columns write
    through the fallback and read back with types and values intact."""
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("d", T.DecimalType(10, 2), True),
        T.StructField("ts", T.TimestampNTZType(), True),
    ])
    rows = [
        (1, Decimal("12.34"), datetime(2024, 3, 1, 12, 30, 15, 123_456)),
        (2, Decimal("-0.07"), None),
        (3, None, datetime(1969, 12, 31, 23, 59, 59)),
    ]
    df = spark.createDataFrame(rows, schema)
    out = tmp_path / "dec.avro"
    write_avro_fallback(df, str(out))
    back = read_avro_fallback(spark, str(out))
    assert back.schema["d"].dataType == T.DecimalType(10, 2)
    assert back.schema["ts"].dataType == T.TimestampNTZType()
    got = sorted(
        (r["id"], r["d"], r["ts"]) for r in back.collect()
    )
    assert got == rows


def test_resolution_decimal_rules():
    # identical (p, s) across DIFFERENT underlying forms: identity
    assert _value_converter(DEC_FIXED_T, {
        "type": "bytes", "logicalType": "decimal",
        "precision": 9, "scale": 2,
    }, "amount") is None
    # precision or scale drift: spec defines no re-scaling promotion
    with pytest.raises(ValueError, match="precision/scale mismatch"):
        _value_converter(DEC_BYTES_T, {
            "type": "bytes", "logicalType": "decimal",
            "precision": 12, "scale": 2,
        }, "amount")
    with pytest.raises(ValueError, match="precision/scale mismatch"):
        _value_converter(DEC_BYTES_T, {
            "type": "bytes", "logicalType": "decimal",
            "precision": 10, "scale": 4,
        }, "amount")
    # decimal vs bare bytes, and millis vs micros: no promotion
    with pytest.raises(ValueError, match="no spec promotion"):
        _value_converter(DEC_BYTES_T, "bytes", "amount")
    with pytest.raises(ValueError, match="no spec promotion"):
        _value_converter(TS_MILLIS_T, {
            "type": "long", "logicalType": "timestamp-micros",
        }, "ts")
    with pytest.raises(ValueError, match="no spec promotion"):
        _value_converter(LTS_MICROS_T, {
            "type": "long", "logicalType": "timestamp-micros",
        }, "ts")


def test_decimal_and_millis_defaults():
    """Reader-only fields: decimal defaults ride the underlying
    bytes/fixed JSON-string form (code points 0-255 = byte values);
    timestamp defaults are the underlying long."""
    tag, _ = _parse_avro_type(DEC_BYTES_T, "f")
    assert _default_value(tag, "\x04\xd2") == Decimal("12.34")
    tag, _ = _parse_avro_type(DEC_FIXED_T, "f")
    assert _default_value(tag, "\xff\xff\xfb\x2e") == Decimal("-12.34")
    assert _default_value("timestamp-millis", 86_400_000) == datetime(
        1970, 1, 2
    )
    assert _default_value("local-timestamp-micros", 1_000_000) == datetime(
        1970, 1, 1, 0, 0, 1
    )


def test_drifted_tree_fills_decimal_default(spark, tmp_path):
    """Schema-evolution e2e: an old file without the decimal field reads
    under the widened schema with the declared decimal default."""
    old = T.StructType([T.StructField("id", T.LongType(), False)])
    df = spark.createDataFrame([(1,), (2,)], old)
    out = tmp_path / "tree"
    write_avro_fallback(df, str(out))
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "d", "type": DEC_BYTES_T, "default": "\x04\xd2"},
        ],
    }
    back = read_avro_fallback(spark, str(out), reader_schema=reader)
    assert sorted((r["id"], r["d"]) for r in back.collect()) == [
        (1, Decimal("12.34")), (2, Decimal("12.34")),
    ]
    assert json.loads(json.dumps(reader))  # reader schema stays JSON-able
