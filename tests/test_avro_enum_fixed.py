"""Enum and fixed READ support in the avro fallback (r10, second pass).

Foreign writers (Java Avro) use enum and fixed routinely; refusing them
was the biggest remaining wall on the no-JAR read path after r10's
nested composites. Both are read-only: Spark has no enum/fixed types,
so the WRITER never emits them (strings encode as avro strings, binary
as variable-length bytes) — the fallback maps enum → string and
fixed → binary on read, exactly as spark-avro does.

Spec provenance (Avro 1.12):
- enum wire form: "an int, representing the zero-based position of the
  symbol in the schema" — pinned as golden bytes below;
- fixed wire form: "a number of bytes declared in the schema";
- enum resolution: "if the writer's symbol is not present in the
  reader's enum and the reader has a default value, then that value is
  used, otherwise an error is signalled";
- fixed resolution requires matching name and size.
"""

from __future__ import annotations

import io

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _decode_value,
    _default_value,
    _parse_avro_type,
    _tag_to_spark,
    _value_converter,
    encode_long,
    read_container,
    write_container,
)

try:
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    pytest.skip("pyspark required", allow_module_level=True)


ENUM_T = {"type": "enum", "name": "Suit", "symbols": ["S", "H", "D", "C"]}
FIXED_T = {"type": "fixed", "name": "md5", "size": 4}


def test_enum_golden_wire_form():
    """Spec: enum value = zero-based symbol index as an int (zigzag)."""
    tag, nullable = _parse_avro_type(ENUM_T, "f")
    assert tag == ("enum", "Suit", ("S", "H", "D", "C"), None)
    assert not nullable
    assert _decode_value(tag, io.BytesIO(encode_long(0))) == "S"
    assert _decode_value(tag, io.BytesIO(encode_long(3))) == "C"
    with pytest.raises(ValueError, match="out of range"):
        _decode_value(tag, io.BytesIO(encode_long(4)))


def test_fixed_golden_wire_form():
    tag, _ = _parse_avro_type(FIXED_T, "f")
    assert tag == ("fixed", 4, "md5")
    assert _decode_value(tag, io.BytesIO(b"\x01\x02\x03\x04")) == (
        b"\x01\x02\x03\x04"
    )
    with pytest.raises(EOFError):
        _decode_value(tag, io.BytesIO(b"\x01\x02"))


def test_enum_fixed_map_to_spark_string_binary():
    assert _tag_to_spark(("enum", "X", ("A",), None)) == T.StringType()
    assert _tag_to_spark(("fixed", 16, "md5")) == T.BinaryType()


def _hand_container(fields, encoded_rows, sync=b"\x5a" * 16):
    """Build a container with hand-encoded row payloads — the writer
    can't emit enum/fixed (read-only types), so tests forge the bytes
    a Java writer would produce."""
    import json

    schema = {"type": "record", "name": "r", "fields": fields}
    hdr = io.BytesIO()
    # reuse the real writer for the header by writing 0 rows, then
    # splice our block in
    write_container(iter([]), [], schema, hdr, sync=sync)
    payload = b"".join(encoded_rows)
    block = (
        encode_long(len(encoded_rows)) + encode_long(len(payload))
        + payload + sync
    )
    return hdr.getvalue() + block


def test_enum_and_fixed_read_through_container():
    fields = [
        {"name": "suit", "type": ENUM_T},
        {"name": "digest", "type": FIXED_T},
        {"name": "maybe", "type": ["null", ENUM_T]},
    ]
    rows = [
        encode_long(1) + b"\xaa\xbb\xcc\xdd" + encode_long(0),
        encode_long(2) + b"\x00\x11\x22\x33" + encode_long(1)
        + encode_long(3),
    ]
    data = _hand_container(fields, rows)
    _, got = read_container(io.BytesIO(data))
    assert got == [
        ("H", b"\xaa\xbb\xcc\xdd", None),
        ("D", b"\x00\x11\x22\x33", "C"),
    ]


def test_enum_resolution_symbol_subset_and_default():
    """Spec: writer symbol absent from the reader enum uses the reader's
    enum default; without one, error."""
    writer = dict(ENUM_T)
    reader = {
        "type": "enum",
        "name": "Suit",
        "symbols": ["S", "H"],
        "default": "S",
    }
    conv = _value_converter(writer, reader, "suit")
    assert conv("H") == "H"
    assert conv("D") == "S"  # not in reader -> enum default
    # same symbols, no conversion needed
    assert _value_converter(writer, dict(ENUM_T), "suit") is None
    # no default: plan-time refusal (loud, not first-bad-row)
    reader_nodefault = {
        "type": "enum", "name": "Suit", "symbols": ["S", "H"],
    }
    with pytest.raises(ValueError, match="default"):
        _value_converter(writer, reader_nodefault, "suit")


def test_enum_resolution_requires_matching_name():
    other = {"type": "enum", "name": "Other", "symbols": ["S", "H", "D", "C"]}
    with pytest.raises(ValueError, match="name"):
        _value_converter(ENUM_T, other, "suit")


def test_fixed_resolution_requires_name_and_size():
    assert _value_converter(FIXED_T, dict(FIXED_T), "d") is None
    with pytest.raises(ValueError, match="size"):
        _value_converter(
            FIXED_T, {"type": "fixed", "name": "md5", "size": 8}, "d"
        )
    with pytest.raises(ValueError, match="name"):
        _value_converter(
            FIXED_T, {"type": "fixed", "name": "sha", "size": 4}, "d"
        )


def test_enum_fixed_defaults():
    etag, _ = _parse_avro_type(ENUM_T, "d")
    assert _default_value(etag, "H") == "H"
    ftag, _ = _parse_avro_type(FIXED_T, "d")
    # fixed defaults are JSON strings, code points 0-255 = byte values
    assert _default_value(ftag, "\u00ff\u0000AB") == b"\xff\x00AB"


def test_enum_inside_array_reads():
    """Composites compose: array<enum> decodes through the same block
    framing as any array."""
    fields = [
        {"name": "suits", "type": {"type": "array", "items": ENUM_T}},
    ]
    rows = [
        encode_long(2) + encode_long(0) + encode_long(2) + encode_long(0),
    ]
    data = _hand_container(fields, rows)
    _, got = read_container(io.BytesIO(data))
    assert got == [(["S", "D"],)]
