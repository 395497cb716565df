"""General Avro unions in the no-JAR fallback (r10, third pass).

READ-only, mapped exactly as spark-avro maps them:
- 2-branch unions with null in EITHER position → nullable T (the
  null-second form is wire-different — branch 0 is the value — and was
  previously refused);
- unions with several non-null branches → struct<member0, member1, …>
  over the non-null branches in declaration order, the selected member
  set and the others null; a null branch yields a NULL struct.

Spec provenance (Avro 1.12 §Unions / §Binary Encoding): "A union is
encoded by first writing an int value indicating the zero-based
position within the union of the schema of its value. The value is
then encoded per the indicated schema within the union."
"""

from __future__ import annotations

import io

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _decode_value,
    _default_value,
    _parse_avro_type,
    _tag_to_spark,
    encode_long,
    read_avro_fallback,
    read_container,
    write_container,
)

try:
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    pytest.skip("pyspark required", allow_module_level=True)


TRI = ["null", "long", "string"]  # the classic int-or-string-or-missing
WIDE = ["int", "string"]          # no null at all


def test_parse_shapes():
    tag, nullable = _parse_avro_type(TRI, "f")
    assert tag == ("union", (None, "long", "string"), (1, 2))
    assert nullable
    tag2, nullable2 = _parse_avro_type(WIDE, "f")
    assert tag2 == ("union", ("int", "string"), (0, 1))
    assert not nullable2
    # classic null-first 2-branch stays on the fast path (plain tag)
    tag3, nullable3 = _parse_avro_type(["null", "long"], "f")
    assert tag3 == "long" and nullable3


def test_golden_wire_decode_member_struct():
    tag, _ = _parse_avro_type(TRI, "f")
    # branch 0 = null
    assert _decode_value(tag, io.BytesIO(encode_long(0))) is None
    # branch 1 = long 7 -> (7, None)
    got = _decode_value(tag, io.BytesIO(encode_long(1) + encode_long(7)))
    assert got == (7, None)
    # branch 2 = string "hi" -> (None, "hi")
    wire = encode_long(2) + encode_long(2) + b"hi"
    assert _decode_value(tag, io.BytesIO(wire)) == (None, "hi")
    with pytest.raises(ValueError, match="out of range"):
        _decode_value(tag, io.BytesIO(encode_long(3)))


def test_spark_type_mapping():
    tag, _ = _parse_avro_type(TRI, "f")
    assert _tag_to_spark(tag) == T.StructType(
        [
            T.StructField("member0", T.LongType(), True),
            T.StructField("member1", T.StringType(), True),
        ]
    )
    tag2, _ = _parse_avro_type(["string", "null"], "f")
    assert _tag_to_spark(tag2) == T.StringType()


def test_union_defaults_follow_first_branch():
    tri_tag, _ = _parse_avro_type(TRI, "f")
    assert _default_value(tri_tag, None) is None
    with pytest.raises(ValueError, match="must be null"):
        _default_value(tri_tag, 7)
    wide_tag, _ = _parse_avro_type(WIDE, "f")
    assert _default_value(wide_tag, 5) == (5, None)
    ns_tag, _ = _parse_avro_type(["long", "null"], "f")
    assert _default_value(ns_tag, 9) == 9


def _container(fields, payload_rows, sync=b"\x5a" * 16):
    schema = {"type": "record", "name": "r", "fields": fields}
    hdr = io.BytesIO()
    write_container(iter([]), [], schema, hdr, sync=sync)
    payload = b"".join(payload_rows)
    return (
        hdr.getvalue()
        + encode_long(len(payload_rows))
        + encode_long(len(payload))
        + payload
        + sync
    )


def test_container_read_all_union_forms():
    fields = [
        {"name": "tri", "type": TRI},
        {"name": "ns", "type": ["long", "null"]},
        {"name": "wide", "type": WIDE},
    ]
    rows = [
        # tri=null, ns=42, wide=int 3
        encode_long(0) + encode_long(0) + encode_long(42)
        + encode_long(0) + encode_long(3),
        # tri=string "x", ns=null, wide=string "y"
        encode_long(2) + encode_long(1) + b"x"
        + encode_long(1)
        + encode_long(1) + encode_long(1) + b"y",
    ]
    data = _container(fields, rows)
    _, got = read_container(io.BytesIO(data))
    assert got == [
        (None, 42, (3, None)),
        ((None, "x"), None, (None, "y")),
    ]


def test_spark_end_to_end_union_read(spark, tmp_path):
    """The member-struct mapping survives the distributed read: values
    are addressable as member0/member1 columns, exactly like
    spark-avro output."""
    fields = [
        {"name": "id", "type": "long"},
        {"name": "v", "type": TRI},
    ]
    rows = [
        encode_long(1) + encode_long(1) + encode_long(70),
        encode_long(2) + encode_long(2) + encode_long(1) + b"z",
        encode_long(3) + encode_long(0),
    ]
    d = tmp_path / "u.avro"
    d.mkdir()
    (d / "part.avro").write_bytes(_container(fields, rows))
    back = read_avro_fallback(spark, str(d))
    got = {r["id"]: r["v"] for r in back.collect()}
    assert got[1].asDict() == {"member0": 70, "member1": None}
    assert got[2].asDict() == {"member0": None, "member1": "z"}
    assert got[3] is None


def test_union_skip_action_stays_aligned():
    """A writer-only general-union field must be decoded (to keep the
    stream aligned) and dropped — the null-branch fast path must NOT
    consume its index as a separate long (r10: _is_union guard)."""
    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _decode_container,
    )

    fields = [
        {"name": "gone", "type": TRI},
        {"name": "keep", "type": "long"},
    ]
    rows = [
        encode_long(1) + encode_long(5) + encode_long(11),
        encode_long(0) + encode_long(12),
    ]
    data = _container(fields, rows)
    reader = {
        "type": "record", "name": "r",
        "fields": [{"name": "keep", "type": "long"}],
    }
    _, recs = _decode_container(io.BytesIO(data), reader)
    assert list(recs) == [(11,), (12,)]


def test_union_resolution_surface():
    """r11 (VERDICT r10 item 3): union drift resolves per spec — the
    exhaustive treatment lives in tests/test_avro_union_resolution.py;
    this pins the three shapes the r10 refusal used to cover."""
    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _value_converter,
    )

    assert _value_converter(TRI, list(TRI), "f") is None
    # branch reorder: member slots remap
    conv = _value_converter(TRI, ["null", "string", "long"], "f")
    assert conv((7, None)) == (None, 7)
    assert conv((None, "hi")) == ("hi", None)
    assert conv(None) is None
    # writer union with null → non-nullable reader: still a loud plan
    # refusal (the null branch cannot land anywhere)
    with pytest.raises(ValueError, match="non-nullable"):
        _value_converter(TRI, "long", "f")
