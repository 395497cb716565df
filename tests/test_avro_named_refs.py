"""Named-type REFERENCES in the avro fallback (r10, third pass).

Java-generated schemas routinely define a record/enum/fixed once and
reference it by name afterwards ("type": "com.x.Suit"); the fallback
refused every such schema. Non-recursive references now INLINE at the
schema boundary (`inline_named_types`) so the rest of the module keeps
seeing reference-free schemas; RECURSIVE references (a record reaching
itself) still refuse — a recursive value has no finite Spark schema.

Spec provenance (Avro 1.12 §Names): a named type may be referenced by
its fullname (namespace.name) anywhere after its definition, or by its
bare name from within the same namespace; nested definitions inherit
the enclosing namespace.
"""

from __future__ import annotations

import io

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _field_plan,
    _parse_avro_type,
    inline_named_types,
    read_container,
    write_container,
    encode_long,
)

try:
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    pytest.skip("pyspark required", allow_module_level=True)


def test_enum_defined_once_referenced_again():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "enum", "name": "Suit",
                    "symbols": ["S", "H"],
                },
            },
            {"name": "b", "type": "Suit"},  # bare-name reference
        ],
    }
    inlined = inline_named_types(schema)
    ta, _ = _parse_avro_type(inlined["fields"][0]["type"], "a")
    tb, _ = _parse_avro_type(inlined["fields"][1]["type"], "b")
    assert ta == tb == ("enum", "Suit", ("S", "H"), None)


def test_record_reference_inside_array_and_union():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {
                "name": "first",
                "type": {
                    "type": "record", "name": "Point",
                    "fields": [
                        {"name": "x", "type": "long"},
                        {"name": "y", "type": "long"},
                    ],
                },
            },
            {"name": "rest", "type": {"type": "array", "items": "Point"}},
            {"name": "maybe", "type": ["null", "Point"], "default": None},
        ],
    }
    inlined = inline_named_types(schema)
    # all three positions parse to the same record tag
    t1, _ = _parse_avro_type(inlined["fields"][0]["type"], "f")
    t2, _ = _parse_avro_type(inlined["fields"][1]["type"], "f")
    t3, n3 = _parse_avro_type(inlined["fields"][2]["type"], "f")
    assert t2 == ("array", t1, False)
    assert t3 == t1 and n3

    # and real bytes decode through the reference positions
    rows = [
        # first=(1,2); rest=[(3,4)]; maybe=null
        encode_long(1) + encode_long(2)
        + encode_long(1) + encode_long(3) + encode_long(4) + encode_long(0)
        + encode_long(0),
    ]
    sync = b"\x5a" * 16
    hdr = io.BytesIO()
    write_container(iter([]), [], schema, hdr, sync=sync)
    payload = b"".join(rows)
    data = (
        hdr.getvalue()
        + encode_long(1) + encode_long(len(payload)) + payload + sync
    )
    _, got = read_container(io.BytesIO(data))
    assert got == [((1, 2), [(3, 4)], None)]


def test_namespace_fullname_and_bare_reference():
    schema = {
        "type": "record",
        "name": "r",
        "namespace": "com.x",
        "fields": [
            {
                "name": "a",
                "type": {
                    "type": "fixed", "name": "md5", "size": 4,
                },  # inherits com.x -> fullname com.x.md5
            },
            {"name": "b", "type": "com.x.md5"},  # fullname reference
            {"name": "c", "type": "md5"},        # bare, same namespace
        ],
    }
    inlined = inline_named_types(schema)
    tags = [
        _parse_avro_type(f["type"], f["name"])[0]
        for f in inlined["fields"]
    ]
    assert tags[0] == tags[1] == tags[2]
    assert tags[0][0] == "fixed" and tags[0][1] == 4


def test_recursive_schema_refused():
    schema = {
        "type": "record",
        "name": "Node",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Node"], "default": None},
        ],
    }
    with pytest.raises(NotImplementedError, match="recursive"):
        inline_named_types(schema)


def test_unknown_reference_still_refuses():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "NeverDefined"}],
    }
    inlined = inline_named_types(schema)  # passes through unknown names
    with pytest.raises(NotImplementedError, match="named-type"):
        _parse_avro_type(inlined["fields"][0]["type"], "a")


def test_reference_through_container_read(tmp_path):
    """End-to-end: a foreign-style writer schema with an enum reference
    reads through read_container (the boundary where inlining hooks)."""
    fields = [
        {
            "name": "s1",
            "type": {"type": "enum", "name": "E", "symbols": ["A", "B"]},
        },
        {"name": "s2", "type": "E"},
    ]
    schema = {"type": "record", "name": "r", "fields": fields}
    sync = b"\x5a" * 16
    hdr = io.BytesIO()
    write_container(iter([]), [], schema, hdr, sync=sync)
    payload = encode_long(0) + encode_long(1)  # A, B
    data = (
        hdr.getvalue()
        + encode_long(1) + encode_long(len(payload)) + payload + sync
    )
    _, got = read_container(io.BytesIO(data))
    assert got == [("A", "B")]


def test_ambiguous_bare_name_refused_fullname_works():
    """Two namespaces defining the same bare name: a bare reference is
    ambiguous and refuses; fullname references stay precise."""
    def schema(ref):
        return {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "a", "type": {
                    "type": "fixed", "name": "h", "size": 4,
                    "namespace": "x"}},
                {"name": "b", "type": {
                    "type": "fixed", "name": "h", "size": 8,
                    "namespace": "y"}},
                {"name": "c", "type": ref},
            ],
        }

    inlined = inline_named_types(schema("y.h"))
    t, _ = _parse_avro_type(inlined["fields"][2]["type"], "c")
    assert t[1] == 8  # picked the y.h definition
    with pytest.raises(NotImplementedError, match="ambiguous"):
        inline_named_types(schema("h"))


def test_nested_record_sharing_bare_name_does_not_mask_recursion():
    """r10 review probe: outer record "X" containing nested "ns2.X" —
    closing the nested record must not clobber the OUTER record's
    recursion sentinel, or a bare self-reference resolves to ns2.X and
    spec-correct recursive data mis-decodes silently."""
    schema = {
        "type": "record",
        "name": "X",
        "fields": [
            {
                "name": "inner",
                "type": {
                    "type": "record", "name": "X", "namespace": "ns2",
                    "fields": [{"name": "v", "type": "long"}],
                },
            },
            {"name": "self", "type": ["null", "X"], "default": None},
        ],
    }
    with pytest.raises(NotImplementedError, match="recursive"):
        inline_named_types(schema)


def test_fullname_spellings_normalize_equal():
    """Spec §Names: {"name": "com.x.Suit"} and {"name": "Suit",
    "namespace": "com.x"} are the SAME type — after inlining both
    normalize to the fullname spelling, so enum/fixed resolution
    between two generators' spellings agrees (r10 review probe)."""
    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _resolution_plan,
    )

    def rec(enum):
        return {"type": "record", "name": "r",
                "fields": [{"name": "s", "type": enum}]}

    w = inline_named_types(rec(
        {"type": "enum", "name": "com.x.Suit", "symbols": ["A", "B"]}
    ))
    r = inline_named_types(rec(
        {"type": "enum", "name": "Suit", "namespace": "com.x",
         "symbols": ["A", "B"]}
    ))
    assert w["fields"][0]["type"]["name"] == "com.x.Suit"
    assert r["fields"][0]["type"]["name"] == "com.x.Suit"
    actions, _ = _resolution_plan(w, r)  # must not refuse
    assert actions[0][0] == "read"


def test_null_second_union_decodes_with_correct_branch_indices():
    """["long", "null"] is spec-legal and wire-DIFFERENT from the
    null-first form (branch 0 is the VALUE): decoded via the general-
    union tag, which reads its own index — the r10 review probe showed
    the classic null-first fast path would decode branch 0 as null and
    desync the stream silently."""
    tag, nullable = _parse_avro_type(["long", "null"], "f")
    assert tag == ("union", ("long", None), (0,)) and nullable
    import io as _io

    from tutorial_apache_beam_spark.sources.avro_fallback import (
        _decode_value,
        _value_converter,
    )

    assert _decode_value(tag, _io.BytesIO(encode_long(0) + encode_long(42))) == 42
    assert _decode_value(tag, _io.BytesIO(encode_long(1))) is None
    # resolution: identical spelling resolves; since r11 the REORDERED
    # spelling resolves too (same member layout → identity converter;
    # spec union case 1, tests/test_avro_union_resolution.py)
    assert _value_converter(["long", "null"], ["long", "null"], "f") is None
    assert _value_converter(["long", "null"], ["null", "long"], "f") is None
