"""Spec-pinned schema-resolution matrix (r10, VERDICT r9 item 6).

The preferred differential target — DuckDB's `read_avro` extension —
cannot be installed in this sandbox (verified this round:
`INSTALL avro` fails with "Failed to download extension ... avro";
only arrow/azure/parquet/autocomplete/vss ship locally), and no
spark-avro jar or Python avro/fastavro package exists here either.
Per the task's own fallback, this file pins the Avro 1.12 spec's
§Schema Resolution text DIRECTLY, as an exhaustive matrix rather than
hand-picked cases:

1. the full primitive promotion matrix — resolution succeeds for
   EXACTLY the spec's promotion list and fails for every other ordered
   pair, value-checked through real container bytes, not just plans;
2. the spec's field-matching rules (reader order, match by name,
   writer-only skipped, reader-only defaulted-or-error);
3. the spec's default-value JSON mapping (bytes defaults are JSON
   strings with code points 0-255 ↔ unsigned byte values).

If a future environment has fastavro/DuckDB-avro, these same fixtures
are the differential corpus to replay against it.
"""

from __future__ import annotations

import io

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _default_value,
    _resolution_plan,
    read_container,
    write_container,
)

# Spec §Schema Resolution: "the writer's schema may be promoted to the
# reader's as follows: int is promotable to long, float, or double;
# long is promotable to float or double; float is promotable to
# double; string is promotable to bytes; bytes is promotable to
# string." Everything else (boolean included) must match exactly.
PRIMS = ("boolean", "int", "long", "float", "double", "string", "bytes")
SPEC_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"),
    ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}

# One writer value per primitive and the exact reader value the spec's
# promotion produces.
WRITE_VALUES = {
    "boolean": True,
    "int": -7,
    "long": 2**40,
    "float": 1.5,  # exactly representable: float->double is value-exact
    "double": -2.25,
    "string": "héllo",
    "bytes": b"\x00\xff",
}
EXPECTED = {
    ("int", "long"): -7,
    ("int", "float"): -7.0,
    ("int", "double"): -7.0,
    ("long", "float"): float(2**40),
    ("long", "double"): float(2**40),
    ("float", "double"): 1.5,
    ("string", "bytes"): "héllo".encode("utf-8"),
    ("bytes", "string"): None,  # \x00\xff is not valid utf-8 — see test
}


def _record(tag):
    return {
        "type": "record",
        "name": "r",
        "fields": [{"name": "v", "type": tag}],
    }


def _roundtrip(wtag, rtag, value):
    fh = io.BytesIO()
    write_container(
        iter([(value,)]), [("v", wtag, False)], _record(wtag), fh
    )
    fh.seek(0)
    _, rows = read_container(fh, reader_schema=_record(rtag))
    return rows[0][0]


def test_full_promotion_matrix_matches_spec_exactly():
    """Every ordered primitive pair resolves iff the spec says so —
    49 combinations, no hand-picking."""
    for w in PRIMS:
        for r in PRIMS:
            should = w == r or (w, r) in SPEC_PROMOTIONS
            try:
                _resolution_plan(_record(w), _record(r))
                ok = True
            except ValueError:
                ok = False
            assert ok == should, (
                f"{w} -> {r}: spec says {'promotes' if should else 'refuses'}"
            )


def test_promoted_values_through_real_bytes():
    for (w, r), want in EXPECTED.items():
        if want is None:
            continue
        got = _roundtrip(w, r, WRITE_VALUES[w])
        assert got == want and type(got) is type(want), (w, r, got)


def test_bytes_to_string_is_utf8_decode():
    """The spec's bytes→string promotion re-interprets the bytes as
    utf-8 text; non-utf-8 payloads must error, not silently mangle."""
    assert _roundtrip("bytes", "string", "ok".encode()) == "ok"
    with pytest.raises(UnicodeDecodeError):
        _roundtrip("bytes", "string", b"\x00\xff")


def test_reader_field_order_governs_output():
    """Spec: 'the ordering of fields may be different: fields are
    matched by name' — a reader that reverses the writer's field order
    gets values by NAME, in READER order."""
    writer = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "b", "type": "string"},
            {"name": "a", "type": "long"},
        ],
    }
    fh = io.BytesIO()
    write_container(
        iter([(1, "x"), (2, "y")]),
        [("a", "long", False), ("b", "string", False)],
        writer,
        fh,
    )
    fh.seek(0)
    _, rows = read_container(fh, reader_schema=reader)
    assert rows == [("x", 1), ("y", 2)]


def test_writer_only_ignored_reader_only_defaulted_or_error():
    """Spec: 'if the writer's record contains a field with a name not
    present in the reader's record, the writer's value for that field
    is ignored'; 'if the reader's record schema has a field that
    contains no default value, and writer's schema does not have a
    field with the same name, an error is signalled.'"""
    writer = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "keep", "type": "long"},
            {"name": "gone", "type": "string"},
        ],
    }
    reader_ok = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "keep", "type": "long"},
            {"name": "added", "type": "long", "default": 5},
        ],
    }
    fh = io.BytesIO()
    write_container(
        iter([(9, "zzz")]),
        [("keep", "long", False), ("gone", "string", False)],
        writer,
        fh,
    )
    fh.seek(0)
    _, rows = read_container(fh, reader_schema=reader_ok)
    assert rows == [(9, 5)]

    reader_err = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "keep", "type": "long"},
            {"name": "added", "type": "long"},  # no default
        ],
    }
    with pytest.raises(ValueError, match="declares no default"):
        _resolution_plan(writer, reader_err)


def test_bytes_default_is_latin1_json_string():
    """Spec §Schema Declarations default-value table: bytes defaults
    are JSON strings 'where Unicode code points 0-255 are mapped to
    unsigned 8-bit byte values 0-255'."""
    assert _default_value("bytes", "\u00ff\u0000A") == b"\xff\x00A"


def test_union_default_uses_first_branch():
    """Spec: '(u)nion ... default values correspond to the first schema
    of the union' — this module's ["null", T] fields therefore default
    from JSON null to None, and a non-null default on such a field is
    the T branch only when the union is reordered ([T, "null"]),
    which the writer never emits but the reader may present."""
    writer = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
        ],
    }
    _, template = _resolution_plan(writer, reader)
    assert template == [None, None]
