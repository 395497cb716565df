"""General-union schema resolution per spec §Schema Resolution (r11,
VERDICT r10 item 3) — the three union cases, exhaustively:

- "if both are unions: the first schema in the reader's union that
  matches the selected writer's schema is recursively resolved against
  it. If none match, an error is signalled."
- "if reader's is a union, but writer's is not: the first schema in the
  reader's union that matches the writer's schema is recursively
  resolved against it. If none match, an error is signalled."
- "if writer's is a union, but reader's is not: if the reader's schema
  matches the selected writer's schema, it is recursively resolved
  against it. If they do not match, an error is signalled."

'Match' per the spec's preamble list: same primitive or a promotion,
records/enums/fixed on unqualified name, arrays/maps structurally.
Unmatched-branch errors are LAZY (fire on the first value of that
branch, like Java's resolver error action); a union no branch of which
can resolve refuses at plan time.
"""

from __future__ import annotations

import io

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _decode_container,
    _value_converter,
    encode_long,
    write_container,
)

try:
    from pyspark.sql import types as T  # noqa: F401
except ImportError:  # pragma: no cover
    pytest.skip("pyspark required", allow_module_level=True)


TRI = ["null", "long", "string"]


# --- union ↔ union -----------------------------------------------------------


def test_branch_reorder_remaps_member_slots():
    conv = _value_converter(TRI, ["null", "string", "long"], "f")
    assert conv((7, None)) == (None, 7)
    assert conv((None, "x")) == ("x", None)
    assert conv(None) is None


def test_null_position_only_change_is_identity():
    # ["null","long","string"] vs ["long","null","string"]: same member
    # layout, no conversion — the converter collapses to identity.
    assert _value_converter(TRI, ["long", "null", "string"], "f") is None
    # null-second 2-branch vs classic null-first: plain value either way
    assert _value_converter(["long", "null"], ["null", "long"], "f") is None
    assert _value_converter(["null", "long"], ["long", "null"], "f") is None


def test_reader_union_widened_by_new_branch():
    # reader adds a bytes branch: writer members keep resolving, slots
    # shift to the reader's member layout
    conv = _value_converter(TRI, ["null", "bytes", "long", "string"], "f")
    assert conv((7, None)) == (None, 7, None)
    assert conv((None, "x")) == (None, None, "x")


def test_writer_branch_promotes_into_reader_branch():
    # writer int branch matches reader's long branch via promotion
    conv = _value_converter(
        ["null", "int", "string"], ["null", "string", "long"], "f"
    )
    assert conv((5, None)) == (None, 5)
    # float → double with aligned slots collapses to identity (Python
    # floats already carry double width; no value-level work remains)
    assert _value_converter(
        ["float", "string"], ["double", "string"], "f"
    ) is None
    # exact match WINS over an earlier promotable branch (Java's
    # two-pass firstMatchingBranch): writer string lands in the reader
    # string branch even though a bytes branch precedes it
    conv = _value_converter(
        ["null", "string"], ["null", "bytes", "string"], "f"
    )
    assert conv("x") == (None, "x")


def test_dropped_branch_errors_lazily_per_value():
    # reader dropped the string branch: long values fine, string values
    # error with the branch named — but only when one appears
    conv = _value_converter(TRI, ["null", "long"], "f")
    assert conv((7, None)) == 7          # reader k=1 → plain value
    assert conv(None) is None
    with pytest.raises(ValueError, match="branch string matches no"):
        conv((None, "x"))


def test_union_with_no_resolvable_branch_refuses_at_plan():
    with pytest.raises(ValueError, match="no other writer branch"):
        _value_converter(["boolean", "string"], ["long", "double"], "f")


def test_record_branches_match_on_unqualified_name():
    wa = {"type": "record", "name": "com.x.A",
          "fields": [{"name": "v", "type": "int"}]}
    wb = {"type": "record", "name": "B",
          "fields": [{"name": "w", "type": "string"}]}
    # reader reorders the record branches and widens A.v to long
    ra = {"type": "record", "name": "A",
          "fields": [{"name": "v", "type": "long"}]}
    conv = _value_converter([wa, wb], [dict(wb), ra], "f")
    assert conv(((5,), None)) == (None, (5,))
    assert conv((None, ("s",))) == (("s",), None)
    # matched-by-name branches with INCOMPATIBLE fields propagate the
    # recursive error (no fallthrough to a later branch)
    ra_bad = {"type": "record", "name": "A",
              "fields": [{"name": "v", "type": "string"}]}
    with pytest.raises(ValueError, match="no spec promotion"):
        _value_converter([wa, wb], [ra_bad, dict(wb)], "f")


# --- writer nonunion → reader union -------------------------------------------


def test_nonunion_writer_promoted_into_reader_union():
    conv = _value_converter("int", ["null", "string", "long"], "f")
    assert conv(5) == (None, 5)
    # classic-nullable writer into a general reader union
    conv = _value_converter(["null", "int"], ["null", "string", "long"], "f")
    assert conv(5) == (None, 5)
    assert conv(None) is None
    # single-non-null reader union: plain value, converter is identity
    assert _value_converter("long", ["null", "long"], "f") is None
    with pytest.raises(ValueError, match="matches no reader branch"):
        _value_converter("boolean", ["long", "string"], "f")


# --- writer union → reader nonunion -------------------------------------------


def test_writer_union_collapsed_to_nonunion_reader():
    # no null branch in the writer → a plain reader type is legal
    conv = _value_converter(["int", "string"], "long", "f")
    assert conv((5, None)) == 5
    with pytest.raises(ValueError, match="branch string matches no"):
        conv((None, "x"))
    # with a writer null branch the plan refuses (nullable → non-null)
    with pytest.raises(ValueError, match="non-nullable"):
        _value_converter(TRI, "long", "f")
    # ...but a classic-nullable READER accepts it
    conv = _value_converter(["null", "long", "int"], ["null", "long"], "f")
    assert conv((7, None)) == 7
    assert conv((None, 3)) == 3
    assert conv(None) is None


# --- end-to-end through a drifted container tree -------------------------------


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


def _drifted_union_container():
    fields = [
        {"name": "id", "type": "long"},
        {"name": "u", "type": ["null", "int", "string"]},
    ]
    rows = [
        encode_long(1) + encode_long(1) + encode_long(5),    # u = int 5
        encode_long(2) + encode_long(2) + encode_long(1) + b"x",  # u = "x"
        encode_long(3) + encode_long(0),                     # u = null
    ]
    return _container(fields, rows)


READER = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        # reordered AND widened: int → long, string kept, bytes added
        {"name": "u", "type": ["null", "string", "long", "bytes"]},
    ],
}


def test_container_read_under_drifted_union_reader():
    _, recs = _decode_container(io.BytesIO(_drifted_union_container()), READER)
    assert list(recs) == [
        (1, (None, 5, None)),
        (2, ("x", None, None)),
        (3, None),
    ]


def test_truncation_sweep_under_union_resolution():
    """Every byte-offset truncation of the drifted-union container
    either raises or yields exactly the intact prefix rows — the
    resolution layer must not turn a short read into wrong values."""
    data = _drifted_union_container()
    # rows live in one block; any truncation below the full length must
    # raise or return a clean prefix of the expected tuples.
    want = [
        (1, (None, 5, None)),
        (2, ("x", None, None)),
        (3, None),
    ]
    for cut in range(len(data)):
        try:
            _, recs = _decode_container(io.BytesIO(data[:cut]), READER)
            got = list(recs)
        except Exception:
            continue
        assert got == want[: len(got)], cut
