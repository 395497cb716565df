"""Property-based round-trip for the clean-room avro container codec.

The deterministic tests pin spec vectors and golden bytes; this layer
lets hypothesis hunt the value-space corners the fixed cases can't
enumerate — varint boundaries, negative zigzag extremes, unicode
surrogates-adjacent text, empty strings/bytes, dense null mixes, both
codecs — through the exact write_container/read_container pair the
distributed writer uses. Pure Python, no Spark session: runs in
milliseconds per example.
"""

from __future__ import annotations

import io
from datetime import date, datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _field_plan,
    read_container,
    spark_schema_to_avro,
    write_container,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("small", T.IntegerType(), True),
        T.StructField("flag", T.BooleanType(), True),
        T.StructField("ratio", T.DoubleType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
PLAN = _field_plan(SCHEMA)
AVRO_SCHEMA = spark_schema_to_avro(SCHEMA)

# Codec-representable value spaces: timestamps are micros since epoch
# (naive UTC), dates are days since epoch in int32 range.
_ts = st.one_of(
    st.none(),
    st.datetimes(
        min_value=datetime(1, 1, 1),
        max_value=datetime(9999, 12, 31, 23, 59, 59, 999999),
    ),
)
_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
    st.one_of(st.none(), st.booleans()),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False),  # NaN != NaN breaks equality below
    ),
    st.one_of(st.none(), st.text(max_size=40)),
    st.one_of(st.none(), st.binary(max_size=40)),
    st.one_of(
        st.none(), st.dates(min_value=date(1, 1, 1), max_value=date(9999, 12, 31))
    ),
    _ts,
)


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(_row, max_size=25),
    codec=st.sampled_from(["null", "deflate", "bzip2", "xz"]),
)
def test_container_roundtrip_arbitrary_rows(rows, codec):
    fh = io.BytesIO()
    n = write_container(iter(rows), PLAN, AVRO_SCHEMA, fh, codec=codec)
    assert n == len(rows)
    fh.seek(0)
    schema, got = read_container(fh)
    assert [f["name"] for f in schema["fields"]] == [
        f.name for f in SCHEMA.fields
    ]
    assert got == rows


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=8))
def test_container_roundtrip_is_deterministic(rows):
    """Same rows, same sync marker → byte-identical containers (the
    speculative-duplicate-attempt guarantee: os.replace of one attempt's
    file by another's must be content-neutral)."""
    bufs = []
    for _ in range(2):
        fh = io.BytesIO()
        write_container(
            iter(rows), PLAN, AVRO_SCHEMA, fh, codec="null", sync=b"\x01" * 16
        )
        bufs.append(fh.getvalue())
    assert bufs[0] == bufs[1]


# --- nested composites (r10): hypothesis over ARBITRARY SCHEMAS ------------
#
# The deterministic nested tests pin one fixture schema; here hypothesis
# generates the SCHEMA too (bounded-depth arrays/maps/structs over the
# primitive leaves, nullable at random positions) plus matching rows, so
# the recursive encoder/decoder pair is exercised over schema shapes no
# fixed fixture enumerates.

_leaf_types = st.sampled_from(
    [
        T.LongType(),
        T.IntegerType(),
        T.BooleanType(),
        T.StringType(),
        T.BinaryType(),
        T.DoubleType(),
    ]
)


def _composite(children):
    return st.one_of(
        st.builds(T.ArrayType, children, st.booleans()),
        st.builds(
            lambda v, n: T.MapType(T.StringType(), v, n),
            children,
            st.booleans(),
        ),
        st.builds(
            lambda ts: T.StructType(
                [
                    T.StructField(f"f{i}", t, nullable)
                    for i, (t, nullable) in enumerate(ts)
                ]
            ),
            st.lists(st.tuples(children, st.booleans()), min_size=1,
                     max_size=3),
        ),
    )


_dtype = st.recursive(_leaf_types, _composite, max_leaves=6)


def _value_for(dt, nullable):
    base = {
        T.LongType: st.integers(-(2**63), 2**63 - 1),
        T.IntegerType: st.integers(-(2**31), 2**31 - 1),
        T.BooleanType: st.booleans(),
        T.StringType: st.text(max_size=12),
        T.BinaryType: st.binary(max_size=12),
        T.DoubleType: st.floats(allow_nan=False),
    }.get(type(dt))
    if base is None:
        if isinstance(dt, T.ArrayType):
            base = st.lists(
                _value_for(dt.elementType, dt.containsNull), max_size=4
            )
        elif isinstance(dt, T.MapType):
            base = st.dictionaries(
                st.text(max_size=6),
                _value_for(dt.valueType, dt.valueContainsNull),
                max_size=4,
            )
        else:  # StructType
            base = st.tuples(
                *(
                    _value_for(f.dataType, f.nullable)
                    for f in dt.fields
                )
            )
    return st.one_of(st.none(), base) if nullable else base


@st.composite
def _schema_and_rows(draw):
    n_fields = draw(st.integers(1, 4))
    fields = [
        T.StructField(f"c{i}", draw(_dtype), draw(st.booleans()))
        for i in range(n_fields)
    ]
    schema = T.StructType(fields)
    rows = draw(
        st.lists(
            st.tuples(
                *(_value_for(f.dataType, f.nullable) for f in fields)
            ),
            max_size=8,
        )
    )
    return schema, rows


@given(sr=_schema_and_rows(), codec=st.sampled_from(["null", "deflate"]))
@settings(max_examples=150, deadline=None)
def test_nested_schema_roundtrip_arbitrary(sr, codec):
    schema, rows = sr
    av = spark_schema_to_avro(schema)
    plan = _field_plan(schema)
    fh = io.BytesIO()
    n = write_container(iter(rows), plan, av, fh, codec=codec)
    assert n == len(rows)
    fh.seek(0)
    eff, got = read_container(fh)
    assert got == rows


# --- unions under skip paths (r11, VERDICT r10 item 8) ----------------------
#
# The historical bug class on this path is stream DESYNC under skip (the
# r10 null-second desync was caught by review, not fuzz). Hypothesis
# generates avro schemas containing general unions at every nesting
# depth (field / array item / map value / nested record field), encodes
# rows with a TEST-LOCAL spec-direct encoder (the engine writer never
# emits general unions — the test plays the Java writer), then decodes
# under a reader keeping a random FIELD SUBSET, so dropped union-bearing
# fields exercise the skip actions. Any mis-consumed byte shows up as a
# wrong value or a crash in a LATER field or row.

import struct as _struct

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _decode_container,
    encode_long,
)

_UNION_POOL = ["long", "string", "boolean", "double", "bytes", "int"]


def _union_frag(draw):
    k = draw(st.integers(2, 4))
    branches = draw(
        st.permutations(_UNION_POOL)
    )[: k - 1]
    null_at = draw(st.integers(0, k - 1))
    out = list(branches)
    if draw(st.booleans()):
        out.insert(min(null_at, len(out)), "null")
    return out


@st.composite
def _avro_frag(draw, depth=0):
    choices = ["prim", "union"]
    if depth < 2:
        choices += ["array", "map", "record"]
    kind = draw(st.sampled_from(choices))
    if kind == "prim":
        return draw(st.sampled_from(_UNION_POOL))
    if kind == "union":
        return _union_frag(draw)
    if kind == "array":
        items = draw(_avro_frag(depth=depth + 1))
        return {"type": "array", "items": items}
    if kind == "map":
        values = draw(_avro_frag(depth=depth + 1))
        return {"type": "map", "values": values}
    fields = [
        {"name": f"n{depth}_{i}", "type": draw(_avro_frag(depth=depth + 1))}
        for i in range(draw(st.integers(1, 3)))
    ]
    return {
        "type": "record",
        "name": f"rec{depth}_{draw(st.integers(0, 10**6))}",
        "fields": fields,
    }


def _gen_value(draw, frag):
    """A (encodable, spec-wire) value for one fragment; unions yield
    (branch_index, inner_value) so the encoder knows the wire branch."""
    if isinstance(frag, list):
        idx = draw(st.integers(0, len(frag) - 1))
        b = frag[idx]
        return ("u", idx, None if b == "null" else _gen_value(draw, b))
    if isinstance(frag, dict):
        t = frag["type"]
        if t == "array":
            return [
                _gen_value(draw, frag["items"])
                for _ in range(draw(st.integers(0, 3)))
            ]
        if t == "map":
            return {
                draw(st.text(max_size=4)): _gen_value(draw, frag["values"])
                for _ in range(draw(st.integers(0, 3)))
            }
        return tuple(_gen_value(draw, f["type"]) for f in frag["fields"])
    return draw(
        {
            "long": st.integers(-(2**63), 2**63 - 1),
            "int": st.integers(-(2**31), 2**31 - 1),
            "string": st.text(max_size=8),
            "boolean": st.booleans(),
            "double": st.floats(allow_nan=False),
            "bytes": st.binary(max_size=8),
        }[frag]
    )


def _enc(frag, v, out: bytearray) -> None:
    """Test-local spec-direct encoder (independent of the engine's)."""
    if isinstance(frag, list):
        _, idx, inner = v
        out += encode_long(idx)
        if frag[idx] != "null":
            _enc(frag[idx], inner, out)
        return
    if isinstance(frag, dict):
        t = frag["type"]
        if t == "array":
            if v:
                out += encode_long(len(v))
                for x in v:
                    _enc(frag["items"], x, out)
            out += encode_long(0)
            return
        if t == "map":
            if v:
                out += encode_long(len(v))
                for k, x in v.items():
                    kb = k.encode("utf-8")
                    out += encode_long(len(kb)) + kb
                    _enc(frag["values"], x, out)
            out += encode_long(0)
            return
        for f, x in zip(frag["fields"], v):
            _enc(f["type"], x, out)
        return
    if frag == "boolean":
        out.append(1 if v else 0)
    elif frag in ("int", "long"):
        out += encode_long(v)
    elif frag == "double":
        out += _struct.pack("<d", v)
    elif frag == "string":
        raw = v.encode("utf-8")
        out += encode_long(len(raw)) + raw
    elif frag == "bytes":
        out += encode_long(len(v)) + v
    else:  # pragma: no cover
        raise AssertionError(frag)


def _expected(frag, v):
    """The Python value the engine's decoder yields for one wire value
    (union member-layout transform applied recursively)."""
    if isinstance(frag, list):
        _, idx, inner = v
        members = [i for i, b in enumerate(frag) if b != "null"]
        if frag[idx] == "null":
            return None
        val = _expected(frag[idx], inner)
        if len(members) == 1:
            return val
        out = [None] * len(members)
        out[members.index(idx)] = val
        return tuple(out)
    if isinstance(frag, dict):
        t = frag["type"]
        if t == "array":
            return [_expected(frag["items"], x) for x in v]
        if t == "map":
            return {k: _expected(frag["values"], x) for k, x in v.items()}
        return tuple(
            _expected(f["type"], x) for f, x in zip(frag["fields"], v)
        )
    return v


@st.composite
def _union_case(draw):
    n_fields = draw(st.integers(2, 5))
    fields = [
        {"name": f"c{i}", "type": draw(_avro_frag())}
        for i in range(n_fields)
    ]
    # at least one general union somewhere, else the case tests nothing
    if not any(isinstance(f["type"], list) for f in fields):
        fields[0] = {"name": "c0", "type": _union_frag(draw)}
    rows = [
        tuple(_gen_value(draw, f["type"]) for f in fields)
        for _ in range(draw(st.integers(1, 6)))
    ]
    keep = sorted(
        draw(
            st.sets(
                st.integers(0, n_fields - 1),
                min_size=1,
                max_size=n_fields,
            )
        )
    )
    return fields, rows, keep


@given(case=_union_case())
@settings(max_examples=120, deadline=None)
def test_union_skip_fuzz_stays_aligned(case):
    fields, rows, keep = case
    writer = {"type": "record", "name": "r", "fields": fields}
    hdr = io.BytesIO()
    sync = b"\x5a" * 16
    write_container(iter([]), [], writer, hdr, sync=sync)
    payload = bytearray()
    for row in rows:
        for f, v in zip(fields, row):
            _enc(f["type"], v, payload)
    data = (
        hdr.getvalue()
        + encode_long(len(rows))
        + encode_long(len(bytes(payload)))
        + bytes(payload)
        + sync
    )
    reader = {
        "type": "record",
        "name": "r",
        "fields": [fields[i] for i in keep],
    }
    _, recs = _decode_container(io.BytesIO(data), reader)
    got = list(recs)
    want = [
        tuple(_expected(fields[i]["type"], row[i]) for i in keep)
        for row in rows
    ]
    assert got == want


# --- r12: logical-type leaves + declared-schema (enum/fixed) write fuzz -----
#
# The r11 fuzz covered read/skip desync; the writer is now reachable
# from writeStream and the declared-schema path (VERDICT r11 item 7),
# so the same property pressure applies to ENCODE: (a) the nested-shape
# fuzz re-run with the LOGICAL-type leaves the r10 pool lacked
# (decimal / date / timestamp / local-timestamp — the encoder branches
# with real arithmetic in them), and (b) schemas whose string/binary
# leaves are DECLARED as enum/fixed, driving writer_plan_for_avro_schema
# and the r12 encode branches over arbitrary symbol sets and sizes.

from decimal import Decimal as _D

from tutorial_apache_beam_spark.sources.avro_fallback import (
    writer_plan_for_avro_schema,
)

_logical_leaves = st.sampled_from(
    [
        T.DecimalType(10, 2),
        T.DateType(),
        T.TimestampType(),
        T.TimestampNTZType(),
        T.LongType(),
        T.StringType(),
    ]
)


def _logical_value(dt, nullable):
    base = {
        T.DecimalType: st.integers(-(10**8) + 1, 10**8 - 1).map(
            lambda n: _D(n).scaleb(-2)
        ),
        T.DateType: st.dates(date(1, 1, 1), date(9999, 12, 31)),
        T.TimestampType: st.datetimes(
            datetime(1, 1, 1), datetime(9999, 12, 28)
        ),
        T.TimestampNTZType: st.datetimes(
            datetime(1, 1, 1), datetime(9999, 12, 28)
        ),
        T.LongType: st.integers(-(2**63), 2**63 - 1),
        T.StringType: st.text(max_size=8),
    }[type(dt)]
    return st.one_of(st.none(), base) if nullable else base


@st.composite
def _logical_schema_and_rows(draw):
    n = draw(st.integers(1, 4))
    fields = [
        T.StructField(
            f"c{i}", draw(_logical_leaves), draw(st.booleans())
        )
        for i in range(n)
    ]
    rows = draw(
        st.lists(
            st.tuples(
                *(_logical_value(f.dataType, f.nullable) for f in fields)
            ),
            max_size=6,
        )
    )
    return T.StructType(fields), rows


@given(sr=_logical_schema_and_rows(), codec=st.sampled_from(["null", "deflate"]))
@settings(max_examples=120, deadline=None)
def test_logical_leaf_roundtrip_arbitrary(sr, codec):
    schema, rows = sr
    av = spark_schema_to_avro(schema)
    plan = _field_plan(schema)
    fh = io.BytesIO()
    assert write_container(iter(rows), plan, av, fh, codec=codec) == len(rows)
    fh.seek(0)
    _, got = read_container(fh)
    assert got == rows


_symbol = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,6}", fullmatch=True)


@st.composite
def _declared_case(draw):
    """Flat record whose fields are a random mix of enum (declared from
    a string column), fixed (from binary), and plain long/string;
    nullable at random. Returns (spark fields, declared avro fields,
    rows)."""
    n = draw(st.integers(1, 4))
    sfields, afields, valgens = [], [], []
    for i in range(n):
        kind = draw(st.sampled_from(["enum", "fixed", "long", "string"]))
        nullable = draw(st.booleans())
        if kind == "enum":
            syms = draw(
                st.lists(_symbol, min_size=1, max_size=6, unique=True)
            )
            atype: object = {
                "type": "enum", "name": f"E{i}", "symbols": syms,
            }
            stype: T.DataType = T.StringType()
            vals = st.sampled_from(syms)
        elif kind == "fixed":
            size = draw(st.integers(0, 6))
            atype = {"type": "fixed", "name": f"F{i}", "size": size}
            stype = T.BinaryType()
            vals = st.binary(min_size=size, max_size=size)
        elif kind == "long":
            atype, stype = "long", T.LongType()
            vals = st.integers(-(2**63), 2**63 - 1)
        else:
            atype, stype = "string", T.StringType()
            vals = st.text(max_size=8)
        if nullable:
            atype = ["null", atype]
            vals = st.one_of(st.none(), vals)
        sfields.append(T.StructField(f"c{i}", stype, nullable))
        afields.append({"name": f"c{i}", "type": atype})
        valgens.append(vals)
    rows = draw(st.lists(st.tuples(*valgens), max_size=6))
    return T.StructType(sfields), afields, rows


@given(case=_declared_case(), codec=st.sampled_from(["null", "deflate"]))
@settings(max_examples=120, deadline=None)
def test_declared_enum_fixed_roundtrip_arbitrary(case, codec):
    spark_schema, afields, rows = case
    avro = {"type": "record", "name": "r", "fields": afields}
    plan = writer_plan_for_avro_schema(spark_schema, avro)
    fh = io.BytesIO()
    assert write_container(iter(rows), plan, avro, fh, codec=codec) == len(rows)
    fh.seek(0)
    _, got = read_container(fh)
    # enum symbols and fixed bytes round-trip to themselves (string /
    # binary columns), so equality is exact
    assert got == rows
