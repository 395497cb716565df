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
