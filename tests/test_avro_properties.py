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
