"""Avro spec §"Schema Resolution" for the fallback reader (r9).

r8 refused ALL schema drift (correct, vs the silent column
misalignment before it); the spec-complete behavior for a long-lived
tree is: match fields by NAME, fill reader-only fields from their
declared DEFAULT, decode-and-skip writer-only fields, and apply the
promotion lattice (int→long→float→double, string↔bytes). Verified here
per rule, end-to-end over drifted multi-file trees through the
distributed reader, and with a hypothesis round-trip under an evolved
reader schema. Genuine incompatibilities must still refuse
(tests/test_avro_fallback.py::test_incompatible_schema_drift_refused).
"""

from __future__ import annotations

import io
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _field_plan,
    _resolution_plan,
    read_avro_fallback,
    read_container,
    resolve_reader_schema,
    spark_schema_to_avro,
    write_avro_fallback,
    write_container,
)


def _one_file(df, dest_dir, prefix):
    """Write df as a single container file named so tree order is
    deterministic (the reader sorts filenames)."""
    import tempfile

    tmp = tempfile.mkdtemp()
    write_avro_fallback(df.coalesce(1), tmp)
    src = [n for n in os.listdir(tmp) if n.endswith(".avro")][0]
    os.makedirs(dest_dir, exist_ok=True)
    os.rename(
        os.path.join(tmp, src), os.path.join(dest_dir, f"{prefix}-{src}")
    )


def test_reordered_fields_resolve(spark, tmp_path):
    """Same field set, different order across files: resolution matches
    by NAME, so values land under the right columns (the exact hazard
    r8's refusal closed)."""
    out = str(tmp_path / "t.avro")
    _one_file(
        spark.createDataFrame([(1, "x")], "id BIGINT, name STRING"),
        out, "aa",
    )
    _one_file(
        spark.createDataFrame([("y", 2)], "name STRING, id BIGINT"),
        out, "bb",
    )
    back = read_avro_fallback(spark, out)
    got = sorted((r["id"], r["name"]) for r in back.collect())
    assert got == [(1, "x"), (2, "y")]


def test_added_nullable_field_with_default(spark, tmp_path):
    """The routine evolution case from VERDICT r8: a tree whose newer
    files added a nullable field. The widest schema wins as reader; old
    files' rows take the default (null)."""
    out = str(tmp_path / "t.avro")
    _one_file(
        spark.createDataFrame([(1, "x")], "id BIGINT, name STRING"),
        out, "aa",
    )
    new = spark.createDataFrame(
        [(2, "y", 0.5)], "id BIGINT, name STRING, score DOUBLE"
    )
    _one_file(new, out, "bb")
    back = read_avro_fallback(spark, out)
    assert back.columns == ["id", "name", "score"]
    got = sorted(
        (r["id"], r["name"], r["score"]) for r in back.collect()
    )
    assert got == [(1, "x", None), (2, "y", 0.5)]


def test_non_null_default_fills_reader_only_field(spark, tmp_path):
    """A reader-only field with a non-null declared default fills that
    default for files written before the field existed — via an explicit
    reader schema, since this writer only declares null defaults."""
    out = str(tmp_path / "t.avro")
    _one_file(spark.createDataFrame([(7,)], "id BIGINT"), out, "aa")
    reader = {
        "type": "record",
        "name": "record",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "n", "type": "long", "default": 42},
            {"name": "tag", "type": "string", "default": "none"},
        ],
    }
    back = read_avro_fallback(spark, out, reader_schema=reader)
    assert [tuple(r) for r in back.collect()] == [(7, 42, "none")]


def test_numeric_promotion_int_to_long(spark, tmp_path):
    """int-written files resolve under a long reader (spec promotion);
    the mixed tree picks the wider schema."""
    out = str(tmp_path / "t.avro")
    _one_file(spark.createDataFrame([(1,)], "v INT"), out, "aa")
    _one_file(spark.createDataFrame([(2**40,)], "v BIGINT"), out, "bb")
    back = read_avro_fallback(spark, out)
    assert dict(back.dtypes)["v"] == "bigint"
    assert sorted(r["v"] for r in back.collect()) == [1, 2**40]


def test_promotions_to_double_and_string_bytes():
    """The full promotion lattice at the codec level: int/long→double,
    float→double, string↔bytes — exercised through read_container with
    an explicit reader schema (pure Python, no Spark)."""
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType(), False),
            T.StructField("l", T.LongType(), False),
            T.StructField("f", T.FloatType(), False),
            T.StructField("s", T.StringType(), False),
            T.StructField("b", T.BinaryType(), False),
        ]
    )
    rows = [(3, 2**40, 0.5, "héllo", "ab".encode())]  # valid UTF-8 for b→s
    fh = io.BytesIO()
    write_container(
        iter(rows), _field_plan(schema), spark_schema_to_avro(schema), fh
    )
    fh.seek(0)
    reader = {
        "type": "record",
        "name": "record",
        "fields": [
            {"name": "i", "type": "double"},
            {"name": "l", "type": "double"},
            {"name": "f", "type": "double"},
            {"name": "s", "type": "bytes"},
            {"name": "b", "type": "string"},
        ],
    }
    _, got = read_container(fh, reader_schema=reader)
    assert got == [(3.0, float(2**40), 0.5, "héllo".encode(), "ab")]
    assert isinstance(got[0][0], float) and isinstance(got[0][3], bytes)


def test_writer_only_field_skipped_keeps_stream_aligned():
    """A reader schema that drops a middle field: the skipped value is
    still DECODED (variable-length wire format — skipping must consume
    the bytes) and the surrounding fields stay intact."""
    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("drop", T.StringType(), True),
            T.StructField("z", T.LongType(), False),
        ]
    )
    rows = [(1, "gone", 2), (3, None, 4)]
    fh = io.BytesIO()
    write_container(
        iter(rows), _field_plan(schema), spark_schema_to_avro(schema), fh
    )
    fh.seek(0)
    reader = {
        "type": "record",
        "name": "record",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "z", "type": "long"},
        ],
    }
    _, got = read_container(fh, reader_schema=reader)
    assert got == [(1, 2), (3, 4)]


def test_reader_only_field_without_default_refused():
    writer = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "long"},  # no default
        ],
    }
    with pytest.raises(ValueError, match="declares no default"):
        _resolution_plan(writer, reader)


def test_unpromotable_type_refused():
    writer = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "string"}],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    with pytest.raises(ValueError, match="no spec promotion"):
        _resolution_plan(writer, reader)
    # and the reverse narrowing direction (long → int) is not a
    # promotion either
    with pytest.raises(ValueError, match="no spec promotion"):
        _resolution_plan(
            {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": "long"}]},
            {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": "int"}]},
        )


def test_null_value_into_non_nullable_reader_refused():
    """Writer declares ["null","long"] and a record IS null; a reader
    schema declaring plain long must refuse at decode time (spec: a
    union resolves to a non-union only when the actual branch
    matches)."""
    schema = T.StructType([T.StructField("a", T.LongType(), True)])
    fh = io.BytesIO()
    write_container(
        iter([(None,)]), _field_plan(schema),
        spark_schema_to_avro(schema), fh,
    )
    fh.seek(0)
    reader = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    with pytest.raises(ValueError, match="non-nullable"):
        read_container(fh, reader_schema=reader)
    # the non-null case resolves fine under the same reader
    fh2 = io.BytesIO()
    write_container(
        iter([(5,)]), _field_plan(schema),
        spark_schema_to_avro(schema), fh2,
    )
    fh2.seek(0)
    _, got = read_container(fh2, reader_schema=reader)
    assert got == [(5,)]


def test_resolve_reader_prefers_widest():
    narrow = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "long"}],
    }
    wide = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
        ],
    }
    # order-independent: the added column survives either way
    assert resolve_reader_schema([narrow, wide]) == wide
    assert resolve_reader_schema([wide, narrow]) == wide


_names = ["id", "name", "score", "flag"]
_row = st.tuples(
    st.integers(-(2**31), 2**31 - 1),
    st.one_of(st.none(), st.text(max_size=20)),
    st.one_of(st.none(), st.floats(allow_nan=False, width=32)),
    st.one_of(st.none(), st.booleans()),
)


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(_row, max_size=15),
    perm=st.permutations(list(range(4))),
)
def test_roundtrip_under_evolved_reader(rows, perm):
    """Hypothesis (VERDICT r8 #2's done-bar): arbitrary rows written
    under schema A read back value-identical under an evolved reader —
    fields REORDERED by a random permutation, an extra defaulted field
    appended, and id promoted int→long. Pure codec level: fast."""
    writer_struct = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.FloatType(), True),
            T.StructField("flag", T.BooleanType(), True),
        ]
    )
    fh = io.BytesIO()
    write_container(
        iter(rows), _field_plan(writer_struct),
        spark_schema_to_avro(writer_struct), fh,
    )
    fh.seek(0)
    reader_fields = []
    for i in perm:
        t = ["long", ["null", "string"], ["null", "float"],
             ["null", "boolean"]][i]
        reader_fields.append({"name": _names[i], "type": t})
    reader_fields.append(
        {"name": "added", "type": ["null", "string"], "default": None}
    )
    reader = {"type": "record", "name": "r", "fields": reader_fields}
    _, got = read_container(fh, reader_schema=reader)
    assert len(got) == len(rows)
    for orig, back in zip(rows, got):
        rec = dict(zip([f["name"] for f in reader_fields], back))
        assert rec["id"] == orig[0] and isinstance(rec["id"], int)
        assert rec["name"] == orig[1]
        assert rec["score"] == orig[2]
        assert rec["flag"] == orig[3]
        assert rec["added"] is None


# --- aliases: the spec's rename mechanism (r9, second pass) ---------------

def test_alias_rename_reads_old_files():
    """A reader field with `aliases` captures a writer field under its
    OLD name — composing with promotion (written int, read long)."""
    schema = T.StructType(
        [
            T.StructField("old_id", T.IntegerType(), False),
            T.StructField("name", T.StringType(), True),
        ]
    )
    rows = [(7, "x"), (8, None)]
    fh = io.BytesIO()
    write_container(
        iter(rows), _field_plan(schema), spark_schema_to_avro(schema), fh
    )
    fh.seek(0)
    reader = {
        "type": "record",
        "name": "record",
        "fields": [
            {"name": "new_id", "type": "long", "aliases": ["old_id"]},
            {"name": "name", "type": ["null", "string"], "default": None},
        ],
    }
    _, got = read_container(fh, reader_schema=reader)
    assert [list(r) for r in got] == [[7, "x"], [8, None]]
    assert all(isinstance(r[0], int) for r in got)


def test_alias_colliding_with_sibling_name_refused():
    """A reader field aliasing a name that ANOTHER reader field carries
    exactly is refused (ADVICE r9): Java's applyAliases rewrites the
    writer schema so the alias captures the writer field, while a
    name-first lookup hands it to the same-named sibling — two standard
    implementations, two different rows. This module refuses rather
    than silently picking one. (r9 resolved name-first; that behavior
    is gone.)"""
    writer = {
        "type": "record", "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "x", "type": "long"},
            {"name": "y", "type": "long", "aliases": ["x"], "default": 9},
        ],
    }
    with pytest.raises(ValueError, match="alias/name collision"):
        _resolution_plan(writer, reader)


def test_alias_of_own_name_is_harmless():
    """A field aliasing its OWN name resolves identically under both
    semantics — allowed, not a collision."""
    writer = {
        "type": "record", "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [{"name": "x", "type": "long", "aliases": ["x"]}],
    }
    actions, template = _resolution_plan(writer, reader)
    assert actions == [("read", 0, "long", None, False, False)]
    assert template == [None]


def test_alias_ambiguous_between_readers_refused():
    writer = {
        "type": "record", "name": "r",
        "fields": [{"name": "v", "type": "long"}],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "a", "type": "long", "aliases": ["v"], "default": 0},
            {"name": "b", "type": "long", "aliases": ["v"], "default": 0},
        ],
    }
    with pytest.raises(ValueError, match="both alias"):
        _resolution_plan(writer, reader)


def test_alias_double_fill_refused():
    """Writer carries BOTH the old and the new name: refusing beats
    silently letting the later writer field overwrite the earlier."""
    writer = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "old", "type": "long"},
            {"name": "new", "type": "long"},
        ],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [{"name": "new", "type": "long", "aliases": ["old"]}],
    }
    with pytest.raises(ValueError, match="already filled"):
        _resolution_plan(writer, reader)


def test_alias_non_array_refused():
    """A bare-string aliases value would iterate per CHARACTER —
    refuse the malformed schema instead of inventing 1-letter renames."""
    writer = {
        "type": "record", "name": "r",
        "fields": [{"name": "old", "type": "long"}],
    }
    reader = {
        "type": "record", "name": "r",
        "fields": [{"name": "new", "type": "long", "aliases": "old"}],
    }
    with pytest.raises(ValueError, match="JSON array"):
        _resolution_plan(writer, reader)
