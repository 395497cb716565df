"""Truncation/corruption robustness of the avro container reader: a
damaged interchange file must RAISE, never silently yield wrong or
partial-row data.

The container format's integrity hooks are the per-block sync marker
and the codec's own framing; the reader leans on both. Properties
pinned here, over every byte offset of a real multi-block container:

- truncation at a BLOCK BOUNDARY yields exactly the prefix rows (a
  container with fewer blocks is a valid container by spec — the
  reader cannot distinguish it and must not invent an error);
- truncation anywhere else raises (EOFError from a cut varint,
  ValueError from the sync check, zlib/struct errors from cut
  payloads) — and NEVER yields a row beyond the intact prefix blocks;
- corrupting any byte of a block's sync marker raises;
- header truncation raises.
"""

from __future__ import annotations

import io
import struct
import zlib

import pytest

from tutorial_apache_beam_spark.sources.avro_fallback import (
    _decode_container,
    encode_long,
    read_header,
    write_container,
)

try:  # same import-gate convention as the engine
    from pyspark.sql import types as T
except ImportError:  # pragma: no cover
    pytest.skip("pyspark required", allow_module_level=True)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)

ROWS = [(i, None if i % 7 == 0 else f"name-{i}") for i in range(300)]


def _container(codec: str) -> tuple[bytes, list[int]]:
    """A 3-block container + the byte offsets of each block END (i.e.
    positions where truncation leaves a valid shorter container)."""
    from tutorial_apache_beam_spark.sources.avro_fallback import (
        spark_schema_to_avro,
    )

    avro_schema = spark_schema_to_avro(SCHEMA)
    plan = [("id", "long", False), ("name", "string", True)]
    out = io.BytesIO()
    sync = b"\x5a" * 16
    # Three blocks of 100 rows: write each block's rows via a separate
    # write_container and splice (header once, blocks concatenated) —
    # write_container emits header+blocks+sync per call, so build
    # block bytes manually instead: reuse its wire helpers.
    buf = io.BytesIO()
    write_container(iter(ROWS), plan, avro_schema, buf, codec="null", sync=sync)
    data = buf.getvalue()
    # Single-block container from write_container; derive multi-block by
    # re-encoding: decode rows back, then hand-build 3 blocks.
    hdr_end = data.index(sync) + 16  # end of header (first sync use)
    header = data[:hdr_end]

    def block(rows_slice) -> bytes:
        payload = bytearray()
        for rid, name in rows_slice:
            payload += encode_long(rid)
            if name is None:
                payload += encode_long(0)
            else:
                nb = name.encode()
                payload += encode_long(1) + encode_long(len(nb)) + nb
        raw = bytes(payload)
        if codec == "deflate":
            raw = zlib.compress(raw)[2:-4]  # spec: raw deflate stream
        elif codec != "null":
            raise AssertionError(codec)
        return encode_long(len(rows_slice)) + encode_long(len(raw)) + raw + sync

    blocks = [block(ROWS[i : i + 100]) for i in (0, 100, 200)]
    if codec == "deflate":
        # Rewrite the header's codec entry by regenerating via the
        # public writer (header layout is metadata-ordered).
        buf2 = io.BytesIO()
        write_container(
            iter(ROWS[:1]), plan, avro_schema, buf2, codec="deflate", sync=sync
        )
        d2 = buf2.getvalue()
        header = d2[: d2.index(sync) + 16]
    body = b"".join(blocks)
    boundaries = []
    pos = len(header)
    for b in blocks:
        pos += len(b)
        boundaries.append(pos)
    return header + body, boundaries


def _read_rows(data: bytes) -> list[tuple]:
    _schema, rows = _decode_container(io.BytesIO(data))
    return list(rows)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_every_truncation_point_raises_or_yields_exact_prefix(codec):
    data, boundaries = _container(codec)
    full = _read_rows(data)
    assert full == ROWS

    # The header ends at the first occurrence of the sync marker. A cut
    # exactly there is a ZERO-block container — valid by spec (0 rows),
    # so it belongs to the boundary set alongside the block ends.
    first_block_start = data.index(b"\x5a" * 16) + 16
    boundaries = [first_block_start, *boundaries]

    # Sample every truncation offset from inside the header to the end.
    for cut in range(0, len(data)):
        chunk = data[:cut]
        if cut < first_block_start:
            with pytest.raises((EOFError, ValueError, KeyError, struct.error)):
                # Header cut: read_header (via _decode_container) must
                # refuse — a KeyError means the schema entry vanished.
                _read_rows(chunk)
            continue
        n_whole = sum(1 for b in boundaries[1:] if cut >= b)
        if cut in boundaries:
            # Valid shorter container: exactly the prefix blocks' rows.
            assert _read_rows(chunk) == ROWS[: n_whole * 100]
            continue
        try:
            got = _read_rows(chunk)
        except (EOFError, ValueError, zlib.error, struct.error):
            continue
        # A non-boundary cut that doesn't raise must still never yield
        # BEYOND the intact prefix blocks (e.g. a cut inside the next
        # block's count varint whose remaining byte forms a valid empty
        # read is impossible here, but guard the property itself).
        raise AssertionError(
            f"cut at {cut} returned {len(got)} rows without error "
            f"(intact prefix = {n_whole * 100})"
        )


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_sync_marker_corruption_raises(codec):
    data, boundaries = _container(codec)
    # Flip one byte inside each block's trailing sync marker.
    for end in boundaries:
        for off in (end - 16, end - 1):
            bad = bytearray(data)
            bad[off] ^= 0xFF
            with pytest.raises((ValueError, EOFError, zlib.error, struct.error)):
                _read_rows(bytes(bad))


def test_read_header_rejects_bad_magic():
    with pytest.raises(ValueError, match="bad magic"):
        read_header(io.BytesIO(b"NOPE" + b"\x00" * 64))
