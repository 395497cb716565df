"""Unit tests for the vendored protobuf runtime (vendor/protoshim).

The e2e proof is tests/test_tws_panes.py::test_tws_matches_state_v1_panes
(the shim carrying transformWithState's live wire protocol against the
JVM); these tests pin the codec-level behaviors that e2e run relies on,
so a shim regression fails fast with a named invariant instead of a
hung streaming query.
"""

from __future__ import annotations

import pytest

from tutorial_apache_beam_spark.protoshim import ensure_protobuf_runtime

ensure_protobuf_runtime()

from google.protobuf import _shim  # noqa: E402
import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


# --- wire primitives --------------------------------------------------------


@pytest.mark.parametrize(
    "value",
    [0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1, -1, -5000, -(2**63)],
)
def test_varint_roundtrip_signed64(value):
    encoded = _shim.encode_varint(value)
    decoded, pos = _shim.decode_varint(encoded, 0)
    assert pos == len(encoded)
    assert _shim._to_signed64(decoded) == value


def test_negative_varint_is_ten_bytes():
    # protobuf requires negative int32/int64 as 64-bit two's complement
    assert len(_shim.encode_varint(-1)) == 10


@pytest.mark.parametrize("value", [0, 1, -1, 2, -2, 2**31, -(2**31)])
def test_zigzag_roundtrip(value):
    assert _shim._zigzag_decode(_shim._zigzag_encode(value) & _shim._MASK64) == value


def test_known_encoding_matches_protobuf_spec():
    # https://protobuf.dev/programming-guides/encoding/ worked example:
    # field 1 (varint) = 150  ->  08 96 01
    msg = sm.RegisterTimer(expiryTimestampMs=150)
    assert msg.SerializeToString() == bytes.fromhex("089601")


# --- message semantics ------------------------------------------------------


def test_oneof_assignment_clears_siblings():
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    call.setHandleState = sm.SetHandleState(state=sm.CREATED)
    data = call.SerializeToString()
    parsed = sm.StatefulProcessorCall()
    parsed.ParseFromString(data)
    assert parsed.WhichOneof("method") == "setHandleState"
    assert parsed.setHandleState.state == sm.CREATED


def test_empty_oneof_member_still_serializes_its_tag():
    # RemoveImplicitKey has no fields; the JVM discriminates the oneof by
    # the presence of the (zero-length) member — it must hit the wire.
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    data = req.SerializeToString()
    assert len(data) > 0
    parsed = sm.ImplicitGroupingKeyRequest()
    parsed.ParseFromString(data)
    assert parsed.WhichOneof("method") == "removeImplicitKey"


def test_nested_vivification_serializes_only_after_mutation():
    cmd = sm.StateCallCommand()
    cmd.stateName = "panes"
    baseline = cmd.SerializeToString()
    _ = cmd.ttl  # read-only access must NOT add the ttl field to the wire
    assert cmd.SerializeToString() == baseline
    cmd.ttl.durationMs = 7  # mutation must
    assert cmd.SerializeToString() != baseline
    parsed = sm.StateCallCommand()
    parsed.ParseFromString(cmd.SerializeToString())
    assert parsed.ttl.durationMs == 7


def test_explicitly_set_default_scalar_roundtrips():
    msg = sm.SetHandleState(state=sm.PRE_INIT)  # enum value 0
    parsed = sm.SetHandleState()
    parsed.ParseFromString(msg.SerializeToString())
    assert parsed.state == sm.PRE_INIT


def test_repeated_message_and_scalar_parse():
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=111),
            sm.TimerInfo(key=b"k2", timestampMs=222),
        ],
        requireNextFetch=True,
    )
    parsed = sm.StateResponseWithTimer()
    parsed.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in parsed.timer] == [
        (b"k1", 111),
        (b"k2", 222),
    ]
    assert parsed.requireNextFetch is True

    lst = sm.StateResponseWithListGet(value=[b"a", b"", b"ccc"])
    parsed2 = sm.StateResponseWithListGet()
    parsed2.ParseFromString(lst.SerializeToString())
    assert list(parsed2.value) == [b"a", b"", b"ccc"]


def test_unknown_fields_are_skipped():
    # field 15 (unused in Get) as varint, then a known message after it
    payload = (
        _shim.encode_tag(15, _shim.WIRETYPE_VARINT)
        + _shim.encode_varint(99)
        + sm.StateResponse(statusCode=3, errorMessage="boom").SerializeToString()
    )
    # Parse the unknown-prefixed buffer as StateResponse: field 15 skipped,
    # then statusCode/errorMessage parsed normally.
    parsed = sm.StateResponse()
    parsed.ParseFromString(payload)
    assert parsed.statusCode == 3
    assert parsed.errorMessage == "boom"


def test_negative_int32_field_roundtrip():
    msg = sm.StateResponse(statusCode=-2, errorMessage="x")
    parsed = sm.StateResponse()
    parsed.ParseFromString(msg.SerializeToString())
    assert parsed.statusCode == -2


def test_utf8_string_roundtrip():
    msg = sm.ParseStringSchema(schema="näïve ünïcode ☃")
    parsed = sm.ParseStringSchema()
    parsed.ParseFromString(msg.SerializeToString())
    assert parsed.schema == "näïve ünïcode ☃"


def test_packed_scalar_parse():
    # The shim must accept packed repeated scalars (canonical proto3
    # encoders pack numeric repeated fields). Build a packed buffer by
    # hand against a repeated-varint descriptor from the descriptor test
    # fixture below.
    fd = _shim.parse_file_descriptor(_TEST_FDP)
    cls = _shim.make_message_class(
        fd.message_types_by_name["Packed"], __name__
    )
    inner = b"".join(_shim.encode_varint(v) for v in (3, 270, 86942))
    buf = (
        _shim.encode_tag(1, _shim.WIRETYPE_LENGTH_DELIMITED)
        + _shim.encode_varint(len(inner))
        + inner
    )
    msg = cls()
    msg.ParseFromString(buf)
    assert list(msg.vals) == [3, 270, 86942]


def _fdp_field(name: str, number: int, ftype: int, label: int) -> bytes:
    """Hand-encode a FieldDescriptorProto (fields: name=1, number=3,
    label=4, type=5)."""
    out = bytearray()
    nb = name.encode()
    out += _shim.encode_tag(1, 2) + _shim.encode_varint(len(nb)) + nb
    out += _shim.encode_tag(3, 0) + _shim.encode_varint(number)
    out += _shim.encode_tag(4, 0) + _shim.encode_varint(label)
    out += _shim.encode_tag(5, 0) + _shim.encode_varint(ftype)
    return bytes(out)


def _fdp_message(name: str, *fields: bytes) -> bytes:
    out = bytearray()
    nb = name.encode()
    out += _shim.encode_tag(1, 2) + _shim.encode_varint(len(nb)) + nb
    for f in fields:
        out += _shim.encode_tag(2, 2) + _shim.encode_varint(len(f)) + f
    return bytes(out)


def _fdp_file(name: str, *messages: bytes) -> bytes:
    out = bytearray()
    nb = name.encode()
    out += _shim.encode_tag(1, 2) + _shim.encode_varint(len(nb)) + nb
    for m in messages:
        out += _shim.encode_tag(4, 2) + _shim.encode_varint(len(m)) + m
    return bytes(out)


_TEST_FDP = _fdp_file(
    "protoshim_test.proto",
    _fdp_message(
        "Packed",
        _fdp_field("vals", 1, _shim.TYPE_INT64, _shim.LABEL_REPEATED),
    ),
)


def test_descriptor_parse_of_pyspark_blob():
    d = sm.StateRequest.DESCRIPTOR
    assert d.full_name.endswith("StateRequest")
    assert d.fields_by_name["version"].number == 1
    assert "method" in d.oneofs_by_name
    # every oneof member resolves to a concrete message class
    for f in d.oneofs_by_name["method"].fields:
        assert f.message_type._concrete_class is not None


def test_shim_defers_to_native_runtime():
    # In this container the shim is active; the marker proves which one.
    import google.protobuf as gp

    assert ensure_protobuf_runtime() in ("native", "shim")
    assert hasattr(gp, "__version__")


def test_shim_defers_to_real_runtime_later_on_sys_path(tmp_path):
    """ADVICE r4: the PYTHONPATH prepend puts the shim BEFORE
    site-packages in every spawned worker, so on a mixed cluster an
    executor with the real wheel would silently get the shim. The
    vendored __init__ must detect a real google.protobuf later on
    sys.path and re-execute itself from it. Simulated in a subprocess:
    a fake 'real' installation (sentinel __version__) sits after the
    vendor dir."""
    import subprocess
    import sys

    from tutorial_apache_beam_spark.protoshim import VENDOR_DIR

    real = tmp_path / "sitepkgs"
    (real / "google" / "protobuf").mkdir(parents=True)
    (real / "google" / "__init__.py").write_text(
        "__path__ = __import__('pkgutil').extend_path(__path__, __name__)\n"
    )
    (real / "google" / "protobuf" / "__init__.py").write_text(
        "__version__ = '9.9.9-real-sentinel'\n"
    )
    code = (
        "import google.protobuf as gp; print(gp.__version__); "
        "print(gp.__file__)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={"PYTHONPATH": f"{VENDOR_DIR}:{real}", "PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    assert out[0] == "9.9.9-real-sentinel"
    assert out[1].startswith(str(real))

    # And without a real installation the shim itself still activates.
    out2 = subprocess.run(
        [sys.executable, "-c", code],
        env={"PYTHONPATH": str(VENDOR_DIR), "PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    assert out2[0] == "6.33.0"
    assert out2[1].startswith(str(VENDOR_DIR))


def test_shim_skips_its_own_symlink_alias(tmp_path):
    """ADVICE r5: if the vendor dir appears on sys.path under a
    SYMLINKED alias, the abspath comparison missed it and the shim
    re-executed its own __init__ (deep recursion before falling back).
    With realpath-based self detection the aliased entry is skipped and
    the shim activates directly, no recursion."""
    import subprocess
    import sys

    from tutorial_apache_beam_spark.protoshim import VENDOR_DIR

    alias = tmp_path / "alias-protoshim"
    alias.symlink_to(VENDOR_DIR)
    code = (
        "import sys; sys.setrecursionlimit(80); "  # recursion fails loudly
        "import google.protobuf as gp; print(gp.__version__)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        env={"PYTHONPATH": f"{VENDOR_DIR}:{alias}", "PATH": "/usr/bin:/bin"},
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    assert out[0] == "6.33.0"


# --- generative roundtrip over random descriptors/values --------------------


def _fdp_field_full(name, number, ftype, label, type_name=""):
    out = bytearray()
    nb = name.encode()
    out += _shim.encode_tag(1, 2) + _shim.encode_varint(len(nb)) + nb
    out += _shim.encode_tag(3, 0) + _shim.encode_varint(number)
    out += _shim.encode_tag(4, 0) + _shim.encode_varint(label)
    out += _shim.encode_tag(5, 0) + _shim.encode_varint(ftype)
    if type_name:
        tb = type_name.encode()
        out += _shim.encode_tag(6, 2) + _shim.encode_varint(len(tb)) + tb
    return bytes(out)


_SCALARS = [
    _shim.TYPE_INT32, _shim.TYPE_INT64, _shim.TYPE_UINT64, _shim.TYPE_BOOL,
    _shim.TYPE_STRING, _shim.TYPE_BYTES, _shim.TYPE_DOUBLE, _shim.TYPE_FLOAT,
    _shim.TYPE_FIXED64, _shim.TYPE_FIXED32, _shim.TYPE_SFIXED64,
    _shim.TYPE_SFIXED32, _shim.TYPE_SINT32, _shim.TYPE_SINT64,
]


def _rand_value(rng, ftype):
    if ftype == _shim.TYPE_BOOL:
        return rng.random() < 0.5
    if ftype == _shim.TYPE_STRING:
        return "".join(rng.choice("aé☃bc") for _ in range(rng.randint(0, 8)))
    if ftype == _shim.TYPE_BYTES:
        return bytes(rng.randrange(256) for _ in range(rng.randint(0, 8)))
    if ftype == _shim.TYPE_DOUBLE:
        return rng.choice([0.0, -1.5, 3.14159, 1e300, -1e-300])
    if ftype == _shim.TYPE_FLOAT:
        return rng.choice([0.0, -1.5, 0.25, 1024.0])  # exact in float32
    if ftype in (_shim.TYPE_UINT64, _shim.TYPE_FIXED64):
        return rng.randrange(2**64)
    if ftype == _shim.TYPE_FIXED32:
        return rng.randrange(2**32)
    if ftype in (_shim.TYPE_SFIXED32, _shim.TYPE_SINT32, _shim.TYPE_INT32):
        return rng.randrange(-(2**31), 2**31)
    return rng.randrange(-(2**63), 2**63)  # int64/sint64/sfixed64


def test_generative_roundtrip_all_scalar_types():
    """300 random messages over a descriptor exercising EVERY scalar
    wire type (singular + repeated) plus a nested message: serialize →
    parse must reproduce every explicitly-set field exactly. This covers
    the wire types the StateMessage schema never touches (fixed/float/
    zigzag), so a future schema using them doesn't find dead code."""
    import random as _random

    fields = []
    num = 1
    for t in _SCALARS:
        fields.append(_fdp_field_full(f"f{num}", num, t, _shim.LABEL_OPTIONAL))
        num += 1
    for t in _SCALARS:
        fields.append(_fdp_field_full(f"r{num}", num, t, _shim.LABEL_REPEATED))
        num += 1
    fields.append(
        _fdp_field_full(
            "child", num, _shim.TYPE_MESSAGE, _shim.LABEL_OPTIONAL, ".gen.Inner"
        )
    )
    inner = _fdp_message(
        "Inner", _fdp_field("x", 1, _shim.TYPE_INT64, _shim.LABEL_OPTIONAL)
    )
    outer = _fdp_message("Outer", *fields)
    fdp = bytearray()
    nb = b"gen_roundtrip.proto"
    fdp += _shim.encode_tag(1, 2) + _shim.encode_varint(len(nb)) + nb
    pb = b"gen"
    fdp += _shim.encode_tag(2, 2) + _shim.encode_varint(len(pb)) + pb
    for m in (outer, inner):
        fdp += _shim.encode_tag(4, 2) + _shim.encode_varint(len(m)) + m

    fd = _shim.parse_file_descriptor(bytes(fdp))
    Outer = _shim.make_message_class(fd.message_types_by_name["Outer"], __name__)
    Inner = _shim.make_message_class(fd.message_types_by_name["Inner"], __name__)

    rng = _random.Random(6604)
    by_name = Outer.DESCRIPTOR.fields_by_name
    for _case in range(300):
        msg = Outer()
        expect = {}
        for fname, fdesc in by_name.items():
            if fdesc.type == _shim.TYPE_MESSAGE:
                if rng.random() < 0.5:
                    msg.child = Inner(x=_rand_value(rng, _shim.TYPE_INT64))
                    expect["child"] = msg.child.x
                continue
            if fdesc.is_repeated:
                if rng.random() < 0.5:
                    vals = [
                        _rand_value(rng, fdesc.type)
                        for _ in range(rng.randint(1, 4))
                    ]
                    getattr(msg, fname).extend(vals)
                    expect[fname] = vals
            elif rng.random() < 0.6:
                v = _rand_value(rng, fdesc.type)
                setattr(msg, fname, v)
                expect[fname] = v

        parsed = Outer()
        parsed.ParseFromString(msg.SerializeToString())
        for fname, want in expect.items():
            fdesc = by_name.get(fname)
            if fname == "child":
                assert parsed.child.x == want
            elif fdesc.is_repeated:
                got = list(getattr(parsed, fname))
                if fdesc.type == _shim.TYPE_FLOAT:
                    assert got == pytest.approx(want)
                else:
                    assert got == want, (fname, fdesc.type)
            else:
                got = getattr(parsed, fname)
                if fdesc.type == _shim.TYPE_FLOAT:
                    assert got == pytest.approx(want)
                else:
                    assert got == want, (fname, fdesc.type)


# --- recorded-exchange conformance corpus (VERDICT r4 item 8) ---------------


def test_recorded_exchange_corpus_roundtrips():
    """Replay tests/data/protoshim_corpus.jsonl — real StateMessage
    payloads captured (PROTOSHIM_TRACE_FULL) from live RocksDB
    state-server drains of all three state-v2 operators. Three pins per
    entry:

    1. the payload still parses under the CURRENT generated
       StateMessage_pb2 + shim codec (a pyspark upgrade that changes the
       wire surface fails here, not as a hung drain);
    2. serialize(parse(wire)) is byte-identical to the canonical form
       recorded when the exchange was live (shim behavior drift fails);
    3. the canonical form is a serialize/parse fixed point.

    Refresh after an intentional protocol change:
    `python tools/record_protoshim_corpus.py`.
    """
    import json
    import os

    from tools.record_protoshim_corpus import canonicalize, message_classes

    path = os.path.join(
        os.path.dirname(__file__), "data", "protoshim_corpus.jsonl"
    )
    classes = message_classes()
    n = 0
    kinds = set()
    with open(path) as fh:
        for line in fh:
            e = json.loads(line)
            wire = bytes.fromhex(e["wire"])
            got = canonicalize(classes, e["msg"], wire)
            assert got.hex() == e["canonical"], (e["op"], e["msg"])
            fixed = canonicalize(classes, e["msg"], got)
            assert fixed == got, (e["op"], e["msg"])
            n += 1
            kinds.add((e["op"], e["msg"]))
    assert n >= 100
    # breadth: every state-variable family + timers must be present
    names = {m.rsplit(".", 1)[-1] for _op, m in kinds}
    for required in (
        "ValueStateCall", "ListStateCall", "MapStateCall", "RegisterTimer",
        "DeleteTimer", "StateResponseWithListGet", "StateResponseWithTimer",
    ):
        assert required in names, f"corpus lost {required} coverage"
    # ... and the TTLConfig wire field (the ProcessingTime retention
    # path) must appear in at least one recorded StateCallCommand
    import json as _json

    ttl_seen = 0
    with open(path) as fh:
        for line in fh:
            e = _json.loads(line)
            if e["msg"].rsplit(".", 1)[-1] == "StateCallCommand":
                m = classes[e["msg"]]()
                m.ParseFromString(bytes.fromhex(e["wire"]))
                if m.ttl.durationMs:
                    ttl_seen += 1
    assert ttl_seen, "corpus lost TTLConfig coverage"
