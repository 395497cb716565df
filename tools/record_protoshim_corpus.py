"""Record a conformance corpus of real state-v2 wire exchanges.

The vendored protobuf runtime (vendor/protoshim) is load-bearing for the
whole transformWithStateInPandas family in this container. This tool
drains the three state-v2 operators (pane counts / group-into-batches /
ingest dedup) with PROTOSHIM_TRACE_FULL on, harvests every serialized
(SER, Python→JVM) and parsed (PAR, JVM→Python) StateMessage payload the
live RocksDB state-server protocol produced, dedups them, and writes
`tests/data/protoshim_corpus.jsonl` — one line per distinct exchange:

    {"op": "SER"|"PAR", "msg": <full_name>, "wire": <hex>,
     "canonical": <hex of serialize(parse(wire)) at record time>}

tests/test_protoshim.py replays the corpus on every run: each recorded
payload must still parse, and its canonical re-serialization must be
byte-identical to what was recorded (and a fixed point). A future
pyspark upgrade that extends or changes the wire surface — new fields,
new message types, different framing — then fails loudly in a unit test
instead of hanging a streaming drain (VERDICT r4 item 8).

Usage: python tools/record_protoshim_corpus.py  (rewrites the corpus)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CORPUS_PATH = os.path.join(REPO, "tests", "data", "protoshim_corpus.jsonl")
# Cap distinct payloads kept per (op, message) so the committed corpus
# stays reviewable; coverage comes from message-type breadth, not from
# thousands of near-identical Get/Update payloads.
PER_KEY_CAP = 12

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
BASE_EPOCH = 1704067230


def message_classes() -> dict:
    """full_name → concrete shim class, for every message reachable from
    pyspark's generated StateMessage_pb2 (nested types included)."""
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    out: dict = {}

    def walk(desc):
        cls = getattr(desc, "_concrete_class", None)
        if cls is None or desc.full_name in out:
            return
        out[desc.full_name] = cls
        for nested in desc.nested_types:
            walk(nested)

    for attr in vars(sm).values():
        desc = getattr(attr, "DESCRIPTOR", None)
        if desc is not None and hasattr(desc, "fields_by_name"):
            walk(desc)
    return out


def canonicalize(classes: dict, full_name: str, wire: bytes) -> bytes:
    msg = classes[full_name]()
    msg.ParseFromString(wire)
    return msg.SerializeToString()


def _drain_all(work_root: str) -> None:
    """Run the three state-v2 operators end-to-end (same shapes as
    tests/test_tws_panes.py) so the trace sees the full message surface:
    ValueState get/update/clear, ListState get/put/appendList, MapState
    containsKey/updateValue, timers register/delete/expire, TTL config.
    """
    from pyspark.sql import functions as F

    from tutorial_apache_beam_spark import get_spark
    from tutorial_apache_beam_spark.streaming.tws import (
        tws_group_into_batches,
        tws_ingest_dedup,
        tws_pane_counts,
    )

    spark = get_spark(app_name="protoshim_corpus", shuffle_partitions=2)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    )

    src = os.path.join(work_root, "src")
    os.makedirs(src)
    rows = []
    for i in range(3):
        rows.append(
            {"event_time": BASE_EPOCH + i, "user_id": 7, "event_id": i}
        )
    rows.append({"event_time": BASE_EPOCH + 5, "user_id": 9, "event_id": 50})
    with open(os.path.join(src, "b0.json"), "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows) + "\n")
    more = [
        {"event_time": BASE_EPOCH + 60 + i, "user_id": 7, "event_id": 10 + i}
        for i in range(4)
    ] + [{"event_time": BASE_EPOCH + 11, "user_id": 9, "event_id": 50}]
    with open(os.path.join(src, "b1.json"), "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in more) + "\n")

    schema = "event_time BIGINT, user_id BIGINT, event_id BIGINT"

    def stream():
        return (
            spark.readStream.schema(schema)
            .json(src)
            .select(
                F.timestamp_seconds("event_time").alias("ts"),
                "user_id",
                "event_id",
            )
        )

    ops = [
        ("panes", lambda: tws_pane_counts(stream())),
        (
            "batches",
            lambda: tws_group_into_batches(
                stream().withWatermark("ts", "0 seconds"), batch_size=3
            ),
        ),
        ("dedup", lambda: tws_ingest_dedup(stream(), ttl=None)),
    ]
    for name, build in ops:
        q = (
            build()
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", os.path.join(work_root, f"out_{name}"))
            .option(
                "checkpointLocation", os.path.join(work_root, f"ck_{name}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # TTL mode (ProcessingTime): the TTLConfig wire field is the one
    # production retention feature the availableNow drains above never
    # send. Continuous trigger + poll + stop, as in the TTL smoke test.
    import time

    q = (
        tws_ingest_dedup(stream(), ttl="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("protoshim_corpus_ttl")
        .option("checkpointLocation", os.path.join(work_root, "ck_ttl"))
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if q.exception() is not None:
                raise q.exception()
            if len(spark.sql("SELECT 1 FROM protoshim_corpus_ttl").collect()):
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    spark.stop()


def main() -> None:
    # Trace env must be set before the JVM (and its Python workers) start.
    trace_dir = tempfile.mkdtemp(prefix="protoshim_trace_")
    os.environ["PROTOSHIM_TRACE"] = trace_dir
    os.environ["PROTOSHIM_TRACE_FULL"] = "1"

    from tutorial_apache_beam_spark.protoshim import ensure_protobuf_runtime

    if ensure_protobuf_runtime() != "shim":
        raise SystemExit(
            "a native google.protobuf is installed — the corpus must be "
            "recorded through the shim codec (PROTOSHIM_TRACE hooks live "
            "there); run in a container without the protobuf wheel"
        )

    work_root = tempfile.mkdtemp(prefix="protoshim_corpus_")
    _drain_all(work_root)

    classes = message_classes()
    seen: set = set()
    per_key: dict = {}
    entries = []
    import glob as _glob

    for path in sorted(_glob.glob(os.path.join(trace_dir, "*.log"))):
        with open(path) as fh:
            for line in fh:
                parts = line.split()
                # An all-default message serializes to ZERO bytes: its
                # trace line has an empty hex field (3 parts). Keep it —
                # the empty-wire encoding path is corpus-worthy too.
                if len(parts) == 3 and parts[2] == "0B":
                    parts.append("")
                if len(parts) != 4:
                    continue
                op, full_name, _size, hexpayload = parts
                key = (op, full_name, hexpayload)
                if key in seen:
                    continue
                seen.add(key)
                cap_key = (op, full_name)
                if per_key.get(cap_key, 0) >= PER_KEY_CAP:
                    continue
                if full_name not in classes:
                    raise SystemExit(f"unknown message type {full_name}")
                wire = bytes.fromhex(hexpayload)
                canonical = canonicalize(classes, full_name, wire)
                per_key[cap_key] = per_key.get(cap_key, 0) + 1
                entries.append(
                    {
                        "op": op,
                        "msg": full_name,
                        "wire": hexpayload,
                        "canonical": canonical.hex(),
                    }
                )

    if not entries:
        raise SystemExit("no trace lines captured — did the drains run?")
    os.makedirs(os.path.dirname(CORPUS_PATH), exist_ok=True)
    with open(CORPUS_PATH, "w") as fh:
        for e in entries:
            fh.write(json.dumps(e) + "\n")
    kinds = sorted({(e["op"], e["msg"]) for e in entries})
    print(f"wrote {len(entries)} entries ({len(kinds)} (op, msg) kinds) "
          f"to {CORPUS_PATH}")
    for k in kinds:
        print("  ", k)


if __name__ == "__main__":
    main()
