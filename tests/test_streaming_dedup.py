"""Streaming SimHash near-dedup: first-seen fingerprint wins within the
watermark (ingest-time near-dup suppression, operators.dedup)."""

from __future__ import annotations

import json

from tutorial_apache_beam_spark.operators.dedup import streaming_simhash_dedup
from tutorial_apache_beam_spark.streaming.replay import run_stream_to_memory

BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC
SCHEMA = "doc_id BIGINT, epoch BIGINT, text STRING"


def test_streaming_simhash_dedup_drops_fingerprint_twins(spark, tmp_path):
    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    docs = [
        # Two byte-identical re-crawls of doc 1 and one distinct doc.
        (1, 0, "the quick brown fox jumps over the lazy dog"),
        (2, 5, "the quick brown fox jumps over the lazy dog"),
        (3, 10, "a completely different document about spark streams"),
        # Token multiset identical (SimHash is order-insensitive) — also a twin.
        (4, 15, "lazy the dog quick brown fox jumps over the"),
        # Two empty payloads: fingerprint 0, collapse to one survivor.
        (5, 20, ""),
        (6, 25, ""),
    ]
    (src / "b0.json").write_text(
        "\n".join(
            json.dumps({"doc_id": d, "epoch": BASE_EPOCH + s, "text": t})
            for d, s, t in docs
        )
        + "\n"
    )
    sdf = (
        spark.readStream.schema(SCHEMA)
        .json(str(src))
        .select("doc_id", F.timestamp_seconds("epoch").alias("ts"), "text")
    )
    out = run_stream_to_memory(
        streaming_simhash_dedup(sdf), spark, output_mode="append"
    )
    survivors = {r.doc_id for r in out.collect()}
    # One survivor per fingerprint class: {1,2,4} -> one of them, {3},
    # {5,6} -> one. Arrival order within a micro-batch is nondeterministic,
    # so assert the class structure, not the exact ids.
    assert len(survivors) == 3
    assert 3 in survivors
    assert len(survivors & {1, 2, 4}) == 1
    assert len(survivors & {5, 6}) == 1
