"""Multimodal columns: opaque binary media + typed metadata, Pandas-UDF
decode/feature plumbing.

Real image/audio/video codecs are NOT in this environment, so the decode
step is a clearly-marked deterministic stub (`_STUB_DECODERS`): metadata is
derived from the md5 of the raw bytes. Everything around the stub — binary
column schema, Arrow batch shape, `mapInPandas` signatures, row-expanding
frame sampling, partitioning — is the real production plumbing; swapping in
PIL/librosa/pyav only replaces the function bodies (see `try_real_decoder`).

Because the stub derives values from md5, the whole Python path is
reproducible in SQL — the correctness gate covers the UDF plumbing, not
just row counts.

Scale notes: media bytes stay in one column and never pass through a
shuffle here — decode is a map-only stage; Arrow moves each batch to
Python once. For 100 TB of media, tune `spark.sql.files.maxPartitionBytes`
and `spark.sql.execution.arrow.maxRecordsPerBatch` so a batch of decoded
frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

DECODED_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, "
    "width INT, height INT, duration_ms INT"
)

FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_hash BIGINT"


def try_real_decoder():
    """Return the real decoder module if available — it is not in this
    container; callers fall back to the deterministic stub."""
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def _h60(data: bytes) -> int:
    """60-bit md5-derived value — identical to functions.hashing's portable
    hash when `data` is a UTF-8 string (and to the DuckDB oracle)."""
    return int(hashlib.md5(data).hexdigest()[:15], 16)


def _stub_decode(media_type: str, content: bytes) -> tuple[int, int, int]:
    """STUB: (width, height, duration_ms) derived deterministically from the
    byte content. Replace with real codecs outside this container."""
    h = _h60(content)
    width = 64 + h % 512
    height = 64 + (h // 512) % 512
    duration_ms = 1000 + (h // (512 * 512)) % 60000
    if media_type == "image":
        duration_ms = 0
    return width, height, duration_ms


def media_table(docs: DataFrame) -> DataFrame:
    """Synthesize the media fixture: text bytes as the opaque binary column
    (the point is the column type + plumbing, not the codec)."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
    )


def decode_metadata(media: DataFrame) -> DataFrame:
    """Binary → typed metadata via Arrow-batched mapInPandas (map-only)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if try_real_decoder() is not None:  # pragma: no cover — not in env
            raise NotImplementedError(
                "real codec path not implemented in this container"
            )
        for pdf in batches:
            meta = [
                _stub_decode(mt, bytes(c))
                for mt, c in zip(pdf["media_type"], pdf["content"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "duration_ms": [m[2] for m in meta],
                }
            )
            yield out

    return media.mapInPandas(decode, DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 10000) -> DataFrame:
    """Row-expanding frame sampler for video rows: one output row per
    sampled frame (a flat-map — mapInPandas yielding more rows than in).

    Frame count = duration_ms // every_ms + 1; each frame gets a
    deterministic content hash (stub for a real frame-grab + hash).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_hash": []}
            for _, r in pdf.iterrows():
                if r["media_type"] != "video":
                    continue
                content = bytes(r["content"])
                _, _, duration_ms = _stub_decode("video", content)
                for i in range(duration_ms // every_ms + 1):
                    rows["doc_id"].append(r["doc_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_hash"].append(
                        _h60(content + i.to_bytes(4, "big")) % (1 << 60)
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(sample, FRAME_SCHEMA)
