"""Multimodal columns: opaque binary media + typed metadata, Pandas-UDF
decode/feature plumbing.

Real image/video codecs are NOT in this environment, so their decode
step is a clearly-marked deterministic stub (`_stub_decode`): metadata is
derived from the md5 of the raw bytes. Since round 5 two tiers decode
FOR REAL with zero dependencies: PCM WAV (RIFF) via the stdlib `wave`
module — `parse_wav` reads the header (channels/rate/duration) and
`wav_features` computes RMS/peak from the PCM samples (numpy,
Arrow-batched) — and image DIMENSIONS via `parse_image_header`
(PNG/GIF/BMP/JPEG containers store width/height in fixed header fields
or SOF markers). Undecodable bytes fall back to the stub. Everything around the decode
bodies — binary column schema, Arrow batch shape, `mapInPandas`
signatures, row-expanding frame sampling, partitioning — is the real
production plumbing; swapping in PIL/pyav only replaces the remaining
stub bodies (see `try_real_decoder`).

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


WAV_FEATURE_SCHEMA = (
    "doc_id BIGINT, channels INT, sample_rate INT, duration_ms INT, "
    "rms DOUBLE, peak DOUBLE"
)


def parse_wav(content: bytes) -> tuple[int, int, int] | None:
    """REAL header decode for PCM WAV: (channels, sample_rate,
    duration_ms), or None if the bytes are not a readable RIFF/WAVE.
    Pure stdlib (`wave`) — no codec dependency."""
    import io
    import wave

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    try:
        with wave.open(io.BytesIO(content)) as w:
            ch = w.getnchannels()
            sr = w.getframerate()
            n = w.getnframes()
    except (wave.Error, EOFError):
        return None
    return ch, sr, int(n * 1000 // sr) if sr else 0


def parse_image_header(content: bytes) -> tuple[str, int, int] | None:
    """REAL header decode for the ubiquitous image containers:
    (format, width, height) for PNG / GIF / BMP / JPEG, None otherwise.
    Dimensions live in fixed header fields (PNG IHDR, GIF logical screen,
    BMP info header) or SOF markers (JPEG) — no codec needed; pixel
    decode stays behind `try_real_decoder`.

    Contract note: `content` is expected to be the FULL byte column, not
    a fixed-size sniff prefix — the text-vs-container guards validate
    structure PAST the fixed header (GIF: through the global color table
    to the first introducer, up to 13+768+1 bytes for a 256-entry GCT;
    JPEG: the marker walk to SOFn), so a truncated real image can return
    None rather than its dimensions. That trade is deliberate: the gate
    feeds arbitrary corpus text tagged as media, where 'GIF87a'-prefixed
    ASCII decoding to garbage dimensions is the worse failure."""
    import struct

    def _valid(fmt: str, w: int, h: int):
        # A header whose dimensions aren't both positive is not a real
        # container — arbitrary corpus bytes must map to None, never to
        # garbage metadata (fuzzed in tests/test_llm_ops.py).
        return (fmt, w, h) if w > 0 and h > 0 else None

    if len(content) >= 24 and content[:8] == b"\x89PNG\r\n\x1a\n":
        if content[12:16] == b"IHDR":
            w, h = struct.unpack(">II", content[16:24])
            return _valid("png", w, h)
        return None
    if len(content) >= 14 and content[:6] in (b"GIF87a", b"GIF89a"):
        # 'GIF87a'/'GIF89a' can begin plain ASCII text too — mirror the
        # BMP dib-size guard with a logical-screen-descriptor sanity
        # check so ASCII bytes don't decode as dimensions. The 13-byte
        # header (signature, w, h, packed, background, aspect) is
        # followed by the global color table (if the packed-fields flag
        # says so) and then an introducer: extension 0x21, image
        # descriptor 0x2C, or trailer 0x3B. The background-index byte is
        # deliberately NOT checked: the spec says to ignore it when no
        # GCT is present, and real encoders do emit junk there.
        w, h = struct.unpack("<HH", content[6:10])
        packed = content[10]
        # Where the data stream starts: after the GCT when present.
        start = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
        if len(content) <= start:
            return None
        intro = content[start]
        if intro == 0x21:
            # Extension introducer must carry a published label byte
            # (graphic control / comment / plain text / application) —
            # printable ASCII after a '!' fails this.
            if len(content) <= start + 1 or content[start + 1] not in (
                0x01, 0xF9, 0xFE, 0xFF,
            ):
                return None
        elif intro == 0x2C:
            # Image descriptor is 9 more bytes; require it to fit.
            if len(content) < start + 10:
                return None
        elif intro != 0x3B:
            return None
        return _valid("gif", w, h)
    if len(content) >= 26 and content[:2] == b"BM":
        # 'BM' is also an English word prefix — plain text starting "BM"
        # would otherwise yield ASCII-derived garbage dimensions (both
        # int32 high bytes < 0x80, so always positive). Require the DIB
        # header-size field (bytes 14-18) to be one of the published
        # BITMAPINFOHEADER family sizes; ASCII text there decodes to
        # values like 0x20616562, never these.
        (dib_size,) = struct.unpack("<I", content[14:18])
        if dib_size not in (12, 40, 52, 56, 64, 108, 124):
            return None
        if dib_size == 12:
            # BITMAPCOREHEADER (OS/2): width/height are uint16 at bytes
            # 18-22, not the int32 pair of the BITMAPINFOHEADER family.
            w, h = struct.unpack("<HH", content[18:22])
            return _valid("bmp", w, h)
        w, h = struct.unpack("<ii", content[18:26])
        return _valid("bmp", w, abs(h))  # negative height = top-down DIB
    if len(content) >= 4 and content[:2] == b"\xff\xd8":
        # JPEG: walk the marker stream to the first SOFn frame header.
        pos = 2
        while pos + 9 <= len(content):
            if content[pos] != 0xFF:
                return None
            # JPEG permits runs of 0xFF fill bytes between segments —
            # skip padding until the actual marker byte.
            marker_pos = pos + 1
            while marker_pos < len(content) and content[marker_pos] == 0xFF:
                marker_pos += 1
            if marker_pos + 8 > len(content):
                return None
            marker = content[marker_pos]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos = marker_pos + 1  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(
                ">H", content[marker_pos + 1 : marker_pos + 3]
            )
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(
                    ">HH", content[marker_pos + 4 : marker_pos + 8]
                )
                return _valid("jpeg", w, h)
            pos = marker_pos + 1 + seg_len
        return None
    return None


def wav_features(media: DataFrame) -> DataFrame:
    """REAL audio feature extraction over the opaque binary column:
    per-document (channels, sample_rate, duration_ms, rms, peak) for
    every row whose content is decodable 16-bit PCM WAV; other rows are
    dropped (same contract as a parse-failure filter). Map-only
    Arrow-batched `mapInPandas` — media bytes never shuffle; at 100 TB
    the stage scales with scan width alone.

    RMS/peak are computed on samples normalized to [-1, 1] (int16 /
    32768), interleaved channels pooled — the standard loudness-feature
    convention, so thresholds transfer from audio tooling.
    """
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "channels", "sample_rate", "duration_ms",
                "rms", "peak",
            )}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                content = bytes(content)
                if (
                    len(content) < 12
                    or content[:4] != b"RIFF"
                    or content[8:12] != b"WAVE"
                ):
                    continue
                # ONE container parse per row: header fields and frames
                # from the same wave.open (parse_wav stays for the
                # header-only decode_metadata path).
                try:
                    with wave.open(io.BytesIO(content)) as w:
                        if w.getsampwidth() != 2:
                            continue  # 16-bit PCM only in this tier
                        ch = w.getnchannels()
                        sr = w.getframerate()
                        n = w.getnframes()
                        raw = w.readframes(n)
                except (wave.Error, EOFError):
                    continue
                duration_ms = int(n * 1000 // sr) if sr else 0
                samples = (
                    np.frombuffer(raw, dtype="<i2").astype(np.float64)
                    / 32768.0
                )
                rows["doc_id"].append(doc_id)
                rows["channels"].append(ch)
                rows["sample_rate"].append(sr)
                rows["duration_ms"].append(duration_ms)
                rows["rms"].append(
                    float(np.sqrt(np.mean(samples * samples)))
                    if len(samples)
                    else 0.0
                )
                rows["peak"].append(
                    float(np.max(np.abs(samples))) if len(samples) else 0.0
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(feats, WAV_FEATURE_SCHEMA)


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
            meta = []
            for mt, c in zip(pdf["media_type"], pdf["content"]):
                content = bytes(c)
                if mt == "audio":
                    wav = parse_wav(content)
                    if wav is not None:  # REAL decode: PCM WAV header
                        meta.append((0, 0, wav[2]))
                        continue
                elif mt == "image":
                    img = parse_image_header(content)
                    if img is not None:  # REAL decode: container header
                        meta.append((img[1], img[2], 0))
                        continue
                meta.append(_stub_decode(mt, content))
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
