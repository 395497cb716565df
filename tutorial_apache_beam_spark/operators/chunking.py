"""Token-window document chunking for training-data assembly.

Pretraining corpora split long documents into fixed-size token windows
with overlap (stride < size) before packing — every public data pipeline
(C4, Pile, Dolma) has this stage. The reference repo has no text
pipeline (two-pipeline Beam tutorial, `Demo1.java:33-107`); this module
is LLM-extension scope.

Everything is row-local array expressions (sequence/transform/slice) —
whole-stage codegen, no shuffle, no Python row path. A document's chunk
layout depends only on its own token count, so work spreads per-row
regardless of document-length skew, and the operator composes with any
scan at 100 TB with zero data movement until the caller explodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.functions.hashing import portable_hash64
from tutorial_apache_beam_spark.functions.text import tokens


def _chunk_starts(n_tokens: Column, stride: int) -> Column:
    """[0, stride, 2·stride, …) below n_tokens; empty for token-less docs."""
    return F.when(
        n_tokens > 0,
        F.sequence(F.lit(0), n_tokens - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))


def _validate_window(size: int, stride: int) -> None:
    """Loud plan-time rejection (the _duration_ms philosophy): size <= 0
    silently yields empty chunks for every document (F.slice with a
    non-positive length returns []), and stride <= 0 only fails deep in
    the executor's sequence() — both should fail at the call site."""
    if size <= 0 or stride <= 0:
        raise ValueError(
            f"chunking needs size > 0 and stride > 0, got size={size} "
            f"stride={stride}"
        )


def chunk_token_arrays(
    toks: Column, size: int = 64, stride: int = 48
) -> Column:
    """array<array<string>>: overlapping token windows of `size`, step
    `stride` (the final windows may be shorter; stride > size leaves
    gaps, which sampling-style callers may legitimately want).
    Row-local."""
    _validate_window(size, stride)
    return F.transform(
        _chunk_starts(F.size(toks), stride),
        lambda s: F.slice(toks, s + 1, size),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """One row per chunk: (id, chunk_id, chunk_text, n_chunk_tokens).

    The explode multiplies rows ~n_tokens/stride per document — the only
    data growth; chunk construction itself is row-local.
    """
    chunks = chunk_token_arrays(tokens(F.col(text_col)), size, stride)
    return (
        df.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_id", "chunk_toks"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.array_join("chunk_toks", " ").alias("chunk_text"),
            F.size("chunk_toks").alias("n_chunk_tokens"),
        )
    )


def chunk_fingerprints(
    toks: Column, size: int = 64, stride: int = 48
) -> tuple[Column, Column]:
    """(n_chunks, '|'-joined portable chunk hashes) — the row-local
    summary form: proves every chunk's exact token content bit-for-bit
    through one string column (oracle-checkable; raw nested arrays are
    banned from gate outputs)."""
    arrays = chunk_token_arrays(toks, size, stride)
    fps = F.transform(
        arrays, lambda c: portable_hash64(F.array_join(c, " ")).cast("string")
    )
    return F.size(arrays), F.array_join(fps, "|")


def chunk_fingerprints_sql(
    toks_expr: str, size: int = 64, stride: int = 48
) -> tuple[str, str]:
    """The identical (n_chunks, joined hashes) in DuckDB SQL.

    DuckDB `range(a, b, s)` is empty when b <= a, matching the
    token-less-document case; `list_slice` is 1-based inclusive like
    Spark `slice(x, start, length)` re-expressed as [s+1, s+size].
    """
    from tutorial_apache_beam_spark.functions.hashing import (
        portable_hash64_sql,
    )

    _validate_window(size, stride)
    starts = f"range(0, greatest(len({toks_expr}), 0), {stride})"
    chunk = f"list_slice({toks_expr}, s + 1, s + {size})"
    chunk_text = f"array_to_string({chunk}, ' ')"
    fp = f"CAST({portable_hash64_sql(chunk_text)} AS VARCHAR)"
    n = f"len({starts})"
    joined = f"array_to_string(list_transform({starts}, s -> {fp}), '|')"
    return n, joined
