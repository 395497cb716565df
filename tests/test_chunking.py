"""Token-window chunking operator tests (operators/chunking.py).

The registered gate (`split_and_pack`) hash-checks every chunk's content
against DuckDB; these tests pin the exploded form's layout semantics on
hand-built documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tutorial_apache_beam_spark.operators.chunking import (
    chunk_documents,
    chunk_fingerprints,
)


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_chunk_layout_overlap(spark):
    # 10 tokens, size 4, stride 3 -> starts 0,3,6,9
    text = " ".join(f"w{i}" for i in range(10))
    rows = chunk_documents(_doc(spark, text), size=4, stride=3).collect()
    got = [(r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"]) for r in rows]
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
        (3, "w9", 1),
    ]


def test_chunk_short_and_exact_docs(spark):
    # shorter than one window -> single chunk; exact multiple -> no runt
    assert [
        r["chunk_text"]
        for r in chunk_documents(_doc(spark, "a b"), size=4, stride=3).collect()
    ] == ["a b"]
    rows = chunk_documents(
        _doc(spark, "a b c d e f"), size=3, stride=3
    ).collect()
    assert [r["chunk_text"] for r in rows] == ["a b c", "d e f"]


def test_empty_doc_yields_no_chunks(spark):
    assert chunk_documents(_doc(spark, ""), size=4, stride=3).count() == 0


def test_fingerprint_summary_matches_explode(spark):
    text = " ".join(f"t{i % 7}" for i in range(25))
    df = _doc(spark, text)
    n, fps = chunk_fingerprints(
        F.split(F.lower(F.col("text")), " "), size=8, stride=5
    )
    row = df.select(n.alias("n"), fps.alias("fps")).first()
    exploded = chunk_documents(df, size=8, stride=5).count()
    assert row["n"] == exploded
    assert len(row["fps"].split("|")) == exploded


def test_chunking_rejects_nonpositive_window(spark):
    """r6: size <= 0 silently produced empty chunks for every document
    (slice with non-positive length returns []); stride <= 0 only blew
    up in the executor. Both now raise at plan time."""
    import pytest

    from tutorial_apache_beam_spark.operators.chunking import (
        chunk_fingerprints_sql,
    )

    for size, stride in ((0, 48), (64, 0), (-4, 3), (4, -3)):
        with pytest.raises(ValueError, match="size > 0"):
            chunk_documents(_doc(spark, "a b c"), size=size, stride=stride)
        with pytest.raises(ValueError, match="size > 0"):
            chunk_fingerprints_sql("toks", size=size, stride=stride)
