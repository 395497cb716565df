"""Deduplication operators for large-scale document corpora.

Family (north-star scope, SURVEY §2.6 last row):
- exact dedup            — hash-groupBy on the normalized text,
- n-gram Jaccard near-dup — inverted-index candidates + exact verify,
- MinHash + LSH near-dup — signature bands → bucket join → exact verify,
- SimHash near-dup       — bit-majority fingerprint, banded hamming join.

Design for 100 TB:
- Candidate generation is always an equi-join on a small key (shingle,
  band bucket, simhash chunk) — never an O(n²) cross join. Shuffle volume
  is proportional to the inverted index, not the pair space.
- Hot keys are the scale hazard: a shingle occurring in f docs yields
  f·(f−1)/2 candidate pairs. `max_doc_freq` drops such stop-shingles
  (standard practice); AQE skew-join splitting covers the remainder.
- Sketches (MinHash/SimHash) are row-local array expressions over the
  portable hash (functions.hashing) — no UDFs, no extra shuffles, and
  bit-identical to the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.functions.hashing import (
    minhash_signature,
    portable_hash64,
    simhash32,
)
from tutorial_apache_beam_spark.functions.text import tokens, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical row (min id) per exact text value.

    A single hash aggregation — the map-side partial min makes the shuffle
    carry one row per distinct text per partition. For very long texts,
    group on `md5(text)` instead so shuffle keys stay small; here the raw
    value is grouped to keep the oracle trivially equivalent.
    """
    return df.groupBy(text_col).agg(F.min(id_col).alias(id_col)).select(id_col, text_col)


def with_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, distinct word-n-gram shingles) per document — the shared
    preprocessing for every near-dup operator."""
    return df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(tokens(F.col(text_col)), n)).alias("shingles"),
    )


def _verified_pairs(
    candidates: DataFrame, shingled: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Join candidate (a, b) id pairs back to shingle sets and keep pairs
    with exact Jaccard ≥ threshold. Output: (id_a, id_b, jaccard)."""
    sa = shingled.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    sb = shingled.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard, candidates from an
    inverted shingle index (docs sharing ≥1 non-hot shingle)."""
    shingled = with_shingles(df, text_col, id_col, n)
    inv = shingled.select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    )
    # Drop stop-shingles: a shingle in f docs contributes O(f^2) pairs.
    hot = (
        inv.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_doc_freq)
        .select("shingle")
    )
    inv = inv.join(F.broadcast(hot), "shingle", "left_anti")
    a = inv.select(F.col("shingle"), F.col(id_col).alias("id_a"))
    b = inv.select(F.col("shingle"), F.col(id_col).alias("id_b"))
    candidates = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verified_pairs(candidates, shingled, id_col, threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.2,
) -> DataFrame:
    """MinHash(k) + LSH(bands) near-dup pairs with exact-Jaccard verify.

    Signature is k portable universal-hash minima over shingle hashes
    (row-local); each band of r = k/bands values md5-concats into one
    bucket key; docs sharing any (band, bucket) become candidates. At
    scale the band join shuffles one row per doc per band — n·bands rows —
    versus n² for naive pairing; the verify join touches only candidates.
    """
    r = k // bands
    shingled = with_shingles(df, text_col, id_col, n).filter(
        F.size("shingles") > 0
    )
    hashed = shingled.select(
        F.col(id_col),
        F.transform("shingles", portable_hash64).alias("hashes"),
    )
    sig = hashed.select(F.col(id_col), *minhash_signature(F.col("hashes"), k))
    band_rows = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",", *[F.col(f"mh{bi * r + j}") for j in range(r)]
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = band_rows.select("band", "bucket", F.col(id_col).alias("id_a"))
    b = band_rows.select("band", "bucket", F.col(id_col).alias("id_b"))
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verified_pairs(candidates, shingled, id_col, threshold)


def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """32-bit SimHash per document over token hashes (row-local)."""
    return df.select(
        F.col(id_col),
        simhash32(
            F.transform(tokens(F.col(text_col)), portable_hash64)
        ).alias("simhash"),
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: banded candidate join + hamming verify.

    Pigeonhole: two 32-bit simhashes within hamming distance 3 agree on at
    least one of 4 byte-chunks, so an equi-join per chunk finds every such
    pair without a cross join. Output: (id_a, id_b, hamming).
    """
    fp = simhash_fingerprints(df, text_col, id_col)
    chunks = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("chunk"),
                        F.shiftright("simhash", 8 * j).bitwiseAND(F.lit(255)).alias("ck"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("cc"),
    ).select(
        F.col(id_col), F.col("simhash"), F.col("cc.chunk").alias("chunk"), F.col("cc.ck").alias("ck")
    )
    a = chunks.select("chunk", "ck", F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = chunks.select("chunk", "ck", F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["chunk", "ck"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
