"""Similarity-search queries over the embeddings fixture.

Cosine arithmetic in the oracle mirrors the Spark implementation exactly:
double-cast vectors, sequential-fold dot products, round(·, 4) before any
threshold or ordering — so include/exclude decisions agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    srp_ann_topk,
)
from tutorial_apache_beam_spark.registry import register

_COS = (
    "round(list_dot_product(a.ve, b.ve) / "
    "(sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 4)"
)


@register(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    p AS (SELECT * FROM v WHERE vec_id % 100 = 0),
    scored AS (
      SELECT a.vec_id AS probe_id, b.vec_id AS vec_id, {_COS} AS cos
      FROM p a JOIN v b ON b.vec_id <> a.vec_id)
    SELECT probe_id, vec_id, cos FROM (
      SELECT probe_id, vec_id, cos,
             row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, vec_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for every 100th vector (the ANN
    correctness baseline: one corpus scan, broadcast probes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return cosine_topk(emb, probes, k=5)


@register(
    "embedding_cosine_near_dups",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)
    SELECT id_a, id_b, cos FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cos
      FROM v a JOIN v b ON a.vec_id < b.vec_id)
    WHERE cos >= 0.35
    """,
)
def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine ≥ 0.35 (exact pairwise; the oracle
    brute-forces the same space)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.35)


@register("ann_topk_variants")
def ann_topk_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors under BOTH ANN index families in one
    gate (merges round-1's `srp_ann_topk` + `ivf_ann_topk`):

    - srp: sign-random-projection LSH buckets (3 independent tables);
    - ivf: coarse quantization into centroid buckets, nprobe=2.

    No SQL oracle (approximate recall is implementation-defined); the
    companion exact query `cosine_topk_bruteforce` anchors correctness,
    and pytests assert every returned neighbor's cosine matches the exact
    computation plus non-trivial recall for each method.
    """
    from tutorial_apache_beam_spark.operators.similarity import ivf_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    srp = srp_ann_topk(emb, probes, k=5).select(
        F.lit("srp").alias("method"), "probe_id", "vec_id", "cos"
    )
    ivf = ivf_ann_topk(emb, probes, k=5, nprobe=2).select(
        F.lit("ivf").alias("method"), "probe_id", "vec_id", "cos"
    )
    return srp.unionByName(ivf)
