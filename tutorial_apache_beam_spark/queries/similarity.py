"""Similarity-search queries over the embeddings fixture.

Cosine arithmetic in the oracle mirrors the Spark implementation exactly:
double-cast vectors, sequential-fold dot products, round(·, 4) before any
threshold or ordering — so include/exclude decisions agree.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.operators.retrieval import (
    BM25_QUERIES,
    bm25_scored,
    query_terms_df,
)
from tutorial_apache_beam_spark.operators.similarity import (
    N_PLANES,
    N_TABLES,
    cosine_topk,
    embedding_neardup_pairs,
    ivf_ann_topk,
    srp_ann_topk,
)
from tutorial_apache_beam_spark.registry import register

_COS = (
    "round(list_dot_product(a.ve, b.ve) / "
    "(sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 4)"
)

# SRP bucket ids recomputed in SQL: hyperplane signs are the low bit of the
# portable md5 hash (operators/similarity.srp_sign — identical derivation),
# so DuckDB reproduces every (table, bucket) assignment exactly. The
# sign-of-dot boundary is fp-safe on the fixtures: min |projection| is
# ~5.6e-5 at sf0.1 vs ~1e-12 cross-engine summation noise (measured).
_SRP_BUCKETS = f"""
    signs AS (
      SELECT tt.t, pp.p, dd.d,
             CASE WHEN (('0x' || substring(md5('srp:' || tt.t || ':' || pp.p
                          || ':' || dd.d), 1, 15))::BIGINT & 1) = 1
                  THEN 1.0 ELSE -1.0 END AS s
      FROM (SELECT unnest(range({N_TABLES})) AS t) tt,
           (SELECT unnest(range({N_PLANES})) AS p) pp,
           (SELECT unnest(range(64)) AS d) dd),
    elems AS (
      SELECT vec_id, unnest(range(len(ve))) AS d, unnest(ve) AS val FROM v),
    dots AS (
      SELECT e.vec_id, s.t, s.p, sum(e.val * s.s) AS dot
      FROM elems e JOIN signs s USING (d)
      GROUP BY e.vec_id, s.t, s.p),
    buckets AS (
      SELECT vec_id, t,
             CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM dots GROUP BY vec_id, t)
"""

# IVF assignment recomputed in SQL: deterministic centroids (every 50th
# vector), nearest-centroid by unrounded cosine argmax. Engine-stable on the
# fixtures: min top1-top2 centroid-similarity gap is ≥6e-6 across SFs
# (measured) vs ~1e-14 cross-engine noise, so no rounding and no real ties.
_IVF_COS = (
    "list_dot_product(a.ve, c.cv) / "
    "(sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(c.cv, c.cv)))"
)
_IVF_ASSIGN = f"""
    cents AS (SELECT vec_id AS centroid_id, ve AS cv FROM v
              WHERE vec_id % 50 = 0),
    asgn AS (
      SELECT a.vec_id, c.centroid_id, row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY {_IVF_COS} DESC, c.centroid_id) AS rn
      FROM v a, cents c)
"""

# Reciprocal-rank fusion (r10, VERDICT r9 item 4): ONE hybrid ranking
# per keyword query q ∈ 1..5, fusing the sparse BM25 list (probe_id =
# q) with the four dense lists of the aligned embedding probe
# (vec_id = (q-1)·100 — the fixtures key documents and embeddings by
# the same id space, so doc_id i and vec_id i name the same item).
# Standard RRF with k=60 over each tier's top-5: score(q, id) =
# Σ_tier 1/(60 + rank_tier). Cross-engine exactness is by INTEGER
# algebra: each addend is LCM(61..65)/(60+rank) = an exact BIGINT
# (LCM = 495593280), summed exactly, divided by 495593280.0 once at
# the end — one IEEE division of identical integers on both engines,
# so no summation-order or rounding-boundary concern exists and the
# score needs no round() guard at all.
RRF_K = 60
# Derived, not hand-written: the exact-integer-algebra claim holds for
# ANY k because every addend RRF_LCM/(k+rank) divides exactly by
# construction (r10 review: a hand-pinned 495593280 next to hardcoded
# 60s let the two drift independently). For k=60 this is 495,593,280.
RRF_LCM = math.lcm(*range(RRF_K + 1, RRF_K + 6))

# BM25 recomputed in SQL (operators/retrieval.py mirrored verbatim):
# identical tokenizer (lowercase, split on non-alphanumeric runs, drop
# empties), integer tf/df/dl/N, exactly-representable avgdl, constants
# written in the same folded forms ((1.2 + 1.0), (1.0 - 0.75)) so both
# engines evaluate the same doubles. round(·, 4) guards ln-ulp and
# 3-term summation-order noise (≤ ~1e-14 absolute); min rounding-
# boundary margin measured 4.9e-10 across SFs — ≥ ~5×10^4 × the noise
# bound (tests/test_retrieval.py sweeps it).
# Deduped exactly like the engine side (query_terms_df, ADVICE r9): a
# repeated term in a query list must contribute ONCE on both sides, or
# the gate would hash-fail on the very input the engine was hardened
# to absorb (r10 review finding).
_BM25_QTERM_VALUES = ", ".join(
    dict.fromkeys(
        f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
    )
)
_BM25_SCORED = f"""
    doc_tok AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'),
               x -> x <> '') AS toks
      FROM documents),
    doc_stats AS (
      SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM doc_tok),
    qterms AS (
      SELECT CAST(q AS BIGINT) AS query_id, t AS term
      FROM (VALUES {_BM25_QTERM_VALUES}) v(q, t)),
    posted AS (
      SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM doc_tok),
    bm25_postings AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM posted
      WHERE term IN (SELECT term FROM qterms)
      GROUP BY doc_id, dl, term),
    bm25_df AS (
      SELECT term, count(*) AS df FROM bm25_postings GROUP BY term),
    bm25_scored AS (
      SELECT q.query_id AS probe_id, p.doc_id AS vec_id,
             round(sum(
               ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * p.tf * (1.2 + 1.0)
               / (p.tf + 1.2 * ((1.0 - 0.75)
                                + 0.75 * p.dl / s.avgdl))
             ), 4) AS cos
      FROM bm25_postings p
      JOIN qterms q USING (term)
      JOIN bm25_df f USING (term), doc_stats s
      GROUP BY q.query_id, p.doc_id)
"""


def ann_scored_topk(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    """The LAZY five-tier scoring plan of `ann_topk_methods` (no caching,
    no recall rows): each tier contributes SCORED candidates
    (rank=False) — four dense tiers over embeddings plus the sparse
    BM25 tier over documents (operators/retrieval.py, probe_id =
    query_id); one window over (method, probe_id) ranks the union —
    the same rows reach the exchange as with per-tier windows, but in
    ONE shuffle instead of five. Exposed separately so the plan-shape
    assertions (tests/test_plan_quality.py) can read the scoring plan
    the gate materializes before it is hidden behind the cache scan.
    `emb` lets the gate pass an already-persisted embeddings frame so
    the four tiers share one materialized scan instead of four parquet
    re-reads (r6 gate-cost trim)."""
    from pyspark.sql import Window

    from tutorial_apache_beam_spark.functions.vectors import quantize_vector

    if emb is None:
        emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    emb_q8 = emb.select(
        "vec_id", quantize_vector(F.col("embedding")).alias("embedding")
    )
    probes_q8 = emb_q8.filter(F.col("vec_id") % 100 == 0)

    def tag(df: DataFrame, method: str) -> DataFrame:
        return df.select(
            F.lit(method).alias("method"), "probe_id", "vec_id", "cos"
        )

    docs = load_table(spark, sf_dir, "documents")
    bm25 = bm25_scored(docs, query_terms_df(spark))
    scored = (
        tag(cosine_topk(emb, probes, k=5, rank=False), "exact")
        .unionByName(
            tag(cosine_topk(emb_q8, probes_q8, k=5, rank=False), "q8")
        )
        .unionByName(tag(srp_ann_topk(emb, probes, k=5, rank=False), "srp"))
        .unionByName(
            tag(ivf_ann_topk(emb, probes, k=5, nprobe=2, rank=False), "ivf")
        )
        .unionByName(tag(bm25, "bm25"))
    )
    w = Window.partitionBy("method", "probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
    )


@register(
    "ann_topk_methods",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    p AS (SELECT * FROM v WHERE vec_id % 100 = 0),
    qv AS (
      SELECT vec_id,
             CASE WHEN m = 0 THEN ve
                  ELSE list_transform(ve,
                         x -> CAST(floor(x / m * 127 + 0.5) AS DOUBLE)) END AS ve
      FROM (SELECT vec_id, ve,
                   list_max(list_transform(ve, x -> abs(x))) AS m FROM v) t),
    {_SRP_BUCKETS.strip().rstrip()},
    {_IVF_ASSIGN.strip().rstrip()},
    {_BM25_SCORED.strip().rstrip()},
    exact_scored AS (
      SELECT a.vec_id AS probe_id, b.vec_id AS vec_id, {_COS} AS cos
      FROM p a JOIN v b ON b.vec_id <> a.vec_id),
    q8_scored AS (
      SELECT a.vec_id AS probe_id, b.vec_id AS vec_id, {_COS} AS cos
      FROM (SELECT * FROM qv WHERE vec_id % 100 = 0) a
      JOIN qv b ON b.vec_id <> a.vec_id),
    srp_cand AS (
      SELECT DISTINCT pb.vec_id AS probe_id, cb.vec_id AS vec_id
      FROM buckets pb JOIN buckets cb
        ON pb.t = cb.t AND pb.bucket = cb.bucket
      WHERE pb.vec_id % 100 = 0 AND cb.vec_id <> pb.vec_id),
    srp_scored AS (
      SELECT sc.probe_id, sc.vec_id, {_COS} AS cos
      FROM srp_cand sc
      JOIN v a ON a.vec_id = sc.probe_id
      JOIN v b ON b.vec_id = sc.vec_id),
    ivf_cand AS (
      SELECT DISTINCT pa.vec_id AS probe_id, ca.vec_id AS vec_id
      FROM asgn pa JOIN asgn ca
        ON pa.centroid_id = ca.centroid_id AND ca.rn = 1
      WHERE pa.vec_id % 100 = 0 AND pa.rn <= 2 AND ca.vec_id <> pa.vec_id),
    ivf_scored AS (
      SELECT ic.probe_id, ic.vec_id, {_COS} AS cos
      FROM ivf_cand ic
      JOIN v a ON a.vec_id = ic.probe_id
      JOIN v b ON b.vec_id = ic.vec_id),
    ranked AS (
      SELECT method, probe_id, vec_id, cos, row_number() OVER (
               PARTITION BY method, probe_id
               ORDER BY cos DESC, vec_id) AS rn
      FROM (SELECT 'exact' AS method, * FROM exact_scored
            UNION ALL SELECT 'q8' AS method, * FROM q8_scored
            UNION ALL SELECT 'srp' AS method, * FROM srp_scored
            UNION ALL SELECT 'ivf' AS method, * FROM ivf_scored
            UNION ALL SELECT 'bm25' AS method, * FROM bm25_scored)),
    fused AS (
      SELECT query_id, vec_id, sum({RRF_LCM} // ({RRF_K} + rn)) AS fi
      FROM (SELECT CASE WHEN method = 'bm25' THEN probe_id
                        ELSE probe_id // 100 + 1 END AS query_id,
                   vec_id, rn
            FROM ranked
            WHERE rn <= 5 AND (method = 'bm25' OR probe_id <= 400))
      GROUP BY query_id, vec_id),
    fused_ranked AS (
      SELECT query_id, vec_id, fi, row_number() OVER (
               PARTITION BY query_id ORDER BY fi DESC, vec_id) AS fr
      FROM fused),
    recall_row AS (
      SELECT CAST(count(*) AS BIGINT)         AS n_exact,
             CAST(count(i.vec_id) AS BIGINT)  AS n_hit
      FROM (SELECT probe_id, vec_id FROM ranked
            WHERE method = 'exact' AND rn <= 5) e
      LEFT JOIN (SELECT probe_id, vec_id FROM ranked
                 WHERE method = 'ivf' AND rn <= 5) i
        USING (probe_id, vec_id))
    SELECT method, probe_id, vec_id, cos FROM ranked WHERE rn <= 5
    UNION ALL
    SELECT 'fused', query_id, vec_id, fi / {RRF_LCM}.0
    FROM fused_ranked WHERE fr <= 5
    UNION ALL
    SELECT 'ivf_recall', n_exact, n_hit,
           round(n_hit::DOUBLE / n_exact, 6)
    FROM recall_row
    UNION ALL
    SELECT 'ivf_recall_trained_ge_sampled', 0, 0, 1.0
    """,
)
def ann_topk_methods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval top-5 in one method-tagged gate: four dense
    tiers over embeddings plus the sparse BM25 keyword tier over
    documents (merges round-2's oracle-backed `cosine_topk_bruteforce`
    with the previously rows-only `ann_topk_variants`; bm25 added r9):

    - exact: brute force — one corpus scan × broadcast probes (the
      verification tier at any scale where |probes|·|corpus| is viable);
    - q8:    int8-quantized brute force (round 3) — the memory-bandwidth
      tier: per-vector symmetric quantization (scale cancels in cosine),
      4x smaller vectors, integer-exact dots so the score is
      deterministic cross-engine (`functions.vectors.quantize_vector`);
    - srp:   sign-random-projection LSH — candidates share a (table,
      bucket) key in any of the independent hash tables; the equi-join
      shuffles N_TABLES·(|corpus|+|probes|) rows, never the pair space;
    - ivf:   inverted-file over deterministic centroids (every 50th
      vector), nprobe=2 — broadcast centroid assignment, candidate join
      pruned by the bucket fan-out;
    - bm25 (r9): the SPARSE side of hybrid retrieval — Okapi BM25
      keyword top-5 over the documents table for five fixed keyword
      queries (probe_id = query_id, vec_id = doc_id, cos = rounded
      score). Postings are pruned to query terms by a broadcast
      semi-join BEFORE any shuffle (`operators/retrieval.py`), so at
      100 TB only query-term postings ever exchange.
    - fused (r10): reciprocal-rank fusion (k=60) of all five tiers
      into ONE hybrid ranking per keyword query — what a curation
      query actually consumes instead of five side-by-side lists.
      probe_id = query_id 1..5; each query fuses its BM25 list with
      the dense lists of embedding probe (query_id-1)·100 (documents
      and embeddings share the id space). Computed from the persisted
      top-k cache with exact integer algebra (RRF_LCM/(60+rank)
      addends, one final division), so it is bit-identical
      cross-engine and costs zero extra corpus passes.

    All five tiers are DuckDB-oracle-checked: SRP buckets derive from the
    portable md5 hash, IVF assignment is an fp-stable cosine argmax
    (margins measured; see the SQL fragment comments above), and q8
    scores are integer-derived.

    Round 5 (VERDICT r4 item 6) appends two summary rows, keeping the
    registry at 50 while promoting the recall properties into the
    hash-checked surface:

    - `ivf_recall`: recall@5 of the sampled-centroid IVF tier against
      the exact tier, fully recomputed by the DuckDB oracle from its own
      ranked CTE — (probe_id, vec_id, cos) carry (n_exact, n_hit,
      recall), the `ann_recall_vs_exact` single-row shape.
    - `ivf_recall_trained_ge_sampled`: the trained-quantizer invariant.
      Spherical-k-means centroids (engine-trained, so not
      SQL-reproducible — the oracle pins the EXPECTED row, cos=1.0)
      must reach at least the sampled-init recall on probes NOT aligned
      with the centroid sample (vec_id % 100 == 7; aligned probes are
      degenerate — each sits in its own bucket). If training ever loses
      recall, cos computes to 0.0 and the gate hash-fails.
    """
    from tutorial_apache_beam_spark.operators.similarity import (
        ann_recall_vs_exact,
        kmeans_centroids,
    )

    # Persist the embeddings once for the WHOLE gate: the four scoring
    # tiers, both probes7 searches, and k-means training all re-read the
    # same small corpus — one materialized scan replaces ~10 parquet
    # re-reads (r6 gate-cost trim, VERDICT r5 item 1). At 100 TB a coarse
    # quantizer would train on the hash-sampled subset (see
    # kmeans_centroids.training_sample_cap), not a full cached corpus.
    # Materialized EAGERLY (r13): the three independent chains below
    # start concurrently, and an unmaterialized cache would be computed
    # redundantly by whichever chains reach it first.
    emb = load_table(spark, sf_dir, "embeddings").persist()
    emb.count()

    # r13 (guide §2.6 — overlap independent jobs): the gate's eager
    # phase is three INDEPENDENT chains over the materialized embeddings
    # cache — the five-tier top-k, the exact probes7 baseline, and
    # k-means training. Submitted concurrently from a small thread pool
    # so each chain's stage tail back-fills executors the others free;
    # run sequentially they left most cores idle (summed executor time
    # ~4 s vs ~10 s wall at sf0.1, tools/stage_attrib.py r13). Identical
    # frames and math — only job submission order changes, so results
    # are bit-identical (oracle re-verified).
    #
    # r14 (VERDICT r13 item 2): each chain's CONSTRUCTION moved inside
    # its pool thread too — building the five-tier plan runs three
    # eager probe/centroid collect jobs, and cosine_topk's probe
    # broadcast one more, all previously serial on the driver before
    # the pool opened. Same frames, same math; only which thread
    # submits the construction jobs changes.
    probes7 = emb.filter(F.col("vec_id") % 100 == 7)
    topk_box: list = []
    exact7_box: list = []
    cents_box: list = []

    def _build_topk() -> None:
        # Persisted: the frame is read four times (returned rows + the
        # two tier slices feeding ivf_recall) — without the cache each
        # read re-runs all four scoring tiers. Small (4 methods ×
        # |probes| × 5).
        t = ann_scored_topk(spark, sf_dir, emb=emb).persist()
        t.count()
        topk_box.append(t)

    def _build_exact7() -> None:
        e = cosine_topk(emb, probes7, k=5).persist()
        e.count()
        exact7_box.append(e)

    def _train() -> None:
        # iters=2 (was 3): each Lloyd's round costs a corpus scan +
        # centroid collect INSIDE the gate, and the trained-ge-sampled
        # invariant has identical discriminating power at 2 rounds
        # (verified at sf0.01 and sf0.1) — VERDICT r5 item 1's trim.
        cents_box.append(kmeans_centroids(emb, n_centroids=4, iters=2))

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        for f in [
            pool.submit(_build_topk),
            pool.submit(_build_exact7),
            pool.submit(_train),
        ]:
            f.result()
    topk, exact7, cents = topk_box[0], exact7_box[0], cents_box[0]

    # fused tier (r10, VERDICT r9 item 4): reciprocal-rank fusion
    # (k=60) of the five per-tier top-5 lists into ONE hybrid ranking
    # per keyword query — the sparse BM25 list (probe_id = query_id)
    # fused with the four dense lists of the aligned embedding probe
    # (vec_id = (query_id-1)·100; the fixtures key documents and
    # embeddings by the same id space). Derives ENTIRELY from the
    # persisted top-k cache (~125 rows), so fusion adds zero corpus
    # passes and rides the shared ranking exchange the tiers already
    # paid for. Integer RRF algebra (see the oracle-fragment comment on
    # RRF_LCM): addends are exact BIGINTs, one final IEEE division —
    # bit-identical cross-engine, no round() guard needed.
    from pyspark.sql import Window

    rank_w = Window.partitionBy("method", "probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    fuse_w = Window.partitionBy("query_id").orderBy(
        F.col("fi").desc(), F.col("vec_id")
    )
    fused = (
        topk.withColumn("_rn", F.row_number().over(rank_w))
        .filter((F.col("method") == "bm25") | (F.col("probe_id") <= 400))
        .withColumn(
            "query_id",
            F.when(F.col("method") == "bm25", F.col("probe_id")).otherwise(
                F.expr("probe_id div 100") + F.lit(1)
            ),
        )
        .groupBy("query_id", "vec_id")
        .agg(
            F.sum(F.expr(f"{RRF_LCM} div ({RRF_K} + _rn)")).alias("fi")
        )
        .withColumn("_fr", F.row_number().over(fuse_w))
        .filter(F.col("_fr") <= 5)
        .select(
            F.lit("fused").alias("method"),
            F.col("query_id").alias("probe_id"),
            "vec_id",
            (F.col("fi") / F.lit(float(RRF_LCM))).alias("cos"),
        )
    )

    exact5 = topk.filter(F.col("method") == "exact").select(
        "probe_id", "vec_id"
    )
    ivf5 = topk.filter(F.col("method") == "ivf").select("probe_id", "vec_id")
    ivf_recall = ann_recall_vs_exact(exact5, ivf5).select(
        F.lit("ivf_recall").alias("method"),
        F.col("n_exact").cast("bigint").alias("probe_id"),
        F.col("n_hit").cast("bigint").alias("vec_id"),
        F.col("recall").alias("cos"),
    )

    # Trained-vs-sampled invariant on unaligned probes (see docstring);
    # exact7 and cents were materialized in the concurrent phase above.
    sampled_r = ann_recall_vs_exact(
        exact7, ivf_ann_topk(emb, probes7, k=5, nprobe=2)
    ).select(F.col("recall").alias("recall_sampled"))
    trained_r = ann_recall_vs_exact(
        exact7, ivf_ann_topk(emb, probes7, k=5, nprobe=2, centroids=cents)
    ).select(F.col("recall").alias("recall_trained"))
    invariant = (
        trained_r.crossJoin(sampled_r)
        .select(
            F.lit("ivf_recall_trained_ge_sampled").alias("method"),
            F.lit(0).cast("bigint").alias("probe_id"),
            F.lit(0).cast("bigint").alias("vec_id"),
            F.when(
                F.col("recall_trained") >= F.col("recall_sampled"), 1.0
            )
            .otherwise(0.0)
            .alias("cos"),
        )
    )
    result = (
        topk.unionByName(fused)
        .unionByName(ivf_recall)
        .unionByName(invariant)
        .persist()
    )
    result.count()
    topk.unpersist()
    exact7.unpersist()
    emb.unpersist()
    return result


@register(
    "embedding_cosine_near_dups",
    oracle=f"""
    WITH RECURSIVE
    v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    pr AS (
      SELECT id_a, id_b, cos FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cos
        FROM v a JOIN v b ON a.vec_id < b.vec_id)
      WHERE cos >= 0.35),
    edges AS (SELECT id_a AS a, id_b AS b FROM pr
              UNION SELECT id_b, id_a FROM pr),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS node, least(a, min(b)) AS component
             FROM reach GROUP BY a)
    SELECT pr.id_a, pr.id_b, pr.cos, c.component,
           (pr.id_a = c.component) AS canonical_a
    FROM pr JOIN comp c ON c.node = pr.id_a
    """,
)
def embedding_cosine_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine ≥ 0.35 (exact pairwise; the oracle
    brute-forces the same space), each pair tagged with its SemDeDup-style
    transitive cluster.

    Round 6 (VERDICT r5 item 4): `operators.similarity.semantic_dup_clusters`
    — the last first-class LLM operator that was pytest-only — is folded
    into this gate's hash-checked surface without growing the registry
    past 50. The pair frame is computed once (persisted) and shared with
    the cluster stage; `component` is id_a's transitive cluster label
    (= min vec_id of the cluster, identical for id_b by edge-
    connectivity, so one column checks every non-singleton assignment)
    and `canonical_a` marks the cluster representative. The oracle
    recomputes the same closure with the recursive-CTE pattern from
    `near_dup_clusters`.
    """
    from tutorial_apache_beam_spark.operators.similarity import (
        semantic_dup_clusters,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # mode='auto' (r13, VERDICT r12 item 3): at or below
    # EXACT_ALLPAIRS_ROW_THRESHOLD rows (every driver fixture — 2,000
    # vectors at sf0.1) this IS the exact tier, plan unchanged, oracle
    # hash-identical; above it (the 10x bench fixture and real corpora)
    # the SRP-bucketed candidate join takes over, keeping candidate work
    # ~linear where exact is quadratic by contract (bucketed pairs carry
    # the identical score math — the trade is recall, stated in
    # operators/similarity.embedding_neardup_pairs_bucketed).
    pairs = embedding_neardup_pairs(emb, threshold=0.35, mode="auto").persist()
    clusters = semantic_dup_clusters(emb, threshold=0.35, pairs=pairs)
    out = (
        pairs.join(
            clusters.select(
                F.col("vec_id").alias("id_a"),
                "component",
                F.col("is_canonical").alias("canonical_a"),
            ),
            "id_a",
        )
        .select("id_a", "id_b", "cos", "component", "canonical_a")
        .persist()
    )
    out.count()
    # Release both intermediates — only the result-sized pair+cluster
    # frame stays pinned (cache-hygiene contract, tests/test_cache_hygiene).
    clusters.unpersist()
    pairs.unpersist()
    return out


