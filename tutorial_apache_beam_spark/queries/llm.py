"""LLM-data-pipeline queries: dedup, text analysis, fingerprints.

Every sketch-based oracle is generated from the same frozen constants as
the Spark implementation (functions.hashing / functions.text), so MinHash,
SimHash and fingerprints are bit-identical across engines — the DuckDB
check covers the full algorithm, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.functions.hashing import (
    MERSENNE_P,
    MINHASH_COEFFS,
    portable_hash64,
    portable_hash64_sql,
    simhash32_sql,
)
from tutorial_apache_beam_spark.functions.text import (
    STOPWORDS,
    stopword_count,
    stopword_count_sql,
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)
from tutorial_apache_beam_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from tutorial_apache_beam_spark.operators.sampling import bucket_sql, threshold
from tutorial_apache_beam_spark.registry import register

# Shared oracle CTEs: tokenized + shingled + hashed documents (3-word
# shingles; 60-bit portable hashes — the engine runs its near-dup machinery
# on the hashes, so the oracle does too).
_TOK = tokens_sql("text")
_SHINGLES_CTE = f"""
    tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    sh AS (SELECT doc_id,
                  list_distinct({word_shingles_sql('toks', 3)}) AS shingles
           FROM tok),
    hsh AS (SELECT doc_id,
                   list_transform(shingles,
                                  s -> {portable_hash64_sql('s')}) AS hashes
            FROM sh)
"""


@register(
    "exact_dedup_documents",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT min(doc_id) AS doc_id, text
    FROM corpus
    GROUP BY text
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy keeping the min doc_id per text.

    The fixture has no exact duplicates, so the corpus is doubled with
    offset ids first — every text must collapse back to its original id.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return exact_dedup(corpus)


_NGRAM_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    inv AS (SELECT doc_id, unnest(hashes) AS h FROM hsh),
    freq AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
    inv2 AS (SELECT i.doc_id, i.h
             FROM inv i JOIN freq f USING (h) WHERE f.df <= 100),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM inv2 a JOIN inv2 b USING (h)
             WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b, jaccard FROM (
      SELECT id_a, id_b,
             round(len(list_intersect(sa.hashes, sb.hashes))::DOUBLE
                   / len(list_distinct(list_concat(sa.hashes, sb.hashes))),
                   4) AS jaccard
      FROM cand
      JOIN hsh sa ON sa.doc_id = cand.id_a
      JOIN hsh sb ON sb.doc_id = cand.id_b)
    WHERE jaccard >= 0.2
    """


def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.2 (inverted-index
    candidates, stop-shingle cap df ≤ 100)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.2, max_doc_freq=100)


def _minhash_sql_cols() -> str:
    cols = []
    for i in range(12):
        a, b = MINHASH_COEFFS[i]
        cols.append(
            f"list_min(list_transform(hashes, "
            f"x -> ({a} * (x % {MERSENNE_P}) + {b}) % {MERSENNE_P})) AS mh{i}"
        )
    return ",\n           ".join(cols)


def _band_struct_sql() -> str:
    bands = []
    for bi in range(4):
        cols = ", ".join(f"mh{bi * 3 + j}" for j in range(3))
        bands.append(f"({bi}, md5(concat_ws(',', {cols})))")
    return ", ".join(bands)


_MINHASH_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    hashed AS (SELECT doc_id, hashes FROM hsh WHERE len(hashes) > 0),
    sig AS (SELECT doc_id,
           {_minhash_sql_cols()}
            FROM hashed),
    band_rows AS (
      SELECT doc_id, bb.band AS band, bb.bucket AS bucket
      FROM sig, unnest([{_band_struct_sql()}]::STRUCT(band INT, bucket VARCHAR)[]) AS t(bb)),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM band_rows a JOIN band_rows b
               ON a.band = b.band AND a.bucket = b.bucket
             WHERE a.doc_id < b.doc_id)
    SELECT id_a, id_b, jaccard FROM (
      SELECT id_a, id_b,
             round(len(list_intersect(sa.hashes, sb.hashes))::DOUBLE
                   / len(list_distinct(list_concat(sa.hashes, sb.hashes))),
                   4) AS jaccard
      FROM cand
      JOIN hsh sa ON sa.doc_id = cand.id_a
      JOIN hsh sb ON sb.doc_id = cand.id_b)
    WHERE jaccard >= 0.2
    """


def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(12)+LSH(4 bands × 3) candidates, exact-Jaccard ≥ 0.2 verify.

    The oracle reproduces the full pipeline — portable shingle hashes,
    universal-hash minima, band buckets — from the same frozen constants.
    """
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, n=3, k=12, bands=4, threshold=0.2)


_CONTAINMENT_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    inv AS (SELECT doc_id, unnest(hashes) AS h FROM hsh),
    freq AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
    inv2 AS (SELECT i.doc_id, i.h
             FROM inv i JOIN freq f USING (h) WHERE f.df <= 100),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM inv2 a JOIN inv2 b USING (h)
             WHERE a.doc_id <> b.doc_id)
    SELECT id_a, id_b, containment FROM (
      SELECT id_a, id_b,
             round(len(list_intersect(sa.hashes, sb.hashes))::DOUBLE
                   / len(sa.hashes), 4) AS containment
      FROM cand
      JOIN hsh sa ON sa.doc_id = cand.id_a
      JOIN hsh sb ON sb.doc_id = cand.id_b)
    WHERE containment >= 0.5
    """


@register(
    "lexical_neardup_pairs",
    oracle=f"""
    SELECT 'ngram' AS method, t.id_a, t.id_b, t.jaccard AS score
    FROM ({_NGRAM_ORACLE}) t
    UNION ALL
    SELECT 'minhash' AS method, t.id_a, t.id_b, t.jaccard AS score
    FROM ({_MINHASH_ORACLE}) t
    UNION ALL
    SELECT 'containment' AS method, t.id_a, t.id_b, t.containment AS score
    FROM ({_CONTAINMENT_ORACLE}) t
    """,
)
def lexical_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical near-dup pair generation, method-tagged (round-3 merge of
    the `ngram_jaccard_near_dups` + `minhash_lsh_near_dups` gates — both
    emit (id_a, id_b, jaccard) pair rows over `documents`, so the merge is
    a tagged union; SURVEY §9). Round 5 adds the `containment` branch
    (`ngram_containment_pairs`, the asymmetric quote/excerpt metric —
    |A∩B|/|A| ≥ 0.5, both orientations), promoting it from pytest-only
    into the hash-checked driver surface (VERDICT r4 item 6); the metric
    column is `score` across all three branches. Member functions stay
    callable for bench/tests; each branch's full candidate-generation +
    exact-verify pipeline is hash-checked.

    Scale: the three branches share ONE persisted tokenize→shingle→hash
    scan (the dominant stage at corpus scale — the `shingle_rows=`
    sharing contract on the operators), and the ngram + containment
    branches additionally share ONE both-directions
    `_counting_pair_stats` candidate join (jaccard is symmetric, so its
    pairs are the id_a < id_b half of the same stats — running the
    inverted-index join once instead of twice saves ~1/3 of the gate's
    candidate work; the standalone operators are unchanged). Each branch
    is an equi-join candidate generator (inverted shingle index / LSH
    band buckets) that never goes all-pairs. Branch results are
    materialized eagerly, so the shared frames are released before the
    gate returns.
    """
    from tutorial_apache_beam_spark.operators.dedup import (
        _counting_pair_stats,
        _shingle_rows,
        ngram_containment_pairs,
    )

    from tutorial_apache_beam_spark.operators.dedup import (
        _join_expansion_scope,
        _plan_est_bytes,
    )

    docs = load_table(spark, sf_dir, "documents")
    inv_plan = _shingle_rows(docs, "text", "doc_id", 3)
    # This gate owns the shared scan, so it owns the join-expansion
    # reducer sizing too (the operators' internal scopes are bypassed by
    # pair_stats/shingle_rows sharing): all three branch materializations
    # — including the persisted stats frame's own — run inside one scope
    # sized from the inverted index (VERDICT r6 #1; measured spill-free
    # at the 100x fixture). The persist() calls MUST happen inside the
    # scope: Spark compiles a cached plan at REGISTRATION, so a stats
    # frame persisted outside would freeze the pair pipeline's exchanges
    # at the session's default reducer count — the exact spill the scope
    # exists to prevent (measured live: identical 7.8 GB spill with the
    # scope around only the materialization).
    inv = stats = None
    try:
        with _join_expansion_scope(spark, _plan_est_bytes(inv_plan)):
            inv = inv_plan.persist()
            # Materialize the shared scan EAGERLY (r13): the stats
            # frame's plan contains several broadcast subtrees over inv
            # (hot set, per-doc sizes, hot arrays) that Spark builds on
            # concurrent driver threads — against an unmaterialized
            # cache each build re-ran the full tokenize+shingle+hash
            # scan (4 identical 2 MB-input stages observed at sf0.1,
            # tools/stage_attrib.py r13); one count pins the cache
            # first, so every subtree reads it.
            inv.count()
            stats = _counting_pair_stats(
                inv, "doc_id", 100, both_directions=True
            ).persist()
            # The operators OWN the score expressions and thresholds; the
            # gate only shares the scan (shingle_rows) and the candidate
            # join (pair_stats) so each runs once for all branches.
            # r13 (guide §2.6): the stats chain (ngram → containment,
            # which share the persisted stats frame) and the minhash
            # chain (band join over the inv cache only) are independent
            # — run them as two concurrent driver threads so the LSH
            # drain back-fills executors the pair-stats stages free.
            # Same frames, same scope, same results.
            ng_ct_box: list = []

            def _stats_chain() -> None:
                ng_ct_box.append(
                    ngram_jaccard_pairs(
                        docs, threshold=0.2, max_doc_freq=100,
                        pair_stats=stats,
                    ).select(
                        F.lit("ngram").alias("method"),
                        "id_a",
                        "id_b",
                        F.col("jaccard").alias("score"),
                    )
                )
                ng_ct_box.append(
                    ngram_containment_pairs(
                        docs, threshold=0.5, max_doc_freq=100,
                        pair_stats=stats,
                    ).select(
                        F.lit("containment").alias("method"),
                        "id_a",
                        "id_b",
                        F.col("containment").alias("score"),
                    )
                )

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                stats_fut = pool.submit(_stats_chain)
                mh_fut = pool.submit(
                    lambda: minhash_lsh_pairs(
                        docs, n=3, k=12, bands=4, threshold=0.2,
                        shingle_rows=inv,
                    ).select(
                        F.lit("minhash").alias("method"),
                        "id_a",
                        "id_b",
                        F.col("jaccard").alias("score"),
                    )
                )
                stats_fut.result()
                mh = mh_fut.result()
            ng, ct = ng_ct_box
    finally:
        # All branches are materialized (eager counts), so the shared
        # scans can be released before the union plan is returned.
        if stats is not None:
            stats.unpersist()
        if inv is not None:
            inv.unpersist()
    return ng.unionByName(mh).unionByName(ct)


def simhash_fingerprints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 32-bit SimHash (bit-majority of token hashes) — driver
    gate moved into `doc_fingerprints_suite`; kept callable for bench/tests."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(docs)


@register(
    "simhash_near_dups",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    hashed AS (SELECT doc_id,
                      list_transform(toks, s -> {portable_hash64_sql('s')}) AS hx
               FROM tok),
    fp AS (SELECT doc_id, {simhash32_sql('hx')} AS simhash FROM hashed)
    SELECT a.doc_id AS id_a,
           b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups (hamming ≤ 3) via banded equi-join.

    The engine uses the 4-chunk pigeonhole join (complete for hamming ≤ 3);
    the oracle brute-forces all pairs — equal results prove the banding
    loses nothing.
    """
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(docs, max_hamming=3)


_SW_RATIO_COLS_SQL = ",\n           ".join(
    f"round({stopword_count_sql('toks', lang)}::DOUBLE / len(toks), 4) AS sw_{lang}"
    for lang in STOPWORDS
)

_LANGS = list(STOPWORDS)  # tie order: en, es, de, fr


# 3-word shingles WITH duplicates (word_shingles_sql keeps every
# occurrence; the near-dup CTEs list_distinct it) — the repetition signal
# needs the raw multiplicity.
_SH3 = word_shingles_sql("t.toks", 3)

_TEXT_ANALYSIS_ORACLE = f"""
    WITH tok AS (SELECT doc_id, lang, text, {_TOK} AS toks FROM documents),
    scored AS (SELECT doc_id,
           {_SW_RATIO_COLS_SQL}
               FROM tok WHERE len(toks) > 0)
    SELECT t.doc_id,
           length(t.text)                                       AS n_chars,
           len(t.toks)                                          AS n_tokens,
           len(list_distinct(t.toks))                           AS n_types,
           len(regexp_extract_all(t.text,
               '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]'))                 AS n_bpe_tokens,
           length(regexp_replace(t.text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
           round(CASE WHEN len(t.toks) = 0 THEN 0
                 ELSE len(list_distinct(t.toks))::DOUBLE / len(t.toks) END, 4)
                                                                AS type_token_ratio,
           round(least(len(t.toks) / 100.0, 1.0) * 0.5
                 + CASE WHEN len(t.toks) = 0 THEN 0
                   ELSE ({stopword_count_sql('t.toks', 'en')}::DOUBLE / len(t.toks))
                   END * 0.5, 4)                                AS quality_score,
           round(CASE WHEN len(t.toks) = 0 THEN 0
                 ELSE list_sum(list_transform(t.toks, x -> length(x)))::DOUBLE
                      / len(t.toks) END, 4)                     AS mean_word_len,
           coalesce(list_max(list_transform(t.toks, x -> length(x))), 0)
                                                                AS max_word_len,
           round(CASE WHEN len(t.toks) < 3 THEN 0
                 ELSE 1.0 - len(list_distinct({_SH3}))::DOUBLE
                      / len({_SH3}) END, 4)                     AS dup_3gram_frac,
           round(CASE WHEN len(t.toks) = 0 THEN 0
                 ELSE list_max(list_transform(list_distinct(t.toks),
                        y -> len(list_filter(t.toks, x -> x = y))))::DOUBLE
                      / len(t.toks) END, 4)                     AS top_token_frac,
           t.lang                                               AS labeled_lang,
           CASE
             WHEN s.doc_id IS NULL THEN NULL
             WHEN sw_en >= sw_es AND sw_en >= sw_de AND sw_en >= sw_fr THEN 'en'
             WHEN sw_es >= sw_de AND sw_es >= sw_fr THEN 'es'
             WHEN sw_de >= sw_fr THEN 'de'
             ELSE 'fr'
           END AS detected_lang
    FROM tok t LEFT JOIN scored s ON t.doc_id = s.doc_id
    """


def _max_run_count(sorted_arr):
    """Longest run of equal adjacent elements in a SORTED array == the
    count of the most frequent element.

    One O(n) fold over the sorted array (accumulator: previous element,
    current run, best run). The naive distinct x filter form is O(n^2)
    per document — ~25M interpreted element evaluations for a 5k-token
    document — which breaks the bounded-work-per-row claim at real
    document lengths; sort+fold is O(n log n) and value-identical. The
    DuckDB oracle keeps the quadratic spelling (it is the oracle; only
    the value contract is shared). Empty arrays yield 0; the empty-string
    sentinel can't collide because tokens are non-empty by construction.
    """
    zero = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
        )

    return F.aggregate(sorted_arr, zero, step, lambda acc: acc.best)


def text_analysis_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis (merges round-1's `text_stats_quality` +
    `lang_id_heuristic`), one row per document — driver gate moved into
    `text_fingerprint_suite`; kept callable for bench/tests:

    - token counts, type/token ratio, BPE-ish token count, punctuation
      count, composite quality score — all codegen built-ins;
    - stopword-overlap language ID with a fixed tie order (en>es>de>fr);
      NULL for token-less documents. (The fixture text is synthetic, so
      `detected_lang` doesn't track the `lang` label — the operator
      contract is the deterministic scoring.)
    """
    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    base = docs.select("doc_id", "lang", "text", t.alias("toks"))
    for lang in _LANGS:
        # NULL for token-less docs (mirrors the oracle's `scored` CTE LEFT
        # JOIN) — and under ANSI mode an unguarded /0 would throw.
        base = base.withColumn(
            f"sw_{lang}",
            F.when(F.size("toks") == 0, F.lit(None).cast("double")).otherwise(
                F.round(
                    stopword_count(F.col("toks"), lang).cast("double")
                    / F.size("toks"),
                    4,
                )
            ),
        )
    n_tokens = F.size("toks")
    n_types = F.size(F.array_distinct("toks"))
    sw_en = stopword_count(F.col("toks"), "en")
    tok_lens = F.transform(F.col("toks"), lambda x: F.length(x))
    shingles3 = word_shingles(F.col("toks"), 3)
    detected = F.when(F.size("toks") == 0, F.lit(None).cast("string")).otherwise(
        F.when(
            (F.col("sw_en") >= F.col("sw_es"))
            & (F.col("sw_en") >= F.col("sw_de"))
            & (F.col("sw_en") >= F.col("sw_fr")),
            "en",
        )
        .when(
            (F.col("sw_es") >= F.col("sw_de")) & (F.col("sw_es") >= F.col("sw_fr")),
            "es",
        )
        .when(F.col("sw_de") >= F.col("sw_fr"), "de")
        .otherwise("fr")
    )
    return base.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), 0
            )
        ).alias("n_bpe_tokens"),
        F.length(F.regexp_replace("text", "[a-zA-Z0-9\\s]", "")).alias("n_punct"),
        F.round(
            F.when(n_tokens == 0, 0.0).otherwise(n_types.cast("double") / n_tokens),
            4,
        ).alias("type_token_ratio"),
        F.round(
            F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5
            + F.when(n_tokens == 0, 0.0).otherwise(sw_en.cast("double") / n_tokens)
            * 0.5,
            4,
        ).alias("quality_score"),
        # Gopher-style repetition / word-shape signals (public quality
        # heuristics for training-data curation). All per-row array
        # expressions over the ~doc-length token array — bounded work per
        # row regardless of corpus size, no extra shuffle.
        F.round(
            F.when(n_tokens == 0, 0.0).otherwise(
                F.aggregate(tok_lens, F.lit(0), lambda a, x: a + x).cast(
                    "double"
                )
                / n_tokens
            ),
            4,
        ).alias("mean_word_len"),
        F.coalesce(F.array_max(tok_lens), F.lit(0)).alias("max_word_len"),
        F.round(
            F.when(n_tokens < 3, 0.0).otherwise(
                F.lit(1.0)
                - F.size(F.array_distinct(shingles3)).cast("double")
                / F.size(shingles3)
            ),
            4,
        ).alias("dup_3gram_frac"),
        F.round(
            F.when(n_tokens == 0, 0.0).otherwise(
                _max_run_count(F.array_sort("toks")).cast("double") / n_tokens
            ),
            4,
        ).alias("top_token_frac"),
        F.col("lang").alias("labeled_lang"),
        detected.alias("detected_lang"),
    )


_DOC_FINGERPRINTS_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    thx AS (SELECT doc_id,
                   list_transform(toks, s -> {portable_hash64_sql('s')}) AS token_hashes
            FROM tok)
    SELECT t.doc_id,
           {portable_hash64_sql("array_to_string(list_sort(list_distinct(t.toks)), ' ')")}
             AS content_fp,
           coalesce(list_min(list_transform(s.shingles,
                     x -> {portable_hash64_sql('x')})), -1) AS min_shingle_fp,
           {simhash32_sql('x.token_hashes')} AS simhash
    FROM tok t
    JOIN sh s  ON t.doc_id = s.doc_id
    JOIN thx x ON t.doc_id = x.doc_id
    """


def doc_fingerprints_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (merges round-1's `document_fingerprints` +
    `simhash_fingerprints`) — driver gate moved into
    `text_fingerprint_suite`; kept callable for bench/tests:

    - order-insensitive content fingerprint (hash of sorted vocabulary);
    - min-shingle rolling fingerprint;
    - 32-bit SimHash (bit-majority of token hashes).

    All portable-hash built, so the oracle reproduces every bit.
    """
    from tutorial_apache_beam_spark.operators.dedup import with_shingles

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    content = toks.select(
        "doc_id",
        portable_hash64(
            F.array_join(F.array_sort(F.array_distinct("toks")), " ")
        ).alias("content_fp"),
    )
    sh = with_shingles(docs).select(
        "doc_id",
        F.coalesce(
            F.array_min(F.transform("shingles", portable_hash64)), F.lit(-1)
        ).alias("min_shingle_fp"),
    )
    sim = simhash_fingerprints(docs)
    return content.join(sh, "doc_id").join(sim, "doc_id")


def _pii_oracle() -> str:
    from tutorial_apache_beam_spark.operators.pii import (
        normalize_url_sql,
        pii_counts_sql,
        redact_pii_sql,
    )

    counts = ",\n           ".join(
        f"{sql} AS {name}" for name, sql in pii_counts_sql("pii_text").items()
    )
    return f"""
    WITH pbase AS (
      SELECT doc_id,
             concat_ws(' ', text,
               'user' || CAST(doc_id AS VARCHAR)
                      || '@Example' || CAST(doc_id % 5 AS VARCHAR) || '.COM',
               CASE WHEN doc_id % 2 = 0
                    THEN 'alt' || CAST(doc_id AS VARCHAR) || '@mail.org' END,
               '+' || CAST(1 + doc_id % 99 AS VARCHAR)
                   || '-' || CAST(200 + doc_id % 800 AS VARCHAR)
                   || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR),
               CAST(doc_id % 256 AS VARCHAR)
                   || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                   || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
                   || '.' || CAST((doc_id * 29) % 256 AS VARCHAR)
             ) AS pii_text,
             concat('HTTPS://WWW.Example', CAST(doc_id % 7 AS VARCHAR),
                    '.com:443/Path/', CAST(doc_id % 50 AS VARCHAR),
                    CASE WHEN doc_id % 3 = 0 THEN '?utm_source=t&x=1'
                         WHEN doc_id % 3 = 1 THEN '?utm_medium=m'
                         ELSE '' END,
                    '#Frag') AS url
      FROM documents),
    pnorm AS (
      SELECT doc_id,
           {counts},
           {portable_hash64_sql(redact_pii_sql("pii_text"))} AS redacted_fp,
           {normalize_url_sql("url")} AS norm_url
      FROM pbase)
    SELECT *,
           min(doc_id) OVER (PARTITION BY norm_url) AS url_canonical_id
    FROM pnorm
    """


def pii_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII redaction + URL normalization surface.

    The fixture text is PII-free (verified: no '@', no dotted digit
    runs), so deterministic synthetic PII is injected from doc_id —
    1-2 emails (mixed-case host), a phone, a dotted-quad IP appended to
    the text, plus a messy URL (uppercase scheme/host, default :443
    port, utm_* tracking params, fragment). The operator chain then has
    to find and scrub ALL of it: per-category match counts, the
    portable fingerprint of the redacted text (proves the full redacted
    string bit-for-bit without emitting it), the normalized URL, and
    the lowest doc_id sharing that normalized URL (url_dedup's grouping
    as a per-doc column).

    All built-in regexp expression chains (operators/pii.py) — map-only
    except the url-canonical window, which shuffles on the ~350-key
    norm_url domain.
    """
    from tutorial_apache_beam_spark.operators.pii import (
        normalize_url,
        pii_counts,
        redact_pii,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    pii_text = F.concat_ws(
        " ",
        F.col("text"),
        F.concat(F.lit("user"), s(did), F.lit("@Example"), s(did % 5), F.lit(".COM")),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("alt"), s(did), F.lit("@mail.org")),
        ),
        F.concat(
            F.lit("+"), s(1 + did % 99),
            F.lit("-"), s(200 + did % 800),
            F.lit("-"), s(1000 + did % 9000),
        ),
        F.concat(
            s(did % 256), F.lit("."), s((did * 7) % 256),
            F.lit("."), s((did * 13) % 256), F.lit("."), s((did * 29) % 256),
        ),
    )
    url = F.concat(
        F.lit("HTTPS://WWW.Example"), s(did % 7),
        F.lit(".com:443/Path/"), s(did % 50),
        F.when(did % 3 == 0, F.lit("?utm_source=t&x=1"))
        .when(did % 3 == 1, F.lit("?utm_medium=m"))
        .otherwise(F.lit("")),
        F.lit("#Frag"),
    )
    base = docs.select(
        "doc_id", pii_text.alias("pii_text"), url.alias("url")
    )
    norm = base.select(
        "doc_id",
        *[c.alias(n) for n, c in pii_counts("pii_text").items()],
        portable_hash64(redact_pii("pii_text")).alias("redacted_fp"),
        normalize_url("url").alias("norm_url"),
    )
    return norm.withColumn(
        "url_canonical_id", F.min("doc_id").over(Window.partitionBy("norm_url"))
    )


@register(
    "text_fingerprint_suite",
    oracle=f"""
    SELECT * FROM ({_TEXT_ANALYSIS_ORACLE}) ta
    JOIN ({_DOC_FINGERPRINTS_ORACLE}) fp USING (doc_id)
    JOIN ({_pii_oracle()}) pu USING (doc_id)
    """,
)
def text_fingerprint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis + fingerprints + PII/URL hygiene in ONE
    gate (merges round-2's `text_analysis_suite` + `doc_fingerprints_suite`
    — both one-row-per-document over the same table, so the merge is an
    equi-join on doc_id, not a union — and, since round 3, the
    `pii_url_suite` redaction/normalization surface): token/char/punct
    counts, BPE-ish token count, type-token ratio, quality score,
    stopword language ID, content/min-shingle/SimHash fingerprints,
    email/IP/phone redaction counts + redacted-text fingerprint,
    normalized-URL dedup keying.

    Scale (r14, VERDICT r13 item 9): the three member suites each
    re-scanned `documents` (ten parquet scans and five doc_id joins in
    the composed plan — every family re-tokenized the same text), for
    columns that are ALL per-row map-only expressions except the
    norm_url window and the SimHash bit-vote aggregate. The gate now
    computes every per-row column in ONE projection over ONE scan
    (tokens materialized once and shared by the analysis, fingerprint
    and shingle expressions), keeps the norm_url window on that frame
    (before any join, as in the original composition, so the canonical
    id is computed over all documents), and joins only the SimHash
    branch — the one genuinely aggregate-shaped member (explode →
    32-vote groupBy, kept in its codegen row-wise form; the array-HOF
    spelling is value-identical but runs interpreted, measured ~3x
    slower). Ten scans → two, five joins → one; results bit-identical
    (same expression trees, oracle re-verified). The member suites stay
    callable for bench/tests.
    """
    from tutorial_apache_beam_spark.operators.pii import (
        normalize_url,
        pii_counts,
        redact_pii,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")

    # --- shared base: one scan, tokens computed once -------------------
    base = docs.select(
        "doc_id", "lang", "text", tokens(F.col("text")).alias("toks")
    )
    for lang in _LANGS:
        base = base.withColumn(
            f"sw_{lang}",
            F.when(F.size("toks") == 0, F.lit(None).cast("double")).otherwise(
                F.round(
                    stopword_count(F.col("toks"), lang).cast("double")
                    / F.size("toks"),
                    4,
                )
            ),
        )

    # --- text-analysis columns (same expressions as text_analysis_suite)
    n_tokens = F.size("toks")
    n_types = F.size(F.array_distinct("toks"))
    sw_en = stopword_count(F.col("toks"), "en")
    tok_lens = F.transform(F.col("toks"), lambda x: F.length(x))
    shingles3 = word_shingles(F.col("toks"), 3)
    detected = F.when(F.size("toks") == 0, F.lit(None).cast("string")).otherwise(
        F.when(
            (F.col("sw_en") >= F.col("sw_es"))
            & (F.col("sw_en") >= F.col("sw_de"))
            & (F.col("sw_en") >= F.col("sw_fr")),
            "en",
        )
        .when(
            (F.col("sw_es") >= F.col("sw_de")) & (F.col("sw_es") >= F.col("sw_fr")),
            "es",
        )
        .when(F.col("sw_de") >= F.col("sw_fr"), "de")
        .otherwise("fr")
    )
    ta_cols = [
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_types.alias("n_types"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), 0
            )
        ).alias("n_bpe_tokens"),
        F.length(F.regexp_replace("text", "[a-zA-Z0-9\\s]", "")).alias("n_punct"),
        F.round(
            F.when(n_tokens == 0, 0.0).otherwise(n_types.cast("double") / n_tokens),
            4,
        ).alias("type_token_ratio"),
        F.round(
            F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5
            + F.when(n_tokens == 0, 0.0).otherwise(sw_en.cast("double") / n_tokens)
            * 0.5,
            4,
        ).alias("quality_score"),
        F.round(
            F.when(n_tokens == 0, 0.0).otherwise(
                F.aggregate(tok_lens, F.lit(0), lambda a, x: a + x).cast(
                    "double"
                )
                / n_tokens
            ),
            4,
        ).alias("mean_word_len"),
        F.coalesce(F.array_max(tok_lens), F.lit(0)).alias("max_word_len"),
        F.round(
            F.when(n_tokens < 3, 0.0).otherwise(
                F.lit(1.0)
                - F.size(F.array_distinct(shingles3)).cast("double")
                / F.size(shingles3)
            ),
            4,
        ).alias("dup_3gram_frac"),
        F.round(
            F.when(n_tokens == 0, 0.0).otherwise(
                _max_run_count(F.array_sort("toks")).cast("double") / n_tokens
            ),
            4,
        ).alias("top_token_frac"),
        F.col("lang").alias("labeled_lang"),
        detected.alias("detected_lang"),
    ]

    # --- fingerprint columns (same expressions as doc_fingerprints_suite,
    # minus the aggregate-shaped simhash, which joins in below) ----------
    fp_cols = [
        portable_hash64(
            F.array_join(F.array_sort(F.array_distinct("toks")), " ")
        ).alias("content_fp"),
        F.coalesce(
            F.array_min(
                F.transform(F.array_distinct(shingles3), portable_hash64)
            ),
            F.lit(-1),
        ).alias("min_shingle_fp"),
    ]

    # --- PII/URL columns (same expressions as pii_url_suite) -----------
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    pii_text = F.concat_ws(
        " ",
        F.col("text"),
        F.concat(F.lit("user"), s(did), F.lit("@Example"), s(did % 5), F.lit(".COM")),
        F.when(
            did % 2 == 0,
            F.concat(F.lit("alt"), s(did), F.lit("@mail.org")),
        ),
        F.concat(
            F.lit("+"), s(1 + did % 99),
            F.lit("-"), s(200 + did % 800),
            F.lit("-"), s(1000 + did % 9000),
        ),
        F.concat(
            s(did % 256), F.lit("."), s((did * 7) % 256),
            F.lit("."), s((did * 13) % 256), F.lit("."), s((did * 29) % 256),
        ),
    )
    url = F.concat(
        F.lit("HTTPS://WWW.Example"), s(did % 7),
        F.lit(".com:443/Path/"), s(did % 50),
        F.when(did % 3 == 0, F.lit("?utm_source=t&x=1"))
        .when(did % 3 == 1, F.lit("?utm_medium=m"))
        .otherwise(F.lit("")),
        F.lit("#Frag"),
    )
    base = base.withColumn("pii_text", pii_text).withColumn("url", url)
    pii_cols = [
        *[c.alias(n) for n, c in pii_counts("pii_text").items()],
        portable_hash64(redact_pii("pii_text")).alias("redacted_fp"),
        normalize_url("url").alias("norm_url"),
    ]

    merged = base.select("doc_id", *ta_cols, *fp_cols, *pii_cols).withColumn(
        "url_canonical_id",
        F.min("doc_id").over(Window.partitionBy("norm_url")),
    )
    sim = simhash_fingerprints(docs)
    # Restore the composed gate's column order (simhash sits between the
    # fingerprint and PII families).
    order = [
        c for c in merged.columns if c != "doc_id"
    ]
    i = order.index("min_shingle_fp") + 1
    return merged.join(sim, "doc_id").select(
        "doc_id", *order[:i], "simhash", *order[i:]
    )


@register(
    "multimodal_pipeline",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image'
                             WHEN 1 THEN 'audio'
                             ELSE 'video' END AS media_type,
             text,
             ('0x' || substring(md5(text), 1, 15))::BIGINT AS h
      FROM documents),
    meta AS (
      SELECT doc_id,
             media_type,
             octet_length(encode(text))                    AS n_bytes,
             CAST(64 + h % 512 AS INT)                     AS width,
             CAST(64 + (h // 512) % 512 AS INT)            AS height,
             CAST(CASE WHEN media_type = 'image' THEN 0
                  ELSE 1000 + (h // (512 * 512)) % 60000
                  END AS INT)                              AS duration_ms
      FROM m)
    SELECT *,
           CAST(CASE WHEN media_type = 'video'
                THEN duration_ms // 10000 + 1 ELSE 0 END AS BIGINT) AS n_frames,
           CAST(CASE WHEN media_type = 'audio' AND n_bytes > 0
                THEN n_bytes * 1000 // 8000 END AS INT)             AS wav_ms,
           CAST(CASE WHEN media_type = 'audio' AND n_bytes > 0
                THEN 8000 END AS INT)                               AS wav_rate,
           CAST(CASE WHEN media_type = 'audio' AND n_bytes > 0
                THEN 1 END AS INT)                                  AS wav_channels
    FROM meta
    """,
)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode + frame sampling in one gate (merges round-1's
    `multimodal_decode_metadata` + the previously rows-only
    `multimodal_frame_samples`):

    - binary media → typed metadata through the Arrow mapInPandas decode
      plumbing (deterministic stub codec — see operators.multimodal);
    - row-expanding frame sampler, checked through its count invariant:
      a video yields exactly duration_ms // interval + 1 frames, other
      media none. The oracle recomputes the stub's md5-derived metadata
      AND the frame-count formula in SQL, so the whole Python/Arrow path —
      including the flat-map expansion — is value-checked;
    - (round 5) the REAL audio decoder inside the hash gate: audio rows'
      bytes are synthesized into 8 kHz mono 16-bit PCM WAV containers in
      one Arrow stage, then decoded back by `wav_features` (stdlib
      `wave` + numpy — see operators.multimodal). One sample per source
      byte, so the oracle states the decoded duration as
      n_bytes * 1000 // 8000 and pins rate/channels — a writer→parser
      roundtrip of the real codec path, value-checked per document.
    """
    from collections.abc import Iterator

    import pandas as pd

    from tutorial_apache_beam_spark.operators.multimodal import (
        decode_metadata,
        media_table,
        sample_frames,
        wav_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    media = media_table(docs)
    meta = decode_metadata(media)
    frames = (
        sample_frames(media)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )

    def synth_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """One int16 sample per source byte, 8 kHz mono — a REAL WAV
        container whose decoded duration is n_bytes * 1000 // 8000."""
        import io
        import struct
        import wave

        for pdf in batches:
            out = {"doc_id": [], "content": []}
            for doc_id, c in zip(pdf["doc_id"], pdf["content"]):
                raw = b"" if c is None else bytes(c)
                if not raw:
                    continue
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(
                        b"".join(
                            struct.pack("<h", (b - 128) * 256) for b in raw
                        )
                    )
                out["doc_id"].append(doc_id)
                out["content"].append(buf.getvalue())
            yield pd.DataFrame(out)

    wav_meta = wav_features(
        media.filter(F.col("media_type") == "audio")
        .select("doc_id", "content")
        .mapInPandas(synth_wav, "doc_id BIGINT, content BINARY")
    ).select(
        "doc_id",
        F.col("duration_ms").alias("wav_ms"),
        F.col("sample_rate").alias("wav_rate"),
        F.col("channels").alias("wav_channels"),
    )
    return (
        meta.join(frames, "doc_id", "left")
        .withColumn("n_frames", F.coalesce(F.col("n_frames"), F.lit(0)))
        .join(wav_meta, "doc_id", "left")
    )


@register(
    "training_data_pipeline",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, text, {_TOK} AS toks FROM documents),
    scored AS (
      SELECT doc_id, text, len(toks) AS n_tokens,
             round(least(len(toks) / 100.0, 1.0) * 0.5
                   + ({stopword_count_sql('toks', 'en')}::DOUBLE / len(toks)) * 0.5,
                   4) AS quality_score
      FROM tok
      WHERE lang = 'en' AND len(toks) >= 20),
    kept AS (
      SELECT min(doc_id) AS doc_id, text FROM scored
      WHERE quality_score >= 0.3
      GROUP BY text),
    ktok AS (SELECT k.doc_id, {tokens_sql('k.text')} AS toks FROM kept k),
    ksh AS (SELECT doc_id,
                   list_distinct({word_shingles_sql('toks', 3)}) AS shingles
            FROM ktok),
    khsh AS (SELECT doc_id,
                    list_transform(shingles, s -> {portable_hash64_sql('s')}) AS hashes
             FROM ksh),
    inv AS (SELECT doc_id, unnest(hashes) AS h FROM khsh),
    freq AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
    inv2 AS (SELECT i.doc_id, i.h FROM inv i JOIN freq f USING (h)
             WHERE f.df <= 100),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM inv2 a JOIN inv2 b USING (h) WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               len(list_intersect(sa.hashes, sb.hashes))::DOUBLE
                 / len(list_distinct(list_concat(sa.hashes, sb.hashes))) AS j
        FROM cand
        JOIN khsh sa ON sa.doc_id = cand.id_a
        JOIN khsh sb ON sb.doc_id = cand.id_b)
      WHERE round(j, 4) >= 0.2),
    dupes AS (SELECT DISTINCT id_b FROM pairs),
    bh AS (SELECT DISTINCT unnest(list_transform(
               list_distinct({word_shingles_sql('toks', 3)}),
               s -> {portable_hash64_sql('s')})) AS h
           FROM tok WHERE doc_id % 97 = 0),
    kinv AS (SELECT doc_id, unnest(hashes) AS h FROM khsh),
    contaminated AS (
      SELECT ki.doc_id FROM kinv ki JOIN bh USING (h)
      GROUP BY ki.doc_id HAVING count(*) >= 2),
    curated AS (
      SELECT s.doc_id, s.n_tokens, s.quality_score,
             CASE WHEN s.quality_score >= 0.4 THEN 'high' ELSE 'mid' END AS tier
      FROM scored s
      JOIN kept k ON s.doc_id = k.doc_id
      WHERE s.doc_id NOT IN (SELECT id_b FROM dupes)
        AND s.doc_id % 97 <> 0
        AND s.doc_id NOT IN (SELECT doc_id FROM contaminated)),
    mixed AS (
      SELECT *,
             (CASE WHEN tier = 'high' THEN 2 ELSE 0 END)
             + (CASE WHEN {bucket_sql('doc_id', 'curriculum')}
                      < {threshold(0.5)} THEN 1 ELSE 0 END) AS _copies
      FROM curated)
    SELECT doc_id, n_tokens, quality_score, tier,
           CAST(u.epoch AS BIGINT) AS epoch
    FROM mixed, UNNEST(range(_copies)) AS u(epoch)
    WHERE _copies > 0
    """,
)
def training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end LLM training-data curation pipeline in one plan:

      language filter → length gate → quality score → exact dedup →
      near-dup removal (inverted-index Jaccard, keep-lowest-id) →
      benchmark decontamination (docs sharing ≥2 distinct 3-gram
      shingles with the held-out eval set — here `doc_id % 97 == 0` —
      are removed, as are the eval docs themselves) →
      curriculum mixture (operators.sampling.stratified_mix): quality
      tiers at the 0.4 score cut, 'high' upweighted 2.5x (two epoched
      full copies + a hash-decided half), 'mid' downsampled to 0.5 —
      → mixed (doc_id, n_tokens, quality_score, tier, epoch).

    Every stage is the corresponding engine operator; the oracle replays
    the whole chain in SQL — including every per-document sampling
    decision, which is portable-hash-derived and therefore bit-identical
    in DuckDB (rand()-based sampling could never be oracle-checked). At
    100 TB this is one lazy plan: a single text scan feeds scoring and
    shingling, dedup joins are equi-joins on hashes, the benchmark
    shingle set broadcasts (operators.dedup.benchmark_contamination),
    the mixture stage is map-only, and only the pruned survivor set
    reaches the sink.
    """
    from tutorial_apache_beam_spark.operators.dedup import (
        benchmark_contamination,
        exact_dedup,
        ngram_jaccard_pairs,
    )
    from tutorial_apache_beam_spark.operators.sampling import stratified_mix

    docs = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n_tokens = F.size(t)
    sw_en = stopword_count(t, "en")
    scored = (
        docs.filter(F.col("lang") == "en")
        .select(
            "doc_id",
            "text",
            n_tokens.alias("n_tokens"),
            F.round(
                F.least(n_tokens / 100.0, F.lit(1.0)) * 0.5
                + (sw_en.cast("double") / n_tokens) * 0.5,
                4,
            ).alias("quality_score"),
        )
        .filter(F.col("n_tokens") >= 20)
    )
    quality_gated = scored.filter(F.col("quality_score") >= 0.3)
    kept = exact_dedup(quality_gated.select("doc_id", "text"))
    # ONE persisted tokenize→shingle→hash scan of the deduped survivors
    # feeds BOTH the near-dup candidate pipeline and the benchmark-
    # decontamination overlap count (r13): the two stages previously
    # each ran their own `_shingle_rows(kept)` — two full corpus
    # tokenize passes where one suffices (the dominant stage at scale).
    # The contamination frame is materialized inside the scope (it is
    # tiny — flagged doc ids) so the shared scan can be released before
    # the gate returns; persist registrations sit INSIDE the
    # join-expansion scope per the r12 rule (cache partition counts
    # compile at registration).
    from tutorial_apache_beam_spark.operators.dedup import (
        _join_expansion_scope,
        _plan_est_bytes,
        _shingle_rows,
    )

    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    inv_plan = _shingle_rows(kept, "text", "doc_id", 3)
    inv = None
    try:
        with _join_expansion_scope(spark, _plan_est_bytes(inv_plan)):
            inv = inv_plan.persist()
            inv.count()
            # The two consumers of the shared scan are independent —
            # materialize them concurrently (guide §2.6), like the
            # lexical gate's branch overlap.
            from concurrent.futures import ThreadPoolExecutor

            contaminated = benchmark_contamination(
                kept, benchmark, min_overlap=2, doc_hashes=inv
            ).select("doc_id").persist()
            with ThreadPoolExecutor(max_workers=2) as pool:
                pairs_fut = pool.submit(
                    ngram_jaccard_pairs,
                    kept,
                    threshold=0.2,
                    max_doc_freq=100,
                    shingle_rows=inv,
                )
                cont_fut = pool.submit(contaminated.count)
                pairs = pairs_fut.result()
                cont_fut.result()
    finally:
        if inv is not None:
            inv.unpersist()
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    survivors = kept.join(dupes, "doc_id", "left_anti").select("doc_id")
    clean = survivors.filter(F.col("doc_id") % 97 != 0).join(
        contaminated, "doc_id", "left_anti"
    )
    curated = (
        clean.join(scored, "doc_id")
        .select("doc_id", "n_tokens", "quality_score")
        .withColumn(
            "tier",
            F.when(F.col("quality_score") >= 0.4, "high").otherwise("mid"),
        )
    )
    mixed = stratified_mix(
        curated,
        {"high": 2.5, "mid": 0.5},
        stratum_col="tier",
        key_col="doc_id",
        salt="curriculum",
    )
    # Materialize the (result-sized) gate output, then release the
    # per-invocation `contaminated` cache (ADVICE r13 — it was pinned for
    # the session lifetime, contrary to the cache-hygiene rule): same
    # persist-result/release-intermediates pattern as the ann and
    # embedding gates.
    result = mixed.withColumn("epoch", F.col("epoch").cast("long")).persist()
    result.count()
    contaminated.unpersist()
    return result


@register(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    inv AS (SELECT doc_id, unnest(hashes) AS h FROM hsh),
    freq AS (SELECT h, count(*) AS df FROM inv GROUP BY 1),
    inv2 AS (SELECT i.doc_id, i.h
             FROM inv i JOIN freq f USING (h) WHERE f.df <= 100),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM inv2 a JOIN inv2 b USING (h)
             WHERE a.doc_id < b.doc_id),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT id_a, id_b,
               round(len(list_intersect(sa.hashes, sb.hashes))::DOUBLE
                     / len(list_distinct(list_concat(sa.hashes, sb.hashes))),
                     4) AS jaccard
        FROM cand
        JOIN hsh sa ON sa.doc_id = cand.id_a
        JOIN hsh sb ON sb.doc_id = cand.id_b)
      WHERE jaccard >= 0.2),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS node, least(a, min(b)) AS component
             FROM reach GROUP BY a)
    SELECT component, count(*) AS cluster_size
    FROM comp
    GROUP BY 1
    HAVING count(*) >= 2
    """,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components over the Jaccard
    pair graph (A~B, B~C collapse together even without an A~C edge).

    Engine side is iterative min-label propagation (operators.graph —
    distributed, one shuffle per round, converges in O(diameter)). The
    oracle computes the same components via a recursive-CTE transitive
    closure (viable at oracle scale; the component label is the minimum
    doc_id in the component on both sides — exact value parity, upgrading
    round-1's rows-only check).
    Output: (component, cluster_size) for clusters of 2+ documents.
    """
    from tutorial_apache_beam_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_doc_freq=100)
    # No shuffle_partitions override: the near-dup graph resolves on the
    # union-find fast path; a graph that overflowed to the distributed
    # loop would need width sized to its edge list, not a fixed constant.
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
    )


def _split_pack_oracle() -> str:
    from tutorial_apache_beam_spark.operators.chunking import (
        chunk_fingerprints_sql,
    )

    n_chunks_sql, chunk_fps_sql = chunk_fingerprints_sql("toks", 64, 48)
    return f"""
    WITH tk AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    t AS (
      SELECT doc_id, doc_id % 8 AS shard, len(toks) AS n_tokens,
             {n_chunks_sql} AS n_chunks,
             {chunk_fps_sql} AS chunk_fps
      FROM tk
    )
    SELECT d.doc_id,
           CAST({portable_hash64_sql('d.text')} % 100 AS INT) AS bucket,
           CASE WHEN {portable_hash64_sql('d.text')} % 100 < 90 THEN 'train'
                WHEN {portable_hash64_sql('d.text')} % 100 < 95 THEN 'val'
                ELSE 'test' END AS split,
           t.shard,
           t.n_tokens,
           t.n_chunks,
           t.chunk_fps,
           CAST(floor(coalesce(sum(t.n_tokens) OVER (
                    PARTITION BY t.shard ORDER BY t.doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 4096.0) AS BIGINT) AS pack_id
    FROM documents d JOIN t ON d.doc_id = t.doc_id
    """


@register("split_and_pack", oracle=_split_pack_oracle())
def split_and_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set assembly in one gate (merges round-1's
    `dataset_split_assignment` + `pack_documents_by_token_budget`), one row
    per document:

    - deterministic 90/5/5 train/val/test split by CONTENT hash: identical
      content always lands in the same split — no train/test leakage
      through duplicates, stable across re-crawls; pure row-local
      projection, no shuffle;
    - sequence packing into ~4096-token packs across 8 independent shards
      (window partitioned by shard — a single global packing order would
      serialize onto one partition). A document's pack is
      floor(tokens-before-it / budget): contiguous offset-based packing,
      one shuffle, deterministic; packs overflow by at most one document —
      the standard concat-then-chunk approximation;
    - overlapping token-window chunking (size 64, stride 48 —
      operators.chunking, round 3): per-doc chunk count + the '|'-joined
      portable hash of every chunk's exact token content, so the oracle
      verifies the full chunk layout bit-for-bit without emitting nested
      arrays. Row-local, no shuffle.
    """
    from pyspark.sql import Window

    from tutorial_apache_beam_spark.operators.chunking import (
        chunk_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    bucket = (portable_hash64(F.col("text")) % 100).cast("int")
    split = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )
    toks = tokens(F.col("text"))
    n_chunks, chunk_fps = chunk_fingerprints(toks, 64, 48)
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        n_chunks.cast("bigint").alias("n_chunks"),
        chunk_fps.alias("chunk_fps"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    packed = t.select(
        "doc_id",
        "shard",
        "n_tokens",
        "n_chunks",
        "chunk_fps",
        F.floor(cum_before / 4096.0).alias("pack_id"),
    )
    return split.join(packed, "doc_id")
