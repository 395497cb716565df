"""Lexical (sparse) retrieval: BM25 keyword top-k over a document corpus.

The standard pairing for the dense ANN tiers in `operators/similarity.py`
— hybrid retrieval (dense + sparse) is how a training-data pipeline does
keyword-level decontamination sweeps and curation queries that embeddings
miss (exact product names, code identifiers, benchmark phrasings). The
reference engine has no retrieval operator; this extends the engine's
LLM-data scope the same way the dedup/ANN families do (SURVEY.md §2.6).

Scale shape (the part that matters at 100 TB):
- tokenize + explode is map-only and pipelined into the scan;
- postings are pruned to QUERY terms by a broadcast semi-join BEFORE any
  shuffle — the corpus-wide (doc, term) space never reaches an exchange,
  only postings whose term one of the queries mentions;
- document frequency needs only those same pruned postings (df(term) =
  rows per term, since postings are unique per (doc, term));
- corpus stats (N, avgdl) are one map-only aggregate joined back on a
  literal key (broadcast HASH join — deliberately not a crossJoin, which
  would plan a BroadcastNestedLoopJoin and trip the plan-audit bound);
- the final per-query ranking shuffles only scored candidates, grouped
  by (query, doc);
- exactly TWO corpus passes execute, both map-only (measured via the
  stage REST API: 2 input-bearing stages, 8 of 18 stages SKIPPED):
  the pruned postings build, referenced twice in the plan (scoring +
  document frequency) but deduplicated by runtime shuffle-stage reuse,
  and the corpus-stats pass (N, avgdl — one pass; the two scalar
  subqueries share it). Stats can't ride the postings pass because
  pruning discards non-matching documents by design.

Numeric parity with the DuckDB oracle (queries/similarity.py): tf, dl,
df, N are integers; avgdl is an exactly-representable ratio (token
totals far below 2^53); the only cross-engine noise is ln() ulp and the
3-term summation order, ≤ ~1e-14 absolute at these score magnitudes,
guarded by round(·, 4) before ranking — the min distance of any
candidate's unrounded score to a 5e-5 rounding boundary measured
1.4e-08 / 4.9e-10 / 3.4e-09 at sf0.001/0.01/0.1 (≥ ~5×10^4 × the
noise bound; swept in tests/test_retrieval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Classic Okapi parameters; literals mirrored verbatim in the oracle SQL.
BM25_K1 = 1.2
BM25_B = 0.75

# The fixed probe queries of the `ann_topk_methods` bm25 tier. Terms come
# from the documents fixture's generator vocabulary; query_id doubles as
# the gate's probe_id.
BM25_QUERIES: list[tuple[int, list[str]]] = [
    (1, ["spark", "join", "merge"]),
    (2, ["window", "agg", "stream"]),
    (3, ["customer", "order", "line"]),
    (4, ["hash", "scan", "filter"]),
    (5, ["slow", "query", "batch"]),
]

# One tokenizer, one definition, mirrored in SQL: lowercase, split on
# non-alphanumeric runs, drop empties. (string_split_regex + list_filter
# on the oracle side — tests/test_retrieval.py pins the parity.)
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(col) -> "F.Column":
    """text -> array<string> of lowercase alphanumeric tokens."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != ""
    )


def query_terms_df(spark: SparkSession, queries=None) -> DataFrame:
    """(query_id BIGINT, term STRING) rows — one per DISTINCT query term.

    Deduped (ADVICE r9): the scoring join in `bm25_scored` multiplies a
    term's contribution once per matching qterms row, so a repeated term
    in a query list would silently inflate that term's score — Okapi
    semantics sum each query term once. Order-preserving dedupe here
    (and a defensive `dropDuplicates` in `bm25_scored` for frames built
    elsewhere) makes repeats a no-op instead.
    """
    rows = list(dict.fromkeys(
        (int(qid), t) for qid, terms in (queries or BM25_QUERIES)
        for t in terms
    ))
    return spark.createDataFrame(rows, "query_id LONG, term STRING")


def bm25_scored(
    docs: DataFrame,
    qterms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Score every document sharing ≥1 term with each query.

    Returns (probe_id = query_id, vec_id = doc_id, cos = round(BM25, 4))
    — the `ann_topk_methods` tagged-union row shape; the gate's shared
    (method, probe) window does the top-k cut, so at 100 TB the rank
    reduction rides the same single exchange as the dense tiers.

    The corpus stats (N, avgdl) reach the score as SCALAR SUBQUERIES,
    not a joined one-row frame: a literal-key equi-join constant-folds
    its condition away and plans a BroadcastNestedLoopJoin (measured —
    it tripped the plan audit's BNLJ bound), while a scalar subquery
    executes the map-only aggregate once and embeds the value as a
    literal. This is the one place the operator drops from the
    DataFrame API to `spark.sql` templating, precisely because the
    scalar-subquery plan shape is not expressible in the former.
    """
    spark = docs.sparkSession
    # A duplicate (query_id, term) row would score that term twice via
    # the postings join below — dedupe so arbitrary caller-built query
    # frames keep Okapi's one-contribution-per-query-term semantics.
    qterms = qterms.dropDuplicates(["query_id", "term"])
    toks = docs.select(
        F.col(id_col), tokenize(F.col(text_col)).alias("toks")
    )
    # dl rides along with the exploded terms so no corpus-sized join is
    # needed to recover document length at scoring time.
    ex = toks.select(
        id_col, F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    # Prune to query terms BEFORE the (doc, term) aggregation: only
    # postings for the handful of query terms ever shuffle.
    pq = (
        ex.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # df(term): pq is unique per (doc, term), so rows-per-term IS the
    # document frequency — tiny (≤ |query terms| rows), hinted back in.
    return spark.sql(
        f"""
        WITH dfreq AS (SELECT term, count(*) AS df FROM {{pq}}
                       GROUP BY term),
             stats AS (SELECT count(*) AS n_docs,
                              avg(size(toks)) AS avgdl FROM {{toks}})
        SELECT /*+ BROADCAST(q), BROADCAST(f) */
               q.query_id AS probe_id,
               CAST(p.{id_col} AS LONG) AS vec_id,
               round(sum(
                 ln(1.0 + ((SELECT n_docs FROM stats) - f.df + 0.5)
                          / (f.df + 0.5))
                 * p.tf * ({k1!r} + 1.0)
                 / (p.tf + {k1!r} * ((1.0 - {b!r})
                    + {b!r} * p.dl / (SELECT avgdl FROM stats)))
               ), 4) AS cos
        FROM {{pq}} p
        JOIN {{qterms}} q USING (term)
        JOIN dfreq f USING (term)
        GROUP BY q.query_id, p.{id_col}
        """,
        pq=pq,
        toks=toks,
        qterms=qterms,
    )
