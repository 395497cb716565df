"""BM25 lexical retrieval (operators/retrieval.py) — the sparse tier of
`ann_topk_methods` (r9).

Four legs:
1. a hand-worked Okapi example pinned against the implementation
   (every idf/tf-normalization value derived in-comment, so a formula
   drift fails with numbers a human can re-check);
2. tokenizer parity: the Spark expression vs the oracle's
   string_split_regex + list_filter on adversarial inputs;
3. the rounding-boundary margin sweep backing the round(·, 4) safety
   claim in both docstrings;
4. plan shape: pruning happens before the shuffle, stats join is a
   broadcast HASH join (a crossJoin here would plan the BNLJ the
   plan audit forbids outside one-row threshold patterns).
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.operators.retrieval import (
    BM25_QUERIES,
    bm25_scored,
    query_terms_df,
    tokenize,
)

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def test_bm25_hand_worked_example(spark):
    # Corpus: d1 "apple banana apple" (dl=3), d2 "banana cherry" (dl=2),
    # d3 "cherry date date cherry" (dl=4). N=3, avgdl=3.0.
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry date date cherry"),
        ],
        "doc_id LONG, text STRING",
    )
    q = spark.createDataFrame(
        [(1, "apple"), (1, "cherry")], "query_id LONG, term STRING"
    )
    got = {
        (r.probe_id, r.vec_id): r.cos
        for r in bm25_scored(docs, q).collect()
    }

    # df(apple)=1 -> idf = ln(1 + (3-1+0.5)/(1+0.5)) = ln(8/3)
    # df(cherry)=2 -> idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    idf_apple = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
    idf_cherry = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    # d1: apple tf=2, dl=3 -> w = 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/3.0))
    w1 = 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0))
    # d2: cherry tf=1, dl=2 -> w = 2.2 / (1 + 1.2*(0.25 + 0.75*2/3.0))
    w2 = 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3.0))
    # d3: cherry tf=2, dl=4 -> w = 2*2.2 / (2 + 1.2*(0.25 + 0.75*4/3.0))
    w3 = 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 4 / 3.0))
    exp = {
        (1, 1): round(idf_apple * w1, 4),   # 1.3487
        (1, 2): round(idf_cherry * w2, 4),  # 0.5442
        (1, 3): round(idf_cherry * w3, 4),  # 0.5909
    }
    assert got == exp
    # The score ORDER is the retrieval semantics being claimed: the
    # doc with the rarer term outranks higher-tf common-term docs.
    assert got[(1, 1)] > got[(1, 3)] > got[(1, 2)]


def test_duplicate_query_term_contributes_once(spark):
    """ADVICE r9: a repeated term in a query list must not inflate the
    score — Okapi sums each query term once. Both the helper frame and
    the operator's defensive dropDuplicates enforce it, so ("apple",
    "apple", "cherry") scores identically to ("apple", "cherry")."""
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry date date cherry"),
        ],
        "doc_id LONG, text STRING",
    )
    from tutorial_apache_beam_spark.operators.retrieval import (
        query_terms_df as qdf,
    )

    def scores(queries):
        return {
            (r.probe_id, r.vec_id): r.cos
            for r in bm25_scored(docs, qdf(docs.sparkSession, queries)).collect()
        }

    clean = scores([(1, ["apple", "cherry"])])
    duped = scores([(1, ["apple", "apple", "cherry"])])
    assert duped == clean
    # Raw frame with duplicate rows (bypassing query_terms_df) also
    # scores once — the operator dedupes internally.
    raw = spark.createDataFrame(
        [(1, "apple"), (1, "apple"), (1, "cherry")],
        "query_id LONG, term STRING",
    )
    got = {
        (r.probe_id, r.vec_id): r.cos
        for r in bm25_scored(docs, raw).collect()
    }
    assert got == clean


def test_tokenizer_parity_with_oracle(spark, duck):
    cases = [
        "",
        "   ",
        "Hello, World!",
        "a--b__c 9x",
        "UPPER lower MiXeD",
        "café naïve",     # accents split (outside [a-z0-9])
        "1e3 0x1A v2.0",
        "tab\tand\nnewline",
        "trailing space ",
        "-leading-punct",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)],
                               "i INT, s STRING")
    got = {
        r.i: r.toks
        for r in df.select("i", tokenize(F.col("s")).alias("toks")).collect()
    }
    for i, s in enumerate(cases):
        want = duck.execute(
            "SELECT list_filter(string_split_regex(lower(?), "
            "'[^a-z0-9]+'), x -> x <> '')", [s]
        ).fetchone()[0]
        assert got[i] == want, f"tokenizer diverges on {s!r}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_rounding_boundary_margin(duck, sf_dir):
    """Unrounded BM25 scores keep ≥1e-12 distance from every 5e-5
    rounding boundary (measured 1.4e-08 / 4.9e-10 at these SFs), so the
    ~1e-14 cross-engine fp noise cannot flip a rounded value. Computed
    in DuckDB alone — the cross-ENGINE agreement is the driver gate's
    hash check; this guards the margin itself."""
    qv = ", ".join(
        f"({qid}, '{t}')" for qid, terms in BM25_QUERIES for t in terms
    )
    rows = duck.execute(f"""
      WITH doc_tok AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text),
               '[^a-z0-9]+'), x -> x <> '') AS toks
        FROM '{sf_dir}/documents.parquet'),
      doc_stats AS (
        SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM doc_tok),
      qterms AS (SELECT CAST(q AS BIGINT) AS query_id, t AS term
                 FROM (VALUES {qv}) v(q, t)),
      posted AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                 FROM doc_tok),
      p AS (SELECT doc_id, dl, term, count(*) AS tf FROM posted
            WHERE term IN (SELECT term FROM qterms)
            GROUP BY doc_id, dl, term),
      f AS (SELECT term, count(*) AS df FROM p GROUP BY term)
      SELECT sum(
        ln(1.0 + (s.n_docs - f.df + 0.5)/(f.df + 0.5)) * p.tf * (1.2+1.0)
        / (p.tf + 1.2*((1.0-0.75) + 0.75*p.dl/s.avgdl))) AS score
      FROM p JOIN qterms q USING (term) JOIN f USING (term), doc_stats s
      GROUP BY q.query_id, p.doc_id
    """).fetchall()
    assert rows, "no candidates — query terms missing from fixture?"
    margin = min(
        float(abs((Decimal(repr(s * 10000)) % 1) - Decimal("0.5"))) * 1e-4
        for (s,) in rows
    )
    assert margin > 1e-12, f"{sf_dir}: margin {margin} too close to a " \
                           f"round(·,4) boundary for cross-engine safety"


def test_bm25_plan_prunes_before_shuffle(spark):
    """The corpus-wide exploded (doc, term) stream must meet the
    broadcast query-term filter on the MAP side — no full-corpus
    posting list may reach an exchange — and the one-row stats join
    must be a broadcast HASH join, not a nested loop."""
    import contextlib
    import io
    import re

    from tutorial_apache_beam_spark.operators.retrieval import tokenize

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qterms = query_terms_df(spark)
    plan = plan_of(bm25_scored(docs, qterms))
    assert "CartesianProduct" not in plan
    # The one-row corpus stats reach the score as scalar Subqueries —
    # a literal-key join here constant-folds to a BNLJ (measured; see
    # the operator docstring), which the plan audit forbids.
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "Subquery" in plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 3

    # Structural pre-shuffle-prune proof on the postings subplan it
    # materializes: rebuild pq exactly as the operator does and assert
    # its ONLY shuffles are the tiny query-term distinct (broadcast
    # side) and the post-join (doc, term) aggregation — i.e. the
    # corpus-wide exploded stream meets the broadcast filter map-side
    # and never reaches an exchange unpruned.
    from pyspark.sql import functions as FF

    toks = docs.select("doc_id", tokenize(FF.col("text")).alias("toks"))
    ex = toks.select(
        "doc_id", FF.size("toks").alias("dl"),
        FF.explode("toks").alias("term"),
    )
    pq = (
        ex.join(FF.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "dl", "term")
        .agg(FF.count("*").alias("tf"))
    )
    pq_plan = plan_of(pq)
    assert len(re.findall(r"\(\d+\) Exchange", pq_plan)) == 2
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", pq_plan)) == 1
    assert len(re.findall(r"\(\d+\) Generate", pq_plan)) == 1


def test_oracle_qterm_values_mirror_engine_dedupe(spark):
    """r10 review: the engine dedupes (query_id, term) but the oracle's
    VALUES list is built separately — pin that the oracle rows are
    duplicate-free and EXACTLY the engine's frame, so a future repeated
    term in BM25_QUERIES stays a no-op on both sides of the hash gate."""
    import re as _re

    from tutorial_apache_beam_spark.queries.similarity import (
        _BM25_QTERM_VALUES,
    )

    oracle_rows = set()
    pairs = _re.findall(r"\((\d+), '([^']+)'\)", _BM25_QTERM_VALUES)
    for qid, term in pairs:
        assert (int(qid), term) not in oracle_rows, "oracle dup"
        oracle_rows.add((int(qid), term))
    engine_rows = {
        (r.query_id, r.term) for r in query_terms_df(spark).collect()
    }
    assert oracle_rows == engine_rows
