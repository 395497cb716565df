"""Pandas-UDF surface: vectorized scalar UDF and grouped applyInPandas.

The reference's DoFn is its only "UDF" (Demo1.java:57-70); this engine's
Python escape hatches are Arrow-vectorized. Both queries use deterministic
arithmetic so even the Python path is value-checked by the SQL oracle —
the point is proving the Arrow plumbing computes exactly what the
declarative plan would.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.registry import register


def _make_discounted_charge():
    """Vectorized scalar UDF (Arrow batches, ~10-100x a row-at-a-time UDF).

    Built lazily: `@F.pandas_udf` requires an active SparkSession, so the
    decorator can't run at module import time.
    """

    @F.pandas_udf("double")
    def discounted_charge(
        extended: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return extended * (1.0 - discount) * (1.0 + tax)

    return discounted_charge


@register(
    "pandas_udf_scalar_charge",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    WHERE l_quantity > 45
    """,
)
def pandas_udf_scalar_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF computing the TPC-H charge expression.

    (In production this exact expression should stay in `F.*` built-ins —
    the query exists to verify the vectorized-UDF path end to end.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    charge = _make_discounted_charge()
    # Rounded at 6 — the product of 2-decimal inputs lies ON the 6-decimal
    # grid, so round(·, 6) snaps exactly in both engines. Rounding at 2
    # hits half-cent boundaries (e.g. 19570.815), where Spark's
    # decimal-string HALF_UP and DuckDB's binary-value rounding disagree.
    return li.filter(F.col("l_quantity") > 45).select(
        "l_orderkey",
        "l_linenumber",
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias("charge"),
    )


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map UDAF-style transform: per-group standardization."""
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)
    out = pdf[["event_id", "event_type"]].copy()
    out["z"] = ((pdf["value"] - mu) / sd).round(4)
    return out


@register(
    "apply_in_pandas_zscore",
    oracle="""
    SELECT event_id,
           event_type,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score events within their type.

    One shuffle on the group key, then whole groups cross to Python as
    Arrow batches. The oracle is the equivalent window-aggregate form —
    the two must agree to 4 decimals.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").applyInPandas(
        _zscore, "event_id BIGINT, event_type STRING, z DOUBLE"
    )


@register(
    "udtf_word_positions",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           toks[i] AS word,
           CAST(i - 1 AS INT) AS pos
    FROM tok, unnest(range(1, len(toks) + 1)) AS u(i)
    """,
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one input row → many output rows (word, position).

    Completes the UDF/UDAF/UDTF surface (SURVEY §2.6): scalar pandas_udf,
    grouped applyInPandas, and this table function, lateral-joined per
    document. Whitespace splitting is deliberately trivial — the query
    verifies the UDTF row-expansion machinery against a SQL unnest.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word STRING, pos INT")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split()):
                yield (w, i)

    spark.udtf.register("split_words", SplitWords)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_udtf_in")
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.pos
        FROM documents_udtf_in d, LATERAL split_words(d.text) s
        """
    )
