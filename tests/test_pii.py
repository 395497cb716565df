"""PII redaction + URL normalization operator tests (operators/pii.py).

The registered gate (`text_fingerprint_suite`) checks the whole chain
against DuckDB on injected PII; these tests pin the operator semantics
on hand-picked strings, including the cases the gate's synthetic data
can't produce (multiple occurrences, no-match passthrough, tracking
params in every position).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.operators.pii import (
    normalize_url,
    pii_counts,
    redact_pii,
    url_dedup,
)


def _one(spark, text, expr):
    return (
        spark.createDataFrame([(text,)], "s string")
        .select(expr.alias("out"))
        .first()["out"]
    )


@pytest.mark.parametrize(
    "raw,expected",
    [
        (
            "mail a.b+c@ex-1.co.uk and x@y.io now",
            "mail <EMAIL> and <EMAIL> now",
        ),
        ("server at 10.0.255.3, port 8080", "server at <IP>, port 8080"),
        ("call +1-555-0199 or +49-301-23456", "call <PHONE> or <PHONE>"),
        ("no pii here 1.5 points", "no pii here 1.5 points"),
        (
            "joe@a.com from 192.168.0.1 dials +44-207-9460",
            "<EMAIL> from <IP> dials <PHONE>",
        ),
    ],
)
def test_redact_pii(spark, raw, expected):
    assert _one(spark, raw, redact_pii("s")) == expected


def test_pii_counts(spark):
    raw = "a@b.co c@d.io 1.2.3.4 +1-234-5678"
    row = (
        spark.createDataFrame([(raw,)], "s string")
        .select(*[c.alias(n) for n, c in pii_counts("s").items()])
        .first()
    )
    assert row["pii_email_cnt"] == 2
    assert row["pii_ipv4_cnt"] == 1
    assert row["pii_phone_cnt"] == 1


@pytest.mark.parametrize(
    "raw,expected",
    [
        # scheme+host lowercase, default port, fragment, trailing slash
        ("HTTP://WWW.Ex.COM:80/", "http://www.ex.com"),
        ("https://A.com:443/P/Q?x=1#frag", "https://a.com/P/Q?x=1"),
        # path/query case preserved; non-default port preserved
        ("https://a.com:8443/CaseS?Q=V", "https://a.com:8443/CaseS?Q=V"),
        # utm params: leading, middle, trailing, only
        ("https://a.com/p?utm_source=s&x=1", "https://a.com/p?x=1"),
        ("https://a.com/p?x=1&utm_campaign=c&y=2", "https://a.com/p?x=1&y=2"),
        ("https://a.com/p?x=1&utm_term=t", "https://a.com/p?x=1"),
        ("https://a.com/p?utm_medium=m", "https://a.com/p"),
        # port stripping is scheme-aware and authority-only:
        ("https://a.com/doc:443/x", "https://a.com/doc:443/x"),
        ("http://a.com:443/x", "http://a.com:443/x"),  # not http's default
        ("https://a.com:80/x", "https://a.com:80/x"),  # not https' default
        # scheme-less inputs pass through unchanged (never collapse)
        ("example.com/a", "example.com/a"),
        ("other.org/b", "other.org/b"),
    ],
)
def test_normalize_url(spark, raw, expected):
    assert _one(spark, raw, normalize_url("s")) == expected


def test_normalize_url_sql_twin_matches(spark, duck):
    """The DuckDB twin must normalize the same inputs identically."""
    from tutorial_apache_beam_spark.operators.pii import normalize_url_sql

    cases = [
        "HTTP://WWW.Ex.COM:80/",
        "https://A.com:443/P/Q?x=1#frag",
        "https://a.com/doc:443/x",
        "http://a.com:443/x",
        "https://a.com/p?utm_source=s&x=1",
        "example.com/a",
    ]
    for raw in cases:
        spark_val = _one(spark, raw, normalize_url("s"))
        duck_val = duck.execute(
            f"SELECT {normalize_url_sql(repr(raw))}"
        ).fetchone()[0]
        assert spark_val == duck_val, raw


def test_url_dedup_keeps_lowest_id(spark):
    rows = [
        (1, "https://A.com/x?utm_source=s"),
        (2, "https://a.com:443/x"),
        (3, "https://a.com/x/"),
        (4, "https://b.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["norm_url"]: r["doc_id"] for r in url_dedup(df).collect()}
    assert out == {"https://a.com/x": 1, "https://b.com/y": 4}


def test_quantize_vector_properties(spark):
    """int8 quantization: whole numbers in [-127, 127], max-|x| maps to
    ±127, zero vectors pass through, cosine is scale-invariant."""
    from tutorial_apache_beam_spark.functions.vectors import (
        cosine,
        quantize_vector,
    )

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.003, 0.001, -0.002, 0.004]),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = {
        r["vec_id"]: r["q"]
        for r in df.select(
            "vec_id", quantize_vector(F.col("v")).alias("q")
        ).collect()
    }
    assert out[1] == [64.0, -127.0, 32.0, 0.0]
    assert max(abs(x) for x in out[2]) == 127.0
    assert all(x == int(x) for x in out[2])
    assert out[3] == [0.0, 0.0, 0.0, 0.0]
    # scale cancellation: cos(q(a), q(b)) ~= cos(a, b) within quant error
    a, b = [0.5, -1.0, 0.25, 0.1], [0.4, -0.9, 0.3, 0.2]
    pair = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    r = pair.select(
        cosine(F.col("a"), F.col("b")).alias("c"),
        cosine(quantize_vector(F.col("a")), quantize_vector(F.col("b"))).alias("cq"),
    ).first()
    assert abs(r["c"] - r["cq"]) < 0.01
