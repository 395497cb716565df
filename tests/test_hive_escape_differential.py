"""Differential check: Hive partition-value escaping vs Spark's writer.

`_hive_escape` claims to escape partition directory values exactly as
Spark's catalog does (ExternalCatalogUtils.escapePathName). Instead of
trusting the transcription of that char set, this writes every
adversarial value through Spark's OWN `partitionBy` in one shot and
asserts the produced directory names equal `k=<_hive_escape(v)>` —
including the quirks (asymmetric '{' escaped but '}' not; '+', ',',
';', '&', '@', '$', '|', '<', '>', '(', ')' all passed through; space
unescaped; unicode unescaped). Probed live at round 8: 28/28 identical.
"""

from __future__ import annotations

import os

from tutorial_apache_beam_spark.sources.avro_fallback import _hive_escape

ADVERSARIAL = [
    "a:1", "a/b", "a\\b", "a b", "a%b", "a=b", "a#b", "a*q", 'a"q',
    "a'q", "a\tb", "a\nb", "tilde~", "caret^", "brack[x]", "日本",
    "plus+q", "comma,q", "semi;q", "quest?q", "amp&q", "at@q",
    "dollar$q", "paren(q)", "brace{q}", "pipe|q", "lt<gt>", "π≈3",
]


def test_escaping_matches_spark_writer(spark, tmp_path):
    d = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(ADVERSARIAL)], "k STRING, n BIGINT"
    )
    df.coalesce(1).write.partitionBy("k").parquet(d)
    spark_dirs = sorted(
        x[2:] for x in os.listdir(d) if x.startswith("k=")
    )
    mine = sorted(_hive_escape(v) for v in ADVERSARIAL)
    assert spark_dirs == mine
    # and the unescape path recovers every original value on read-back
    back = spark.read.parquet(d)
    assert sorted(r["k"] for r in back.collect()) == sorted(ADVERSARIAL)
