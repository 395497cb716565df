"""Deterministic sampling / mixture weighting (operators.sampling)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR, assert_matches_oracle
from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.operators.sampling import (
    BUCKETS,
    bucket_sql,
    hash_sample,
    stratified_mix,
    stratified_mix_sql,
    threshold,
)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_hash_sample_matches_oracle(docs, duck):
    out = hash_sample(docs.select("doc_id", "source"), 0.25, salt="t1")
    sql = f"""
    SELECT doc_id, source FROM documents
    WHERE {bucket_sql("doc_id", "t1")} < {threshold(0.25)}
    """
    assert_matches_oracle(out, duck, sql)


def test_hash_sample_deterministic_under_repartition(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="s").select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), 0.3, salt="s")
        .select("doc_id")
        .collect()
    }
    assert a == b
    assert len(a) > 0


def test_hash_sample_fraction_accuracy(docs):
    n = docs.count()
    kept = hash_sample(docs, 0.5, salt="acc").count()
    # 500 Bernoulli(0.5) draws: 4 sigma ~ 45.
    assert abs(kept - 0.5 * n) < 0.1 * n


def test_hash_sample_salts_independent(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.5, salt="u").select("doc_id").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.5, salt="v").select("doc_id").collect()}
    n = docs.count()
    overlap = len(a & b)
    # Independent 50% samples overlap on ~25% of the corpus, not ~50%.
    assert abs(overlap - 0.25 * n) < 0.1 * n


def test_hash_sample_nested_compose(docs):
    outer = hash_sample(docs, 0.5, salt="outer")
    inner = hash_sample(outer, 0.2, salt="inner")
    ids_inner = {r["doc_id"] for r in inner.select("doc_id").collect()}
    ids_outer = {r["doc_id"] for r in outer.select("doc_id").collect()}
    assert ids_inner <= ids_outer


def test_hash_sample_rejects_bad_fraction(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


def test_stratified_mix_matches_oracle(docs, duck):
    weights = {"src0": 0.5, "src1": 2.0, "src2": 1.25}
    out = stratified_mix(
        docs.select("doc_id", "source"), weights, stratum_col="source"
    ).withColumn("epoch", F.col("epoch").cast("long"))
    sql = stratified_mix_sql(
        "documents", weights, stratum_col="source", columns="doc_id, source"
    )
    assert_matches_oracle(out, duck, sql)


def test_stratified_mix_weights(docs):
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    assert len(sources) >= 2, "fixture needs multiple sources"
    s0, s1 = sources[0], sources[1]
    base = {s: c for s, c in docs.groupBy("source").count().collect()}
    mixed = stratified_mix(docs, {s0: 2.5, s1: 0.4})
    got = {s: c for s, c in mixed.groupBy("source").count().collect()}
    assert set(got) == {s0, s1}, "strata outside the spec must be dropped"
    assert abs(got[s0] - 2.5 * base[s0]) < 0.2 * base[s0] + 10
    assert abs(got[s1] - 0.4 * base[s1]) < 0.2 * base[s1] + 10


def test_stratified_mix_epochs(docs):
    mixed = stratified_mix(docs, {"src3": 3.0}, salt="ep")
    eps = mixed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.collect_set("epoch").alias("es")
    )
    rows = eps.collect()
    assert rows, "src3 stratum must be non-empty"
    for r in rows:
        # Integer weight 3.0: exactly 3 copies, epochs {0,1,2}.
        assert r["n"] == 3
        assert sorted(r["es"]) == [0, 1, 2]


def test_stratified_mix_no_shuffle(docs):
    plan = stratified_mix(docs, {"src4": 1.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"mix must be map-only, got:\n{plan}"


def test_hash_sample_monotone_fractions(docs):
    # Same salt: a smaller fraction's sample is a SUBSET of a larger
    # one's (bucket thresholds nest) — ablation subsets scale
    # deterministically instead of resampling.
    small = {r["doc_id"] for r in hash_sample(docs, 0.2, salt="m").select("doc_id").collect()}
    large = {r["doc_id"] for r in hash_sample(docs, 0.6, salt="m").select("doc_id").collect()}
    assert small <= large
    assert len(small) < len(large)


def test_hash_sample_on_stream_matches_batch(spark):
    # Map-only operators run unchanged on streaming plans (the
    # unified-model property): draining a sampled stream yields exactly
    # the batch sample.
    from tutorial_apache_beam_spark.streaming.replay import (
        run_stream_to_memory,
        stream_events,
    )

    sampled = hash_sample(
        stream_events(spark, SF_DIR).select("event_id", "user_id"),
        0.3,
        key_col="event_id",
        salt="st",
    )
    drained = run_stream_to_memory(sampled, spark, output_mode="append")
    got = {r["event_id"] for r in drained.collect()}
    events = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    want = {
        r["event_id"]
        for r in hash_sample(events, 0.3, key_col="event_id", salt="st").collect()
    }
    assert got == want and len(want) > 0


def test_stratified_mix_sql_default_columns(docs, duck):
    # The columns="*" default must not leak the _copies helper or
    # duplicate the epoch alias.
    weights = {"src5": 1.5, "src6": 0.25}
    out = stratified_mix(docs, weights).withColumn(
        "epoch", F.col("epoch").cast("long")
    )
    assert_matches_oracle(out, duck, stratified_mix_sql("documents", weights))


def test_hash_sample_null_keys_match_oracle(spark, duck):
    """r6 review regression: Spark's concat_ws SKIPS a NULL key ("salt")
    while DuckDB's concat skips only the value ("salt:"), so the two
    engines hashed different strings for NULL keys and the bit-identical
    decision contract broke. Both now coalesce NULL to '' before
    hashing; the decision for every NULL-key row agrees cross-engine."""
    rows = [(None, "a"), (None, "b"), ("", "c"), ("k1", "d"), ("k2", "e")]
    df = spark.createDataFrame(rows, "doc_id string, payload string")
    duck.execute("CREATE OR REPLACE TABLE nulldocs AS SELECT * FROM (VALUES "
                 + ", ".join(
                     ("(NULL, '%s')" % p) if k is None else ("('%s', '%s')" % (k, p))
                     for k, p in rows
                 )
                 + ") t(doc_id, payload)")
    for frac in (0.3, 0.7):
        out = {
            r["payload"]
            for r in hash_sample(df, frac, salt="nk").select("payload").collect()
        }
        oracle = {
            r[0]
            for r in duck.execute(
                f"SELECT payload FROM nulldocs "
                f"WHERE {bucket_sql('doc_id', 'nk')} < {threshold(frac)}"
            ).fetchall()
        }
        assert out == oracle
    # NULL and '' deliberately collide: identical decision per salt.
    both = df.filter(F.col("payload").isin("a", "c"))
    for salt in ("x", "y", "z"):
        kept = {
            r["payload"]
            for r in hash_sample(both, 0.5, salt=salt).select("payload").collect()
        }
        assert kept in (set(), {"a", "c"})


def test_minhash_params_validated(docs):
    """r6 review regression: k % bands != 0 silently dropped signature
    values (a different LSH curve than documented), and k beyond the
    frozen coefficient table crashed with a missing-column
    AnalysisException mid-plan. Both now raise at the API boundary."""
    from tutorial_apache_beam_spark.functions.hashing import MINHASH_COEFFS
    from tutorial_apache_beam_spark.operators.dedup import minhash_lsh_pairs

    with pytest.raises(ValueError, match="positive multiple"):
        minhash_lsh_pairs(docs, k=10, bands=4)
    with pytest.raises(ValueError, match="positive multiple"):
        minhash_lsh_pairs(docs, k=12, bands=0)
    with pytest.raises(ValueError, match="coefficient"):
        minhash_lsh_pairs(docs, k=4 * (len(MINHASH_COEFFS) + 4) // 4, bands=4)
