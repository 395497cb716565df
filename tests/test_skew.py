"""Salted aggregation equals direct aggregation (including on a corpus
with one artificially hot key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.operators.skew import salted_agg


def test_salted_agg_matches_direct(spark):
    events = load_table(spark, SF_DIR, "events")
    # Manufacture skew: map 80% of rows onto user 0.
    skewed = events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 != 0, F.lit(0)).otherwise(F.col("user_id")),
    )
    salted = salted_agg(
        skewed,
        ["user_id"],
        salt_source=F.col("event_id"),
        aggs={
            "total": ("value", "sum"),
            "n": ("value", "count"),
            "vmin": ("value", "min"),
            "vmax": ("value", "max"),
        },
        salt_buckets=8,
    )
    direct = skewed.groupBy("user_id").agg(
        F.sum("value").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    s = {r.user_id: (round(r.total, 6), r.n, r.vmin, r.vmax) for r in salted.collect()}
    d = {r.user_id: (round(r.total, 6), r.n, r.vmin, r.vmax) for r in direct.collect()}
    assert s == d


def test_salted_agg_spreads_hot_key(spark):
    """The partial stage must actually fan the hot key across salt buckets."""
    events = load_table(spark, SF_DIR, "events")
    skewed = events.withColumn("user_id", F.lit(0))  # everything on one key
    salted = skewed.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(8)))
    n_buckets = salted.select("user_id", "_salt").distinct().count()
    assert n_buckets == 8


def test_salted_shuffle_join_matches_plain_join(spark):
    from tutorial_apache_beam_spark.operators.skew import salted_shuffle_join
    from tutorial_apache_beam_spark.catalog import load_table
    from tests.conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    users = (
        events.groupBy("user_id")
        .count()
        .select("user_id", F.col("count").alias("user_events"))
    )
    plain = events.join(users, ["user_id"]).select(
        "event_id", "user_id", "user_events"
    )
    salted = salted_shuffle_join(
        events, users, ["user_id"], salt_col="event_id", salt_buckets=8
    ).select("event_id", "user_id", "user_events")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    # left join with unmatched rows also survives salting
    some_users = users.filter(F.col("user_id") % 3 == 0)
    plain_l = events.join(some_users, ["user_id"], "left")
    salted_l = salted_shuffle_join(
        events, some_users, ["user_id"], salt_col="event_id",
        salt_buckets=8, how="left",
    )
    assert plain_l.count() == salted_l.count()
    assert (
        plain_l.filter(F.col("user_events").isNull()).count()
        == salted_l.filter(F.col("user_events").isNull()).count()
    )


def test_salted_agg_survives_user_salt_column(spark):
    """r6 review regression: salted_agg hardcoded '_salt' (and '_p_*')
    working columns; a caller frame already carrying '_salt' — e.g. from
    an upstream salting step — was silently overwritten, corrupting any
    aggregate that read it. Working names now dodge caller columns (the
    salted_shuffle_join guard, applied here)."""
    from pyspark.sql import functions as F

    from tutorial_apache_beam_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(1, 5, 100), (1, 7, 200), (2, 9, 300)],
        "k INT, _salt INT, v INT",
    )
    # Aggregate the caller's _salt column itself: before the guard, the
    # internal withColumn('_salt', ...) replaced it and the sums were
    # bucket ids, not data.
    out = {
        r["k"]: (r["salt_sum"], r["v_sum"])
        for r in salted_agg(
            df,
            ["k"],
            F.hash("v"),
            {"salt_sum": ("_salt", "sum"), "v_sum": ("v", "sum")},
        ).collect()
    }
    assert out == {1: (12, 300), 2: (9, 300)}


def test_salted_agg_count_follows_sql_null_semantics(spark):
    """r6: ('col', 'count') used to count ROWS whatever column was named
    — silently diverging from SQL count(col) on the first NULL. 'count'
    now skips nulls like every SQL engine; 'count_rows' is the explicit
    count(*)."""
    df = spark.createDataFrame(
        [(1, 10.0), (1, None), (1, 3.0), (2, None)],
        "k INT, v DOUBLE",
    )
    out = {
        r["k"]: (r["nv"], r["nr"])
        for r in salted_agg(
            df,
            ["k"],
            F.hash("v"),
            {"nv": ("v", "count"), "nr": ("v", "count_rows")},
            salt_buckets=4,
        ).collect()
    }
    assert out == {1: (2, 3), 2: (0, 1)}


def test_working_columns_dodge_caller_columns(spark):
    """r6: top_k_per_group and stratified_mix used hardcoded working
    columns ('_rn', '_copies'); a caller frame already carrying one was
    silently overwritten and dropped. Both now dodge."""
    from tutorial_apache_beam_spark.operators.relational import (
        top_k_per_group,
    )
    from tutorial_apache_beam_spark.operators.sampling import stratified_mix

    df = spark.createDataFrame(
        [(1, 5, "keep-a"), (1, 3, "keep-b"), (2, 9, "keep-c")],
        "g INT, v INT, _rn STRING",
    )
    got = {
        (r["g"], r["v"], r["_rn"])
        for r in top_k_per_group(df, ["g"], [F.col("v").desc()], 1).collect()
    }
    assert got == {(1, 5, "keep-a"), (2, 9, "keep-c")}

    mix_in = spark.createDataFrame(
        [(1, "hi", 7), (2, "lo", 8)],
        "doc_id BIGINT, tier STRING, _copies INT",
    )
    out = stratified_mix(
        mix_in, stratum_col="tier", weights={"hi": 2.0, "lo": 1.0}
    )
    rows = {(r["doc_id"], r["epoch"], r["_copies"]) for r in out.collect()}
    # caller's _copies column survives; 'hi' doc appears in 2 epochs
    assert rows == {(1, 0, 7), (1, 1, 7), (2, 0, 8)}
