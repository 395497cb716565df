"""Coverage for the remaining Beam-API transforms on batch inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.plans.pipeline import (
    Count,
    Distinct,
    Filter,
    FixedWindows,
    Flatten,
    MapElements,
    Mean,
    ParDo,
    Pipeline,
    Sum,
    WindowInto,
    WithTimestamps,
)
from tests.conftest import SF_DIR


def test_pardo_mapinpandas_matches_declarative(spark):
    """ParDo (Arrow-batched imperative path) == MapElements (codegen path)."""
    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events")

    def dofn(batch):
        out = batch[["event_id", "value"]].copy()
        out["value_sq"] = out["value"] * out["value"]
        return out

    imperative = (
        p.create(events)
        .apply("Square", ParDo(dofn, "event_id BIGINT, value DOUBLE, value_sq DOUBLE"))
        .df
    )
    declarative = events.select(
        "event_id", "value", (F.col("value") * F.col("value")).alias("value_sq")
    )
    assert sorted(map(tuple, imperative.collect())) == sorted(
        map(tuple, declarative.collect())
    )


def test_flatten_distinct_filter(spark):
    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events")
    clicks = p.create(events).apply(
        "Clicks", Filter(F.col("event_type") == "click")
    )
    views = p.create(events).apply("Views", Filter(F.col("event_type") == "view"))
    both = clicks.apply("Union", Flatten(views))
    assert both.df.count() == clicks.df.count() + views.df.count()
    types = (
        both.apply("Types", MapElements(lambda df: df.select("event_type")))
        .apply("Distinct", Distinct())
        .df.collect()
    )
    assert {r.event_type for r in types} == {"click", "view"}


def test_sum_mean_per_key_windowed(spark):
    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events")
    base = (
        p.create(events)
        .apply("Ts", WithTimestamps("ts"))
        .apply("Win", WindowInto(FixedWindows("1 hour")))
    )
    sums = base.apply("Sum", Sum.per_key("value", "user_id")).df
    means = base.apply("Mean", Mean.per_key("value", "user_id")).df
    counts = base.apply("Count", Count.per_key("user_id")).df
    # sum / count == mean on every (window, user)
    j = (
        sums.join(means, ["window_start", "window_end", "user_id"])
        .join(counts, ["window_start", "window_end", "user_id"])
        .select(
            (F.col("sum") / F.col("count") - F.col("mean")).alias("diff")
        )
        .agg(F.max(F.abs("diff")).alias("m"))
        .collect()[0]["m"]
    )
    assert j < 1e-9


def test_flatmap_groupbykey_combine(spark):
    from tutorial_apache_beam_spark.plans.pipeline import (
        CombinePerKey,
        FlatMap,
        GroupByKey,
    )

    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events").limit(200)
    # FlatMap: one row per character class of the event_type string.
    tokens = p.create(events).apply(
        "Tokens",
        FlatMap(
            lambda df: F.split(F.col("event_type"), ""),
            alias="ch",
            keep=["event_id", "event_type"],
        ),
    )
    n_chars = tokens.df.count()
    total_len = events.select(F.sum(F.length("event_type"))).collect()[0][0]
    assert n_chars == total_len

    gbk = p.create(events).apply(
        "GBK", GroupByKey("event_id", "event_type", sort_values=True)
    )
    rows = {r.event_type: r["values"] for r in gbk.df.collect()}
    assert all(list(v) == sorted(v) for v in rows.values())

    cpk = p.create(events).apply("Sum", CombinePerKey("value", "sum", "event_type"))
    expected = {
        r.event_type: r.s
        for r in events.groupBy("event_type").agg(F.sum("value").alias("s")).collect()
    }
    got = {r.event_type: r["sum"] for r in cpk.df.collect()}
    assert set(got) == set(expected)
    assert all(abs(got[k] - expected[k]) < 1e-9 for k in got)


def test_withkeys_keys_values_partition(spark):
    from tutorial_apache_beam_spark.plans.pipeline import (
        Keys,
        Partition,
        Values,
        WithKeys,
    )

    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events").limit(100)
    keyed = p.create(events).apply(
        "Key", WithKeys(F.col("user_id") % 2, key_name="parity")
    )
    assert "parity" in keyed.df.columns
    keys = keyed.apply("Keys", Keys("parity"))
    assert set(keys.df.columns) == {"parity"}
    vals = keyed.apply("Values", Values("parity"))
    assert "parity" not in vals.df.columns

    parts = Partition(3, F.col("user_id")).split(p.create(events))
    assert len(parts) == 3
    assert sum(pc.df.count() for pc in parts) == 100


def test_cogroupbykey(spark):
    from tutorial_apache_beam_spark.plans.pipeline import CoGroupByKey, Filter

    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events")
    clicks = p.create(events).apply("C", Filter(F.col("event_type") == "click"))
    purchases = p.create(events).apply("P", Filter(F.col("event_type") == "purchase"))
    cg = clicks.apply(
        "CoGroup", CoGroupByKey(purchases, "event_id", "event_id", "user_id")
    )
    rows = {r.user_id: (sorted(r.values_a), sorted(r.values_b)) for r in cg.df.collect()}
    # spot-check against direct aggregation
    expected_clicks = {
        r.user_id: sorted(r.ids)
        for r in clicks.df.groupBy("user_id")
        .agg(F.collect_list("event_id").alias("ids"))
        .collect()
    }
    for uid, (va, vb) in rows.items():
        assert va == expected_clicks.get(uid, [])
    # keys present on either side appear; missing side = empty list
    purchase_only = set(
        r.user_id for r in purchases.df.select("user_id").distinct().collect()
    ) - set(expected_clicks)
    for uid in purchase_only:
        assert rows[uid][0] == []


def test_reshuffle_sideinput_counter(spark):
    from tutorial_apache_beam_spark.plans.pipeline import (
        ParDo,
        Reshuffle,
        WithSingletonSideInput,
    )

    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events").limit(100)

    shuffled = p.create(events).apply("Reshuffle", Reshuffle(5))
    assert shuffled.df.rdd.getNumPartitions() == 5
    assert shuffled.df.count() == 100

    total = p.create(events).apply(
        "GlobalSum",
        MapElements(lambda df: df.agg(F.sum("value").alias("global_total"))),
    )
    with_side = p.create(events).apply("Side", WithSingletonSideInput(total))
    rows = with_side.df.select("event_id", "global_total").collect()
    assert len(rows) == 100
    assert len({r.global_total for r in rows}) == 1  # same singleton everywhere

    counter = p.counter("rows_seen")

    def count_rows(batch):
        counter.inc(len(batch))
        return batch[["event_id"]]

    out = p.create(events).apply("Count", ParDo(count_rows, "event_id BIGINT"))
    assert out.df.count() == 100
    assert counter.value == 100
