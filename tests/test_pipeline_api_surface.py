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


def test_top_sample_latest_combine_globally(spark):
    from tutorial_apache_beam_spark.plans.pipeline import (
        CombineGlobally,
        Latest,
        Sample,
        Top,
    )

    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events")

    # Top.of: global top-3 by value == orderBy/limit reference.
    top3 = p.create(events).apply(
        "Top3", Top.of(3, F.col("value").desc(), F.col("event_id"))
    ).df
    ref = events.orderBy(F.col("value").desc(), "event_id").limit(3)
    assert [r["event_id"] for r in top3.collect()] == [
        r["event_id"] for r in ref.collect()
    ]

    # Top.per_key: 2 best events per user; every user ≤ 2 rows, and each
    # user's rows are their true top-2.
    per_key = p.create(events).apply(
        "Top2PerUser",
        Top.per_key(2, ["user_id"], F.col("value").desc(), F.col("event_id")),
    ).df
    sizes = per_key.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert sizes <= 2

    # Sample: deterministic — same result twice, n rows.
    s1 = p.create(events).apply("S", Sample.fixed_size_globally(10, "event_id")).df
    s2 = p.create(events).apply("S2", Sample.fixed_size_globally(10, "event_id")).df
    ids1 = sorted(r["event_id"] for r in s1.collect())
    assert len(ids1) == 10
    assert ids1 == sorted(r["event_id"] for r in s2.collect())

    # Latest.per_key: one row per user carrying that user's max-ts values.
    latest = p.create(events).apply("L", Latest.per_key("ts", "user_id")).df
    ref_latest = events.groupBy("user_id").agg(F.max("ts").alias("ts"))
    joined = latest.select("user_id", "ts").exceptAll(ref_latest)
    assert joined.count() == 0

    # CombineGlobally: un-windowed == plain agg.
    total = p.create(events).apply(
        "Tot", CombineGlobally(F.count(F.lit(1)).alias("n"),
                               F.round(F.sum("value"), 2).alias("v"))
    ).df.first()
    ref_tot = events.agg(F.count(F.lit(1)), F.round(F.sum("value"), 2)).first()
    assert (total["n"], total["v"]) == (ref_tot[0], ref_tot[1])


def test_latest_per_key_tied_timestamps_emit_one_real_row(spark):
    """With tied max timestamps, Latest.per_key must emit one REAL input
    row, never a column mix of two tied rows (the struct-atomic max_by
    guarantee)."""
    from tutorial_apache_beam_spark.plans.pipeline import Latest

    rows = [
        (1, 10, "a", 100.0),
        (1, 10, "b", 200.0),  # tied ts=10: winner must be (a,100) or (b,200)
        (2, 5, "c", 1.0),
    ]
    df = spark.createDataFrame(rows, "k INT, ts INT, tag STRING, val DOUBLE")
    p = Pipeline(spark)
    out = {r["k"]: (r["tag"], r["val"]) for r in
           p.create(df).apply("L", Latest.per_key("ts", "k")).df.collect()}
    assert out[1] in {("a", 100.0), ("b", 200.0)}
    assert out[2] == ("c", 1.0)


def test_combine_globally_windowed(spark):
    from tutorial_apache_beam_spark.plans.pipeline import CombineGlobally

    p = Pipeline(spark)
    events = load_table(spark, SF_DIR, "events")
    out = (
        p.create(events)
        .apply("Stamp", WithTimestamps("ts"))
        .apply("Win", WindowInto(FixedWindows("1 minute")))
        .apply("Per-minute total", CombineGlobally(F.count(F.lit(1)).alias("n")))
        .df
    )
    ref = (
        events.groupBy(F.window("ts", "1 minute"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )
    got = {(r["window_start"], r["n"]) for r in out.select("window_start", "n").collect()}
    assert got == {(r["window_start"], r["n"]) for r in ref.collect()}


def test_registry_driver_contract_shape():
    """The driver checks exactly the registered window: 50 named gates,
    every oracle key backed by a query, import-time-stable ordering
    (registration order = checked order), and SQL strings that at least
    parse in DuckDB against empty views — a syntax error in an oracle
    should fail here, not in the round's correctness artifact."""
    import duckdb

    from tutorial_apache_beam_spark import registry

    q = registry.queries()
    o = registry.oracle_sql()
    assert len(q) == 50, f"registry drifted to {len(q)} gates"
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
    # registration order is the driver's checked window: stable, no dups
    assert len(set(q)) == len(q)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM (VALUES (1)) LIMIT 0")
    import json

    bad = []
    for name, sql in o.items():
        # Parse-level validation only: json_serialize_sql reports parse
        # failures in an "error" field (it does not raise), and never
        # binds columns — so stub views suffice and nothing executes.
        (res,) = con.execute(
            f"SELECT json_serialize_sql($${sql}$$)"
        ).fetchone()
        parsed = json.loads(res)
        if parsed.get("error"):
            bad.append((name, parsed.get("error_message", "")[:120]))
    con.close()
    assert not bad, bad
    # the validator itself must reject broken SQL
    (res,) = duckdb.connect().execute(
        "SELECT json_serialize_sql($$SELECT FROM WHERE$$)"
    ).fetchone()
    assert json.loads(res)["error"] is True


def test_partition_pmod_and_collision_safety(spark):
    """r6 review regression: Partition used sign-following % (negative
    partition expressions like F.hash() landed in {-(n-1)..-1} and
    matched no branch — silent row loss) and clobbered a caller's
    '_part' column."""
    from tutorial_apache_beam_spark.plans.pipeline import Partition

    p = Pipeline(spark)
    df = spark.range(1000).toDF("user_id").withColumn("_part", F.lit("keep"))
    parts = Partition(4, F.hash("user_id")).split(p.create(df))
    assert sum(pc.df.count() for pc in parts) == 1000
    for pc in parts:
        assert "_part" in pc.df.columns  # caller's column survives
        assert pc.df.select("_part").distinct().collect()[0][0] == "keep"


def test_cogroupbykey_windowed(spark):
    """r6 review regression: Beam's CoGroupByKey groups per WINDOW per
    key, but the transform ignored an active windowing context and
    merged values across all windows. Windowed sides now group through
    the shared windowed-agg helper and join on (window, key); mixed
    windowed/unwindowed inputs and session windows raise."""
    import pytest

    from tutorial_apache_beam_spark.plans.pipeline import (
        CoGroupByKey,
        Sessions,
    )

    p = Pipeline(spark)
    rows_a = [
        ("2024-01-01 00:00:10", 1, "a1"),
        ("2024-01-01 00:00:50", 1, "a2"),
        ("2024-01-01 00:01:10", 1, "a3"),
    ]
    rows_b = [
        ("2024-01-01 00:00:20", 1, "b1"),
        ("2024-01-01 00:01:40", 1, "b2"),
    ]
    schema = "ts STRING, k INT, v STRING"
    mk = lambda rows: p.create(
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )
    ).apply("T", WithTimestamps("ts")).apply(
        "W", WindowInto(FixedWindows("1 minute"))
    )
    a, b = mk(rows_a), mk(rows_b)
    cg = a.apply("CG", CoGroupByKey(b, "v", "v", "k"))
    got = {
        (r.window_start.strftime("%H:%M"), r.k): (
            sorted(r.values_a),
            sorted(r.values_b),
        )
        for r in cg.df.collect()
    }
    assert got == {
        ("00:00", 1): (["a1", "a2"], ["b1"]),
        ("00:01", 1): (["a3"], ["b2"]),
    }
    # mixed windowed/unwindowed raises
    plain = p.create(
        spark.createDataFrame(rows_b, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )
    )
    with pytest.raises(ValueError, match="both sides"):
        a.apply("Bad", CoGroupByKey(plain, "v", "v", "k"))
    # session windows raise (Beam merges sessions ACROSS inputs)
    sa = mk(rows_a).apply("S", WindowInto(Sessions("30 seconds")))
    sb = mk(rows_b).apply("S2", WindowInto(Sessions("30 seconds")))
    with pytest.raises(NotImplementedError, match="session"):
        sa.apply("BadS", CoGroupByKey(sb, "v", "v", "k"))
    # ADVICE r6: DIFFERENT window params must raise like Beam's
    # incompatible-windows error — fixed 1-min vs fixed 5-min would
    # otherwise full-outer-join on misaligned bounds into mostly-empty
    # co-groups.
    b5 = p.create(
        spark.createDataFrame(rows_b, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )
    ).apply("T5", WithTimestamps("ts")).apply(
        "W5", WindowInto(FixedWindows("5 minutes"))
    )
    with pytest.raises(ValueError, match="SAME window"):
        a.apply("BadW", CoGroupByKey(b5, "v", "v", "k"))


def test_singleton_side_input_enforced(spark):
    """r6 review regression: a multi-row side input silently multiplied
    every main-input row. Reading ANY side column now raises (Beam's
    AsSingleton contract). Boundary: a value-blind plan (bare count)
    prunes the side entirely and cannot trip the guard."""
    import pytest

    from tutorial_apache_beam_spark.plans.pipeline import (
        WithSingletonSideInput,
    )

    p = Pipeline(spark)
    main = p.create(spark.range(5).toDF("x"))
    two = p.create(spark.createDataFrame([(10,), (20,)], "total BIGINT"))
    bad = main.apply("S", WithSingletonSideInput(two))
    with pytest.raises(Exception, match="more than one row"):
        bad.df.select("x", "total").collect()


def test_flatmap_alias_collision(spark):
    """r6 review regression: FlatMap's default keep=all-columns plus
    default alias 'value' emitted two 'value' columns when the input
    already had one — the first downstream reference died with
    AMBIGUOUS_REFERENCE. The alias is now excluded from the default
    keep-set."""
    from tutorial_apache_beam_spark.plans.pipeline import FlatMap

    p = Pipeline(spark)
    pc = p.create(spark.createDataFrame([("a,b",), ("c",)], "value STRING"))
    out = pc.apply("Split", FlatMap(lambda df: F.split(F.col("value"), ",")))
    assert out.df.columns == ["value"]
    assert out.df.filter(F.col("value") == "a").count() == 1


def test_watermark_preserves_subsecond_delay(spark):
    """r6 review regression: sub-second skew/lateness was floor-divided
    to 0 seconds, silently dropping events inside the declared
    tolerance. The watermark is now emitted in milliseconds."""
    from tutorial_apache_beam_spark.plans.pipeline import WindowingSpec

    spec = WindowingSpec(
        window_fn=FixedWindows("1 minute"),
        ts_col="ts",
        allowed_skew="500 milliseconds",
        allowed_lateness="1 second",
    )
    assert spec.watermark_delay_ms() == 1500
    assert spec.watermark_delay_seconds() == 1
