"""Connected components: transitive near-dup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tutorial_apache_beam_spark.catalog import load_table
from tutorial_apache_beam_spark.operators.graph import (
    connected_components,
    dedup_keep_canonical,
)


def test_chain_and_clique_collapse(spark):
    # Components: chain 1-2-3-4, pair 10-11, triangle 20-21-22.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a BIGINT, id_b BIGINT",
    )
    comps = {
        r.vertex: r.component for r in connected_components(edges).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_keep_canonical_transitive(spark):
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    # A~B, B~C (A,B,C = 0,1,2): pairwise removal of id_b would keep 0 and
    # drop 1,2 only if 0~2 had been emitted — components get it right.
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a BIGINT, id_b BIGINT"
    )
    kept = sorted(r.doc_id for r in dedup_keep_canonical(docs, pairs).collect())
    assert kept == [0, 3, 4, 5, 7]


def test_components_on_real_near_dups(spark):
    """Cluster the fixture's actual near-dup pairs; every cluster's
    canonical id must be its minimum member."""
    from tutorial_apache_beam_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF_DIR, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2)
    comps = connected_components(pairs)
    bad = (
        comps.groupBy("component")
        .agg(F.min("vertex").alias("mn"))
        .filter(F.col("component") != F.col("mn"))
        .count()
    )
    assert bad == 0


def test_local_and_distributed_paths_agree(spark):
    """The union-find fast path and the iterative min-label loop must
    produce identical (vertex, component) sets — the size threshold is an
    execution strategy, never a semantics switch."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22), (4, 40)],
        "id_a BIGINT, id_b BIGINT",
    )
    local = {
        (r.vertex, r.component)
        for r in connected_components(edges).collect()
    }
    distributed = {
        (r.vertex, r.component)
        for r in connected_components(
            edges, shuffle_partitions=4, local_edge_threshold=0
        ).collect()
    }
    assert local == distributed and len(local) == 10


def test_byte_budget_routes_wide_edges_to_distributed(spark):
    """Pathologically wide endpoints (multi-KB string ids) must overflow
    the probe's BYTE budget even when the row count is tiny, falling
    through to the distributed loop — with identical results."""
    wide = "x" * 4096
    rows = [(f"{wide}{a}", f"{wide}{b}") for a, b in [(1, 2), (2, 3), (5, 6)]]
    edges = spark.createDataFrame(rows, "id_a STRING, id_b STRING")
    out = connected_components(
        edges,
        # ~8 KB/row estimated; budget of one row forces the overflow.
        local_edge_byte_budget=8 * 1024,
        shuffle_partitions=2,
    )
    comps = {r.vertex: r.component for r in out.collect()}
    assert comps == {
        f"{wide}1": f"{wide}1",
        f"{wide}2": f"{wide}1",
        f"{wide}3": f"{wide}1",
        f"{wide}5": f"{wide}5",
        f"{wide}6": f"{wide}5",
    }


def test_local_path_empty_edges(spark):
    empty = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    assert connected_components(empty).count() == 0


def test_local_path_string_vertex_ids(spark):
    """Non-integer vertex ids (e.g. content-hash doc ids) flow through the
    union-find fast path with the output schema derived from the input —
    component = lexicographic min member (same rule the distributed
    F.least path applies)."""
    edges = spark.createDataFrame(
        [("docB", "docA"), ("docB", "docC"), ("docX", "docY")],
        "id_a STRING, id_b STRING",
    )
    out = connected_components(edges)
    assert dict(out.dtypes) == {"vertex": "string", "component": "string"}
    comps = {r.vertex: r.component for r in out.collect()}
    assert comps == {
        "docA": "docA", "docB": "docA", "docC": "docA",
        "docX": "docX", "docY": "docX",
    }


def test_distributed_path_at_10x_matches_union_find(spark):
    """VERDICT r4 item 5: the distributed min-label-propagation branch
    executed over a LARGE real graph — the full near-dup pair set of the
    10x scale fixture (replica-disjoint corpora, so the component
    structure is 10 disjoint copies of the base graph's) — must converge
    and produce exactly the union-find result on the same edges. This is
    the branch a 100 TB corpus takes when the edge probe overflows; until
    this test it had only toy-graph executions."""
    from tools.scale_stress import BASE_DIR, ensure_scale_fixture
    from tutorial_apache_beam_spark.operators.dedup import ngram_jaccard_pairs

    sf1 = ensure_scale_fixture()
    docs = load_table(spark, sf1, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.2, max_doc_freq=100)
    assert pairs.count() > 1000  # genuinely large: 10x the base pair set

    distributed = connected_components(
        pairs, shuffle_partitions=8, local_edge_threshold=0
    )
    local = connected_components(pairs)
    d = {(r.vertex, r.component) for r in distributed.collect()}
    l = {(r.vertex, r.component) for r in local.collect()}
    assert d == l
    # Replica-disjoint construction: component counts scale exactly 10x
    # from the fixture's BASE corpus (sf0.1, not the test suite's
    # sf0.01), so a cross-replica merge (a propagation bug) is
    # detectable.
    base_pairs = ngram_jaccard_pairs(
        load_table(spark, BASE_DIR, "documents"),
        threshold=0.2,
        max_doc_freq=100,
    )
    base_comps = connected_components(base_pairs).select("component").distinct().count()
    assert distributed.select("component").distinct().count() == 10 * base_comps


def test_distributed_cc_deep_chain_truncates_lineage(spark):
    """r6 review regression: before per-round checkpointing, each round's
    plan referenced the previous round's twice, doubling the logical plan
    per round — a 9-vertex chain (diameter 8) OOM'd the driver during plan
    analysis. With lineage truncation it converges in seconds, and the
    only block left persisted afterwards is the returned frame."""
    import pytest

    from tutorial_apache_beam_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a BIGINT, id_b BIGINT"
    )
    out = connected_components(edges, local_edge_threshold=0)
    assert {r.vertex: r.component for r in out.collect()} == {
        i: 0 for i in range(9)
    }

    # Diameter > max_iter must RAISE, not silently return a split
    # component (dedup_keep_canonical would keep duplicate "canonicals").
    deep = spark.createDataFrame(
        [(i, i + 1) for i in range(24)], "id_a BIGINT, id_b BIGINT"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(deep, local_edge_threshold=0, max_iter=10)
    ok = connected_components(deep, local_edge_threshold=0, max_iter=30)
    assert {r.vertex: r.component for r in ok.collect()} == {
        i: 0 for i in range(25)
    }
