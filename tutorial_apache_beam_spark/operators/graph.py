"""Iterative graph operators: connected components for dedup clustering.

Near-dup pair lists (from MinHash/SimHash/Jaccard) are edges of a
similarity graph; canonical dedup keeps one document per CONNECTED
COMPONENT, not per pair — A~B and B~C must collapse A, B, C together even
though A~C was never emitted.

`connected_components` is iterative min-label propagation (a small
fixed-point loop of joins/aggregations — the class of computation that has
no single SQL equivalent, hence rows-only in the correctness gate with
planted-cluster pytests):

    label(v) ← min(label(v), min over neighbors(label(u)))   until stable

Scale notes: each iteration is one shuffle-by-vertex join + aggregation;
iteration count is the graph diameter (tiny for near-dup graphs, which are
mostly small cliques). Labels persist per round and the previous round is
unpersisted — state in flight is one (vertex, label) pair per vertex.
Convergence is checked with a cheap changed-count aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """(vertex, component) — component = min vertex id reachable.

    `edges` is an undirected edge list; isolated vertices don't appear
    (they are their own components trivially — union them in if needed).

    `shuffle_partitions` sizes the per-iteration joins independently of
    the session default (temporarily, conf-scoped to this fixed-point
    loop — every action happens inside it): the edge list of a near-dup
    graph is orders of magnitude smaller than the corpus that produced
    it, and each label-propagation round otherwise pays the full session
    shuffle-partition count in task overhead (measured ~2 s/round on a
    few hundred edges at 32 partitions). At cluster scale pass a value
    proportional to the EDGE count, not the corpus size.
    """
    spark = edges.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        # Symmetrize in ONE pass over the edge input (a union of two
        # selects would evaluate the upstream pair-generation twice).
        sym = (
            edges.select(
                F.explode(
                    F.array(
                        F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                        F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .distinct()
            .persist()
        )
        labels = (
            sym.select(F.col("u").alias("vertex"))
            .distinct()
            .withColumn("component", F.col("vertex"))
            .persist()
        )

        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, sym.v == labels.vertex)
                .groupBy(F.col("u").alias("vertex"))
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(neighbor_min, "vertex", "left")
                .select(
                    "vertex",
                    F.least(
                        F.col("component"),
                        F.coalesce("nbr_component", F.col("component")),
                    ).alias("component"),
                    (
                        F.coalesce("nbr_component", F.col("component"))
                        < F.col("component")
                    ).alias("_changed"),
                )
                .persist()
            )
            # One action per iteration: materializes the cache AND reads
            # the convergence signal.
            changed = new_labels.agg(
                F.sum(F.col("_changed").cast("int")).alias("ch")
            ).collect()[0]["ch"]
            labels.unpersist()
            labels = new_labels.drop("_changed")
            if not changed:
                break
        sym.unpersist()
        return labels
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one doc per near-dup cluster (the min id), plus all unpaired
    docs — transitive closure of pairwise near-dup removal."""
    comps = connected_components(pairs, shuffle_partitions=8)
    drop = comps.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
