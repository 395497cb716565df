"""Scale-stress sweep: LLM-family gates at sf0.1 vs a 10× fixture.

Empirically validates the 100 TB plan-shape claims (VERDICT r3 item 1):
each gate's wall-time must grow at most ~linearly with the corpus when
the data itself scales linearly (the `tools/gen_scale_fixture.py`
construction guarantees linear pair/cluster growth by replica-disjoint
token renaming, so any superlinear time is the plan's fault).

Measured gates and why:
- lexical_neardup_pairs: the inverted-index + banded-LSH candidate
  machinery — the classic quadratic blowup risk;
- near_dup_clusters: pair generation + connected components (driver
  union-find probe must not overflow);
- training_data_pipeline: the end-to-end composition;
- ann_topk (fixed probes): all four ANN tiers at a FIXED 20-probe
  budget, so the ratio isolates corpus-side growth. The registered
  `ann_topk_methods` gate's probe set deliberately scales with the
  corpus (every-100th contract), which makes its brute-force tiers
  quadratic BY CONTRACT — a fixed probe set is the scale-honest
  measurement.
- text_fingerprint_suite: the per-doc codegen chains — embarrassingly
  parallel, so its ratio is the floor any per-doc operator should hit;
- simhash_near_dups: NOTE its output rows grow SUPERLINEARLY by metric
  semantics (hamming-≤3 pairs are quadratic in cluster size, and the
  renamed replicas still collide in simhash space even though their
  shingle hashes are disjoint) — measured ~25x pairs at 10x docs. Its
  inclusion measures the banded-join machinery under superlinear
  candidate load; a wall ratio far below the output growth is the pass
  signal, not rows-linearity.

Importable (`sf_scaling_section`) by bench.py; runnable standalone:
  python tools/scale_stress.py [--runs 2]
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

BASE_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_DIR = os.path.join(REPO, ".scaledata", "sf1")
REPLICA_OFFSET = 10_000_000


def _ann_topk_fixed_probes(spark, sf_dir: str):
    """The four ANN tiers of `ann_topk_methods` with a probe set pinned
    to the BASE replica (identical 20 probes at every scale)."""
    from pyspark.sql import Window

    from tutorial_apache_beam_spark.catalog import load_table
    from tutorial_apache_beam_spark.functions.vectors import quantize_vector
    from tutorial_apache_beam_spark.operators.similarity import (
        cosine_topk,
        ivf_ann_topk,
        srp_ann_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    is_probe = (F.col("vec_id") % 100 == 0) & (
        F.col("vec_id") < REPLICA_OFFSET
    )
    probes = emb.filter(is_probe)
    emb_q8 = emb.select(
        "vec_id", quantize_vector(F.col("embedding")).alias("embedding")
    )
    probes_q8 = emb_q8.filter(is_probe)

    def tag(df, method):
        return df.select(
            F.lit(method).alias("method"), "probe_id", "vec_id", "cos"
        )

    scored = (
        tag(cosine_topk(emb, probes, k=5, rank=False), "exact")
        .unionByName(tag(cosine_topk(emb_q8, probes_q8, k=5, rank=False), "q8"))
        .unionByName(tag(srp_ann_topk(emb, probes, k=5, rank=False), "srp"))
        .unionByName(
            tag(ivf_ann_topk(emb, probes, k=5, nprobe=2, rank=False), "ivf")
        )
    )
    w = Window.partitionBy("method", "probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
    )


def _bm25_scaled_queries(spark, sf_dir: str):
    """BM25 with a query set that SCALES with the corpus (r9): the
    fixture renames every token per replica (suffix zz{r}, doc_ids
    offset by replica*10M), so the base query terms exist in replica 0
    only — a FIXED query set would just measure the broadcast prune
    discarding (mult-1)/mult of the corpus (trivially sublinear, and
    not the machinery under test). Per-replica suffixed query variants
    (query_id offset by 100 per replica) keep per-query work constant
    while queries and corpus grow together: postings, document
    frequencies, candidates and output rows all scale linearly by
    construction, so the wall ratio isolates the plan."""
    from tutorial_apache_beam_spark.operators.retrieval import (
        BM25_QUERIES,
        bm25_scored,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = sorted(
        r[0]
        for r in docs.select(
            (F.col("doc_id") / REPLICA_OFFSET).cast("int").alias("r")
        )
        .distinct()
        .collect()
    )
    rows = []
    for j, r in enumerate(reps):
        sfx = "" if r == 0 else f"zz{r}"
        for qid, terms in BM25_QUERIES:
            rows.extend((qid + j * 100, t + sfx) for t in terms)
    qterms = spark.createDataFrame(rows, "query_id LONG, term STRING")
    return bm25_scored(docs, qterms)


def _gates():
    from tutorial_apache_beam_spark import registry

    q = registry.queries()
    return {
        "lexical_neardup_pairs": q["lexical_neardup_pairs"],
        "near_dup_clusters": q["near_dup_clusters"],
        "training_data_pipeline": q["training_data_pipeline"],
        "ann_topk_fixed_probes": _ann_topk_fixed_probes,
        # round 4 additions: the per-doc codegen chains (must be embar-
        # rassingly parallel, ratio ≈ data growth at worst) and the
        # simhash banded join (candidate growth must stay linear)
        "text_fingerprint_suite": q["text_fingerprint_suite"],
        "simhash_near_dups": q["simhash_near_dups"],
        # round 5 additions: events-based RELATIONAL machinery — the
        # as-of join (one shuffle, union+window; a range cross-join here
        # would blow up quadratically in events) and the salted skew
        # aggregation (salting cost must stay linear in rows)
        "asof_join_purchase_last_click": q["asof_join_purchase_last_click"],
        "salted_skew_aggregation": q["salted_skew_aggregation"],
        # round 6 addition: the promoted pair+cluster gate (blocked-BLAS
        # O(n²) pair generation + connected components). Unlike the
        # token-renamed documents, the rotated embedding replicas do NOT
        # preserve linear pair structure: the 0.35 threshold sits inside
        # the decorrelated cross-replica cosine bulk, so pair rows grow
        # ~quadratically (measured 103× at 10× corpus) — which is the
        # honest shape of exact all-pairs at a fixed threshold. The
        # ratio to watch is wall vs PAIRS EMITTED (sub-linear: 3.5×
        # wall for 103× rows), not wall vs corpus.
        "embedding_cosine_near_dups": q["embedding_cosine_near_dups"],
        # round 9 addition: the sparse-retrieval tier with a corpus-
        # scaled query set (see _bm25_scaled_queries for why fixed
        # queries would be a trivial measurement here)
        "bm25_scaled_queries": _bm25_scaled_queries,
    }


def scale_dir_for(mult: int) -> str:
    """Fixture directory for a replica multiplier: .scaledata/sf1 for
    10×, .scaledata/sf10 for 100× (dir names carry the EQUIVALENT SF of
    the /root/testdata naming, not the multiplier)."""
    return os.path.join(REPO, ".scaledata", f"sf{mult // 10}")


def ensure_scale_fixture(mult: int = 10) -> str:
    """Generate the mult× fixture if absent (deterministic; ~10 s at
    10×, ~2 min at 100×).

    All three tables are checked — a fixture dir generated before events
    scaling existed (round 4) is regenerated in full.
    """
    d = scale_dir_for(mult)
    if not all(
        os.path.exists(f"{d}/{t}.parquet")
        for t in ("documents", "embeddings", "events")
    ):
        from tools.gen_scale_fixture import generate

        generate(BASE_DIR, d, mult)
    return d


def _drain_with_state_metrics(spark, streaming_df, output_mode="append"):
    """availableNow-drain into a memory sink, returning (wall_sec,
    sink_rows, max_state_rows) where max_state_rows is the peak total
    state-store row count across micro-batches (summed over stateful
    operators, from the query progress metrics) — the number the
    watermark-bounded-state claims are about."""
    from tutorial_apache_beam_spark.streaming.replay import (
        STREAM_STATE_PARTITIONS,
    )

    qname = f"scale_stress_{int(time.monotonic() * 1e6) % 10**9}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS)
    )
    try:
        t0 = time.monotonic()
        q = (
            streaming_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.monotonic() - t0
        state_rows = 0
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            state_rows = max(
                state_rows, sum(op.get("numRowsTotal", 0) for op in ops)
            )
        rows = spark.table(qname).count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        try:
            spark.catalog.dropTempView(qname)
        except Exception:
            pass
    return wall, rows, state_rows


def _streaming_gates():
    """The three stateful-streaming shapes the 100 TB claims rest on
    (VERDICT r4 item 3): the Demo2-equivalent windowed aggregation, the
    custom applyInPandasWithState pane operator, and the stream-stream
    interval join. Each takes (spark, sf_dir) and returns (streaming_df,
    output_mode)."""
    from tutorial_apache_beam_spark.operators.windowing import tumbling_counts
    from tutorial_apache_beam_spark.streaming.replay import stream_events
    from tutorial_apache_beam_spark.streaming.stateful import (
        discarding_pane_counts,
    )

    def demo2_append(spark, sf_dir):
        sdf = stream_events(spark, sf_dir).withWatermark("ts", "2 minutes")
        return tumbling_counts(sdf, "ts", ["user_id"], "1 minute"), "append"

    def discarding_panes(spark, sf_dir):
        sdf = stream_events(spark, sf_dir)
        return (
            discarding_pane_counts(
                sdf, ts_col="ts", key_col="user_id",
                window_duration="1 minute",
            ),
            "append",
        )

    def interval_join_inner(spark, sf_dir):
        purchases = (
            stream_events(spark, sf_dir)
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 minute")
        )
        clicks = (
            stream_events(spark, sf_dir)
            .filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
            )
            .withWatermark("c_ts", "1 minute")
        )
        cond = (
            (F.col("p_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts"))
        )
        joined = purchases.join(clicks, cond).select(
            "purchase_id",
            "click_id",
            F.col("p_user").alias("user_id"),
        )
        return joined, "append"

    return {
        "streaming_demo2_append": demo2_append,
        "streaming_discarding_panes": discarding_panes,
        "streaming_interval_join_inner": interval_join_inner,
    }


def streaming_scaling_section(spark, runs: int = 1, mult: int = 10) -> dict:
    """Drain the three stateful-streaming shapes at the base and 10×
    events fixtures (replica-disjoint keys, identical time axis — state
    must grow linearly in keys, wall ~linearly in rows). Reports wall
    secs, drained MiB/s, sink rows, and PEAK state-store rows at each
    scale, plus the time and state ratios. Watermark-boundedness shows
    up as state_ratio ≈ mult (keys scaled) rather than unbounded."""
    scale_dir = ensure_scale_fixture(mult)
    out: dict[str, dict] = {}
    for name, build in _streaming_gates().items():
        row: dict[str, object] = {}
        for tag_, d in (("base", BASE_DIR), ("x10", scale_dir)):
            mib = os.path.getsize(f"{d}/events.parquet") / (1024 * 1024)
            best_wall, rows, state_rows = float("inf"), -1, 0
            for _ in range(runs):
                sdf, mode = build(spark, d)
                wall, rows, state_rows = _drain_with_state_metrics(
                    spark, sdf, mode
                )
                best_wall = min(best_wall, wall)
            row[f"{tag_}_sec"] = round(best_wall, 3)
            row[f"{tag_}_rows"] = rows
            row[f"{tag_}_state_rows"] = state_rows
            row[f"{tag_}_mib_per_s"] = round(mib / best_wall, 2)
        row["time_ratio"] = round(
            row["x10_sec"] / max(row["base_sec"], 1e-9), 2
        )
        base_state = row["base_state_rows"]
        row["state_ratio"] = (
            round(row["x10_state_rows"] / base_state, 2) if base_state else None
        )
        out[name] = row
    return out


def streaming_100x_section(
    spark, runs: int = 2, names: tuple[str, ...] = (
        "streaming_demo2_append", "streaming_demo2_append_split",
        "streaming_discarding_panes",
    )
) -> dict:
    """VERDICT r6 #8 — the 100× streaming state-store measurement.

    Batch had 100× SHUFFLE.md coverage; streaming stopped at 10×. This
    drains the Demo2-equivalent windowed aggregation and the custom
    discarding-panes operator over the 100× events fixture (10M events,
    replica-disjoint keys), recording wall, sink rows, PEAK state-store
    rows, and sustained MiB/s — the last unmeasured scale axis. Run as
    `python tools/scale_stress.py --streaming-100x`; results recorded in
    SCALING.md "## Stateful streaming at 100× (round 8)" (one-off, not
    per-bench: ~2 min; state measured exactly 100× at 100× keys)."""
    from tutorial_apache_beam_spark.streaming.replay import (
        single_file_scan_scope,
    )

    scale_dir = ensure_scale_fixture(100)
    gates = _streaming_gates()
    out: dict[str, dict] = {}
    for name in names:
        # "<gate>_split" = the same drain under single_file_scan_scope —
        # the source-partitioning contract for one-big-file replays
        # (VERDICT r8 #4: the 100x fixture is ONE ~116 MiB parquet file,
        # which availableNow scans with ONE task under the default 128
        # MiB maxPartitionBytes).
        split = name.endswith("_split")
        build = gates[name.removesuffix("_split")]
        events_path = f"{scale_dir}/events.parquet"
        scope = (
            (lambda: single_file_scan_scope(spark, events_path))
            if split
            else contextlib.nullcontext
        )
        mib = os.path.getsize(events_path) / (1024 * 1024)
        best_wall, rows, state_rows = float("inf"), -1, 0
        for _ in range(runs):
            sdf, mode = build(spark, scale_dir)
            with scope():
                wall, rows, state_rows = _drain_with_state_metrics(
                    spark, sdf, mode
                )
            best_wall = min(best_wall, wall)
        out[name] = {
            "x100_sec": round(best_wall, 3),
            "x100_rows": rows,
            "x100_state_rows": state_rows,
            "x100_mib_per_s": round(mib / best_wall, 2),
        }
    return out


def sf_scaling_section(spark, runs: int = 2, mult: int = 10) -> dict:
    """Time each gate at the base and 10× dirs; report secs + ratio.

    Reports the MIN over `runs` (noise-robust achievable time). Rows
    also carry the output row count at each scale — linearly-growing
    outputs confirm the fixture's linear-structure construction held.
    """
    scale_dir = ensure_scale_fixture(mult)
    out: dict[str, dict] = {}
    for name, fn in _gates().items():
        row: dict[str, object] = {}
        for tag_, d in (("base", BASE_DIR), ("x10", scale_dir)):
            best, n_rows = float("inf"), -1
            for _ in range(runs):
                t0 = time.monotonic()
                n_rows = fn(spark, d).count()
                best = min(best, time.monotonic() - t0)
                spark.catalog.clearCache()
            row[f"{tag_}_sec"] = round(best, 3)
            row[f"{tag_}_rows"] = n_rows
        row["time_ratio"] = round(row["x10_sec"] / max(row["base_sec"], 1e-9), 2)
        out[name] = row
    return out


def main() -> None:
    import argparse
    import json

    from tutorial_apache_beam_spark import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--streaming-only",
        action="store_true",
        help="run only the stateful-streaming drains",
    )
    ap.add_argument(
        "--streaming-100x",
        action="store_true",
        help="run ONLY the one-off 100x streaming state measurement",
    )
    ap.add_argument(
        "gates",
        nargs="*",
        help="with --streaming-100x: gate names to measure "
        "(default: demo2_append + discarding_panes)",
    )
    args = ap.parse_args()
    if args.gates and not args.streaming_100x:
        ap.error("gate names are only meaningful with --streaming-100x")
    if args.gates:
        # Validate BEFORE spending minutes generating the 100x fixture:
        # a typo'd gate name should fail instantly with the valid set.
        # "<gate>_split" variants run the same drain under
        # single_file_scan_scope (see streaming_100x_section).
        valid = set(_streaming_gates())
        unknown = [
            g for g in args.gates if g.removesuffix("_split") not in valid
        ]
        if unknown:
            ap.error(f"unknown gates {unknown}; valid: {sorted(valid)}")
    spark = get_spark(app_name="scale_stress")
    result = {}
    if args.streaming_100x:
        kw = {"names": tuple(args.gates)} if args.gates else {}
        print(json.dumps(streaming_100x_section(spark, runs=args.runs, **kw)))
        return
    if not args.streaming_only:
        result.update(sf_scaling_section(spark, runs=args.runs))
    result.update(streaming_scaling_section(spark, runs=args.runs))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
