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
    }


def ensure_scale_fixture(mult: int = 10) -> str:
    """Generate the 10× fixture if absent (deterministic, ~10 s)."""
    if not (
        os.path.exists(f"{SCALE_DIR}/documents.parquet")
        and os.path.exists(f"{SCALE_DIR}/embeddings.parquet")
    ):
        from tools.gen_scale_fixture import generate

        generate(BASE_DIR, SCALE_DIR, mult)
    return SCALE_DIR


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
    args = ap.parse_args()
    spark = get_spark(app_name="scale_stress")
    print(json.dumps(sf_scaling_section(spark, runs=args.runs), indent=2))


if __name__ == "__main__":
    main()
