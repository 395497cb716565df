"""Engine benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {name: sec}, "sf": ...}

The headline metric is total wall-clock over the headline set. A second
derived figure, demo2 streaming throughput in MiB/s, is included under
"extra" — BASELINE.md's only quantitative bar is the reference's 4 MiB/s
provisioned source capacity on the Demo2-equivalent aggregation.

Usage: python bench.py            (defaults: sf0.1, local[$SPARK_GRAFT_CPUS])
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tutorial_apache_beam_spark import get_spark, registry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative of every operator family: streaming-equivalent windowed
# agg (the reference's flagship), heavy scan+agg, star join, analytic
# window, near-dup LSH, vector search, text stats, real streaming.
HEADLINE = [
    "demo2_tumbling_counts",
    "q1_pricing_summary",
    "star_join_revenue_by_nation",
    "top_orders_per_customer",
    "minhash_lsh_near_dups",
    "cosine_topk_bruteforce",
    "embedding_cosine_near_dups",
    "text_stats_quality",
    "training_data_pipeline",
    "streaming_demo2_counts",
    "streaming_interval_join",
]


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    queries = registry.queries()

    # Warm the JVM + file listing with a trivial action so the first timed
    # query doesn't absorb session startup.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    names = sorted(queries) if "--all" in sys.argv else HEADLINE
    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        t0 = time.monotonic()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)

    # Demo2-equivalent streaming throughput (MiB/s of source bytes drained).
    events_bytes = os.path.getsize(f"{SF_DIR}/events.parquet")
    stream_sec = timings["streaming_demo2_counts"]
    mib_per_s = round(events_bytes / (1024 * 1024) / stream_sec, 2)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "demo2_stream_mib_per_s": mib_per_s,
                    "events_parquet_mib": round(events_bytes / (1024 * 1024), 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
