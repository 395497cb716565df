"""Measured-shuffle audit: per-gate shuffle/input/spill BYTES at runtime.

`tools/plan_audit.py` counts exchanges STATICALLY; this tool grounds those
counts with what actually moves: for every batch gate it executes the query
once at $SPARK_GRAFT_TEST_SF_DIR and attributes the delta in stage-level
metrics (Spark monitoring REST API, /api/v1/applications/<id>/stages):

- shuffle_write_mb — bytes written to shuffle (each byte here crosses the
  network once at cluster scale; THE number a 100x scale-up multiplies);
- input_mb — bytes read from the source scans (pruning/pushdown check:
  this should track the projected columns, not the table width);
- spill_disk_mb / spill_mem_mb — spill written to disk / cumulative
  deserialized size at spill time (must be 0 at fixture scale; any
  nonzero means a partition already outgrew its task at sf0.1);
- tasks — total tasks launched (fixed overhead proxy).

Usage: python tools/shuffle_audit.py > SHUFFLE.md

The UI/REST server is disabled in engine sessions (session.py) for test
speed, so this tool builds its own session with it enabled on a fixed
port. Stage metrics are cumulative per (stageId, attemptId); attribution
works by snapshotting seen stage-attempts before each gate and summing
only new ones after it — concurrent queries would confound that, so gates
run strictly serially here.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4049"))

# Same exclusion (and reason) as plan_audit: streaming/sink gate builders
# drain live queries whose work would be mis-attributed here.
SKIP_FAMILIES = {"streaming", "sinks"}


def _stages(base: str) -> dict[tuple[int, int], dict]:
    with urllib.request.urlopen(f"{base}/stages?status=complete", timeout=10) as r:
        data = json.load(r)
    return {(s["stageId"], s["attemptId"]): s for s in data}


def _mb(n: float) -> float:
    return round(n / (1024 * 1024), 2)


def audit(spark, base: str, only: set[str] | None = None) -> list[dict]:
    from bench import _family_of
    from tutorial_apache_beam_spark import registry

    rows = []
    for name, fn in sorted(registry.queries().items()):
        fam = _family_of(name)
        if only is not None:
            if name not in only:
                continue
        elif fam in SKIP_FAMILIES:
            continue
        before = set(_stages(base))
        fn(spark, SF_DIR).count()
        spark.catalog.clearCache()  # gates may persist; release like bench
        after = _stages(base)
        new = [s for k, s in after.items() if k not in before]
        rows.append(
            {
                "gate": name,
                "family": fam,
                "shuffle_write_mb": _mb(
                    sum(s.get("shuffleWriteBytes", 0) for s in new)
                ),
                "input_mb": _mb(sum(s.get("inputBytes", 0) for s in new)),
                # memory spill counts the DESERIALIZED size at each spill
                # event (inflated, often 10-20x disk); disk spill is the
                # honest bytes-written number. Report both.
                "spill_mem_mb": _mb(
                    sum(s.get("memoryBytesSpilled", 0) for s in new)
                ),
                "spill_disk_mb": _mb(
                    sum(s.get("diskBytesSpilled", 0) for s in new)
                ),
                "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
                "stages": len(new),
            }
        )
    return rows


def main() -> None:
    import argparse

    from tutorial_apache_beam_spark import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "gates", nargs="*",
        help="audit only these gates (default: every batch gate)",
    )
    ap.add_argument(
        "--section", default=None,
        help="emit a '## <section>' markdown fragment (for appending to "
        "SHUFFLE.md) instead of the full document header",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="shuffle_audit",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            # Keep every completed stage visible for the whole run — the
            # default retention (1000) could evict early gates' stages
            # mid-audit and silently under-count them.
            "spark.ui.retainedStages": "100000",
        },
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
    rows = audit(spark, base, only=set(args.gates) or None)
    cols = [
        "gate", "family", "shuffle_write_mb", "input_mb",
        "spill_disk_mb", "spill_mem_mb", "tasks", "stages",
    ]
    if args.section:
        print(f"## {args.section}")
        print()
        print(f"Same metrics at `{SF_DIR}`.")
    else:
        print("# SHUFFLE — measured per-gate data movement (generated)")
        print()
        print(
            f"Stage-metric deltas per batch gate at `{SF_DIR}` via the "
            "Spark monitoring REST API — regenerate with `python "
            "tools/shuffle_audit.py > SHUFFLE.md`. shuffle_write_mb is the "
            "byte count a cluster run moves across the network (the 100x "
            "multiplier target); input_mb checks pruning reached the "
            "scans; spill must be 0 at fixture scale. Streaming/sink "
            "gates are excluded for the same attribution reason as "
            "PLANS.md."
        )
    print()
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    print()
    print(
        f"Totals: {len(rows)} gates, "
        f"{round(sum(r['shuffle_write_mb'] for r in rows), 1)} MB shuffled, "
        f"{round(sum(r['input_mb'] for r in rows), 1)} MB scanned, "
        f"{round(sum(r['spill_disk_mb'] for r in rows), 1)} MB disk-spilled."
    )


if __name__ == "__main__":
    main()
