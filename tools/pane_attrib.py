"""Attribute the discarding-panes operator's 10x wall ratio (r7 task 6).

The pane drain's wall tracks KEY COUNT (4.3x at 10x = 15k keys, 34x at
100x = 150k keys) while the Demo2 JVM aggregation over the same source
grows ~2.6x — something per-key in the Python layer dominates. This
splits the wall into three additive layers by draining the SAME 10x
source three ways in one session (min over --runs each):

  jvm_floor      source scan + shuffle + incremental JVM agg (append) —
                 everything BELOW the Python layer
  trivial_state  same keyed shuffle through applyInPandasWithState with
                 a do-nothing function (one tiny state read+write per
                 key, no pane math, near-zero output) — adds the arrow
                 transfer, per-key Python invocation, and state-server
                 round-trips
  full           the real discarding_pane_counts operator — adds the
                 pane-counting emitter and the output transfer back

  emitter cost      = full - trivial_state
  python/state cost = trivial_state - jvm_floor

Pass spark confs as KEY=VALUE args to test a knob in a fresh JVM, e.g.:

    python tools/pane_attrib.py spark.sql.execution.arrow.maxRecordsPerBatch=100000

Findings recorded in SCALING.md "Pane operator wall, attributed".
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", os.path.join(REPO, ".scaledata", "sf1")
)


def _variants():
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from tutorial_apache_beam_spark.streaming.replay import stream_events
    from tutorial_apache_beam_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        discarding_pane_counts,
    )

    def _bucketed(spark):
        sdf = stream_events(spark, FIXTURE)
        return (
            sdf.withColumn(
                "window_start", F.window(F.col("ts"), "1 minute").start
            )
            .withWatermark("window_start", "2 minutes")
            .select("window_start", "user_id")
        )

    def jvm_floor(spark):
        return (
            _bucketed(spark).groupBy("window_start", "user_id").count(),
            "append",
        )

    def trivial_state(spark):
        def _noop(key, pdfs, state):
            n = 0
            for pdf in pdfs:
                n += len(pdf)
            state.update(([0], [n]))
            # OUTPUT_SCHEMA is a DDL string; emit an empty frame with
            # its column names so the arrow return path stays exercised
            # at zero rows.
            cols = [c.split()[0] for c in OUTPUT_SCHEMA.split(",")]
            yield pd.DataFrame(columns=cols)

        return (
            _bucketed(spark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _noop,
                OUTPUT_SCHEMA,
                STATE_SCHEMA,
                "append",
                GroupStateTimeout.EventTimeTimeout,
            ),
            "append",
        )

    def full(spark):
        sdf = stream_events(spark, FIXTURE)
        return (
            discarding_pane_counts(
                sdf, ts_col="ts", key_col="user_id",
                window_duration="1 minute",
            ),
            "append",
        )

    def full_no_output(spark):
        # The real emitter, its result truncated to 0 rows before the
        # arrow return: isolates pane-math compute from output transfer.
        from tutorial_apache_beam_spark.streaming.stateful import (
            _make_emit_pane,
        )

        real = _make_emit_pane(60_000)

        def _truncated(key, pdfs, state):
            for out in real(key, pdfs, state):
                yield out.iloc[0:0]

        return (
            _bucketed(spark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _truncated,
                OUTPUT_SCHEMA,
                STATE_SCHEMA,
                "append",
                GroupStateTimeout.EventTimeTimeout,
            ),
            "append",
        )

    return {
        "jvm_floor": jvm_floor,
        "trivial_state": trivial_state,
        "full_no_output": full_no_output,
        "full": full,
    }


def main() -> None:
    # ADVICE r8: a typo'd conf token without '=' used to be silently
    # dropped, attributing the run to the default config — refuse it.
    bad = [a for a in sys.argv[1:] if "=" not in a]
    if bad:
        raise SystemExit(
            f"conf args must be KEY=VALUE; got {bad!r}"
        )
    conf = dict(a.split("=", 1) for a in sys.argv[1:])
    runs = int(os.environ.get("PANE_ATTRIB_RUNS", "2"))
    from tools.scale_stress import _drain_with_state_metrics

    from tutorial_apache_beam_spark import get_spark

    spark = get_spark(app_name="pane_attrib", extra_conf=conf)
    out: dict[str, dict] = {"conf": conf, "fixture": FIXTURE}
    for name, build in _variants().items():
        best, best_rows, best_state = float("inf"), -1, 0
        for _ in range(runs):
            sdf, mode = build(spark)
            wall, rows, state_rows = _drain_with_state_metrics(
                spark, sdf, mode
            )
            if wall < best:
                # keep rows/state from the SAME drain as the reported
                # wall — pairing the min wall with the last drain's
                # counts could attribute one run's state to another's
                # time
                best, best_rows, best_state = wall, rows, state_rows
        out[name] = {
            "sec": round(best, 3),
            "rows": best_rows,
            "state_rows": best_state,
        }
    out["python_state_layer_sec"] = round(
        out["trivial_state"]["sec"] - out["jvm_floor"]["sec"], 3
    )
    out["emitter_compute_sec"] = round(
        out["full_no_output"]["sec"] - out["trivial_state"]["sec"], 3
    )
    out["output_transfer_sec"] = round(
        out["full"]["sec"] - out["full_no_output"]["sec"], 3
    )
    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
