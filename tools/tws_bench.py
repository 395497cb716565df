"""Throughput comparison of the two stateful-API pane operators.

Replays the same synthetic click stream (one availableNow drain, file
source, parquet sink) through `streaming.stateful.discarding_pane_counts`
(state v1, applyInPandasWithState) and `streaming.tws.tws_pane_counts`
(state v2, transformWithStateInPandas + RocksDB + the protoshim wire
protocol), and prints events/s for each. Results feed the "which API at
scale" note in SCALING.md.

Usage: python tools/tws_bench.py [--events 200000] [--users 500]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
BASE_EPOCH = 1704067200


def _gen_source(src_dir: str, n_events: int, n_users: int, n_files: int = 4):
    per = n_events // n_files
    for f in range(n_files):
        with open(os.path.join(src_dir, f"b{f}.json"), "w") as fh:
            for i in range(per):
                e = f * per + i
                fh.write(
                    json.dumps(
                        {
                            # ~6 windows of data, out-of-order within files
                            "event_time": BASE_EPOCH + (e * 7919) % 360,
                            "user_id": e % n_users,
                        }
                    )
                    + "\n"
                )


def _drain(spark, op, src, work):
    from pyspark.sql import functions as F

    ckpt, sink = os.path.join(work, "ck"), os.path.join(work, "out")
    stream = (
        spark.readStream.schema("event_time BIGINT, user_id BIGINT")
        .json(src)
        .select(F.timestamp_seconds("event_time").alias("ts"), "user_id")
    )
    q = (
        op(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(sink).count()


def tws_vs_v1_section(
    spark,
    events: int = 200_000,
    users: int = 500,
    warmup: bool = True,
    runs: int = 1,
) -> dict:
    """Time the same pane drain through both stateful APIs; importable by
    bench.py (BENCH extra `tws_vs_v1`, VERDICT r4 item 4) so the
    `demo2.py --stateful-api` default stays data-driven round to round.

    `warmup` (r6): each API first runs an untimed 1/10-size drain, so
    the timed numbers compare steady state. Without it the FIRST v2
    drain of a session absorbs one-time RocksDB provider + state-server
    setup (observed +10 s on a 6 s drain) and the first v1 drain absorbs
    pandas-UDF JIT — whichever API runs first eats its setup inside the
    timed window, exactly the comparison noise the key-count curve
    exists to avoid.

    `runs` (r6): min over N timed drains (fresh checkpoint/sink each),
    same policy as the bench sweep and scale sections — single-sample
    curve points proved as outlier-prone as the scale ratios were."""
    from tutorial_apache_beam_spark.streaming.stateful import (
        discarding_pane_counts,
    )
    from tutorial_apache_beam_spark.streaming.tws import tws_pane_counts

    work_root = tempfile.mkdtemp(prefix="tws_bench_")
    src = os.path.join(work_root, "src")
    os.makedirs(src)
    _gen_source(src, events, users)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    results: dict = {"events": events, "users": users}
    try:
        for name, op, rocksdb in (
            ("v1_applyInPandasWithState", discarding_pane_counts, False),
            ("v2_transformWithState", tws_pane_counts, True),
        ):
            old = spark.conf.get(provider_key, None)
            if rocksdb:
                spark.conf.set(provider_key, ROCKSDB)
            work = os.path.join(work_root, name)
            os.makedirs(work)
            try:
                if warmup:
                    wsrc = os.path.join(work, "warm_src")
                    wwork = os.path.join(work, "warm_run")
                    os.makedirs(wsrc)
                    os.makedirs(wwork)
                    _gen_source(wsrc, max(events // 10, 1000), users)
                    _drain(spark, op, wsrc, wwork)
                dt, rows = float("inf"), -1
                for r_i in range(max(runs, 1)):
                    run_dir = os.path.join(work, f"run{r_i}")
                    os.makedirs(run_dir)
                    t0 = time.monotonic()
                    rows = _drain(spark, op, src, run_dir)
                    dt = min(dt, time.monotonic() - t0)
            finally:
                if old is None:
                    spark.conf.unset(provider_key)
                else:
                    spark.conf.set(provider_key, old)
            results[name] = {
                "sec": round(dt, 2),
                "out_rows": rows,
                "events_per_sec": round(events / dt),
            }
    finally:
        shutil.rmtree(work_root, ignore_errors=True)
    return results


def pane_key_scaling_section(
    spark,
    events: int = 200_000,
    key_counts: tuple[int, ...] = (500, 1500, 5000, 15000, 30000),
    base: dict | None = None,
    runs: int = 1,
) -> dict:
    """The pane operators' KEY-COUNT scaling curve (VERDICT r5 item 6):
    fixed event volume, 1x/3x/10x/30x/60x distinct keys, BOTH stateful
    APIs — `streaming_discarding_panes` is the one streaming shape whose
    wall clock tracks key count (per-key Python invocation), so the
    v1-vs-v2 default must be justified by where each API wins on this
    curve, not by a single key count. The 15k/30k points (VERDICT r6
    #5) sit on both sides of the crossover r5 extrapolated to ~10-15k,
    so the `demo2.py --stateful-api` guidance rests on measured data at
    real key counts. `base` lets bench.py reuse its already-measured
    tws_vs_v1 run as the first curve point instead of re-draining it."""
    curve = []
    for users in key_counts:
        r = (
            base
            if base is not None
            and base.get("users") == users
            and base.get("events") == events
            else tws_vs_v1_section(spark, events, users, runs=runs)
        )
        curve.append(
            {
                "users": users,
                "v1_sec": r["v1_applyInPandasWithState"]["sec"],
                "v2_sec": r["v2_transformWithState"]["sec"],
            }
        )
    return {"events": events, "curve": curve}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--users", type=int, default=500)
    ap.add_argument(
        "--key-curve",
        action="store_true",
        help="also time the 1x/3x/10x key-count scaling curve",
    )
    args = ap.parse_args()

    from tutorial_apache_beam_spark import get_spark

    spark = get_spark(app_name="tws_bench")
    base = tws_vs_v1_section(spark, args.events, args.users)
    out = dict(base)
    if args.key_curve:
        out["pane_key_curve"] = pane_key_scaling_section(
            spark, args.events, base=base
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
