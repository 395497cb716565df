"""Scale evidence for the distributed avro fallback READ (VERDICT r8 #1).

Before r9 the reader materialized every row in the PYTHON DRIVER
process (files → rows list → createDataFrame): a multi-GB avro drop
became tens of GB of Python tuple objects in one process. The r9
reader decodes on executors, so the claim to evidence is: driver-RSS
stays FLAT while reading + aggregating a tree whose row
materialization would dwarf it.

Method: write a ~GB-scale tree with the fallback's own distributed
writer (one container per partition), then run count+sum over
read_avro_fallback while a thread samples the Python driver's VmRSS at
50 Hz. Report peak RSS delta vs tree size and decode throughput. In
local mode the JVM holds executors too, so JVM RSS is not the bound to
watch — the python driver process is where the old path materialized.

Usage: python tools/avro_scale_probe.py [rows_per_file n_files] [--nested]
Prints one JSON line. --nested (r10) swaps the payload for one with an
array, a map, and a nested struct per row — evidence that the nested
decode path keeps the same distributed shape (flat driver RSS) as the
flat one, verified by an aggregate over values INSIDE the composites.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _vm_rss_mib() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class RssSampler:
    def __init__(self):
        self.peak = _vm_rss_mib()
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _vm_rss_mib())
            time.sleep(0.02)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join()


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--nested"]
    nested = "--nested" in sys.argv[1:]
    rows_per_file = int(args[0]) if args else 1_500_000
    n_files = int(args[1]) if len(args) > 1 else 32

    from pyspark.sql import functions as F

    from tutorial_apache_beam_spark import get_spark
    from tutorial_apache_beam_spark.sources.avro_fallback import (
        read_avro_fallback,
        write_avro_fallback,
    )

    spark = get_spark(app_name="avro_scale_probe")
    total_rows = rows_per_file * n_files
    out = "/tmp/avro_scale_probe.avro"
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.monotonic()
    if nested:
        # Each row carries an array (3 longs), a map (1 entry), and a
        # nested struct — sums over the composite INTERIORS verify the
        # decode, not just row counts.
        df = (
            spark.range(total_rows)
            .select(
                "id",
                F.array(
                    F.col("id"), F.col("id") + 1, F.col("id") % 7
                ).alias("xs"),
                F.create_map(
                    F.concat(F.lit("k"), (F.col("id") % 13).cast("string")),
                    F.col("id") % 101,
                ).alias("m"),
                F.struct(
                    (F.col("id") % 1000).alias("a"),
                    F.concat(F.lit("u-"), (F.col("id") % 997).cast("string"))
                    .alias("b"),
                ).alias("meta"),
            )
            .repartition(n_files)
        )
    else:
        df = (
            spark.range(total_rows)
            .select(
                "id",
                F.concat(F.lit("user-"), (F.col("id") % 9973).cast("string"))
                .alias("name"),
                (F.col("id") * 0.25).alias("score"),
            )
            .repartition(n_files)
        )
    write_avro_fallback(df, out, codec="null")
    write_s = time.monotonic() - t0
    tree_bytes = sum(
        os.path.getsize(os.path.join(dp, n))
        for dp, _, ns in os.walk(out)
        for n in ns
    )

    rss_before = _vm_rss_mib()
    t1 = time.monotonic()
    with RssSampler() as s:
        back = read_avro_fallback(spark, out)
        if nested:
            agg = back.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.aggregate(
                        "xs", F.lit(0).cast("long"), lambda acc, x: acc + x
                    )
                ).alias("sx"),
                F.sum(F.col("meta.a")).alias("sa"),
            ).collect()[0]
        else:
            agg = back.agg(
                F.count("*").alias("n"), F.sum("id").alias("s")
            ).collect()[0]
    read_s = time.monotonic() - t1
    if nested:
        tri = total_rows * (total_rows - 1) // 2
        want_sx = 2 * tri + total_rows + sum(
            i % 7 for i in range(min(total_rows, 7))
        ) * (total_rows // 7) + sum(i % 7 for i in range(total_rows % 7))
        want_sa = sum(i % 1000 for i in range(1000)) * (
            total_rows // 1000
        ) + sum(i % 1000 for i in range(total_rows % 1000))
        ok = (
            agg["n"] == total_rows
            and agg["sx"] == want_sx
            and agg["sa"] == want_sa
        )
    else:
        ok = (
            agg["n"] == total_rows
            and agg["s"] == total_rows * (total_rows - 1) // 2
        )

    print(json.dumps({
        "payload": "nested" if nested else "flat",
        "rows": total_rows,
        "files": n_files,
        "tree_mib": round(tree_bytes / 2**20, 1),
        "write_s": round(write_s, 1),
        "read_agg_s": round(read_s, 1),
        "read_mib_per_s": round(tree_bytes / 2**20 / read_s, 1),
        "driver_rss_before_mib": round(rss_before, 1),
        "driver_rss_peak_mib": round(s.peak, 1),
        "driver_rss_delta_mib": round(s.peak - rss_before, 1),
        "correct": ok,
    }))
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
