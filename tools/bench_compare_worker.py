"""One side of a paired A/B bench: host a tree's engine in its own JVM.

Spawned by tools/bench_compare.py with the tree root as argv[1]. Reads
gate names on stdin (one per line), times
`queries()[name](spark, sf_dir).count()` exactly like bench.py's run()
loop (cleanup between runs, outside the timed window), and prints one
JSON line per gate. The protocol is the driver contract surface
(`__spark_entry__.queries()`), which is stable across rounds — so any
ref checkout since r2 can be hosted unmodified.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2]
    os.chdir(tree)
    # The tree's own package must win every import; this script's dir
    # (HEAD's tools/) holds no engine package, so position 0 is enough.
    sys.path.insert(0, tree)

    import __spark_entry__ as entry
    from tutorial_apache_beam_spark import get_spark

    spark = get_spark(app_name=f"bench_cmp_{os.path.basename(tree)}")
    queries = entry.queries()

    def cleanup() -> None:
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.name.startswith("replay_"):
                spark.catalog.dropTempView(t.name)

    print(json.dumps({"ready": True, "gates": sorted(queries)}), flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name or name == "EXIT":
            break
        try:
            fn = queries[name]
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            cleanup()
            print(json.dumps({"name": name, "s": round(dt, 3)}), flush=True)
        except Exception as exc:  # noqa: BLE001 - reported to parent
            print(
                json.dumps(
                    {"name": name,
                     "err": f"{type(exc).__name__}: {exc}"[:300]}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
