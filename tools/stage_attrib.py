"""Per-STAGE metric attribution for one gate (r7 tasks 1+3).

Like tools/spill_probe.py but prints every new stage's name + bytes, so
a spill or a shuffle blow-up can be pinned to the exact plan stage.

    SPARK_GRAFT_TEST_SF_DIR=.scaledata/sf10 python tools/stage_attrib.py \
        lexical_neardup_pairs [spark.conf.key=value ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.shuffle_audit import SF_DIR, UI_PORT, _mb, _stages  # noqa: E402


def main() -> None:
    gates = [a for a in sys.argv[1:] if "=" not in a]
    conf = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    from tutorial_apache_beam_spark import get_spark, registry

    spark = get_spark(
        app_name="stage_attrib",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "100000",
            **conf,
        },
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
    for name in gates:
        fn = registry.queries()[name]
        before = set(_stages(base))
        t0 = time.time()
        fn(spark, SF_DIR).count()
        wall = round(time.time() - t0, 1)
        spark.catalog.clearCache()
        new = [
            (k, s) for k, s in _stages(base).items() if k not in before
        ]
        new.sort()
        print(f"## {name}  wall={wall}s  conf={conf}")
        for (sid, att), s in new:
            print(json.dumps({
                "stage": sid,
                "name": s.get("name", "")[:80],
                "tasks": s.get("numCompleteTasks"),
                "input_mb": _mb(s.get("inputBytes", 0)),
                "sh_read_mb": _mb(s.get("shuffleReadBytes", 0)),
                "sh_write_mb": _mb(s.get("shuffleWriteBytes", 0)),
                "spill_disk_mb": _mb(s.get("diskBytesSpilled", 0)),
                "exec_run_s": round(s.get("executorRunTime", 0) / 1000, 1),
            }))


if __name__ == "__main__":
    main()
