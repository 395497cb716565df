"""One-off AQE-config probe for the 100x join-expansion spill (r7 task 1).

Runs a single gate at $SPARK_GRAFT_TEST_SF_DIR under a config variant
given as KEY=VALUE args, printing the same stage-delta metrics as
shuffle_audit. Each variant needs a fresh JVM (AQE confs are read at
execution, but comparing variants in one session confounds caches), so
run this once per variant:

    SPARK_GRAFT_TEST_SF_DIR=.scaledata/sf10 python tools/spill_probe.py \
        lexical_neardup_pairs spark.sql.adaptive.advisoryPartitionSizeInBytes=24m
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.shuffle_audit import UI_PORT, audit  # noqa: E402


def main() -> None:
    gates = [a for a in sys.argv[1:] if "=" not in a]
    conf = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    from tutorial_apache_beam_spark import get_spark

    spark = get_spark(
        app_name="spill_probe",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.ui.retainedStages": "100000",
            **conf,
        },
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}"
    t0 = time.time()
    rows = audit(spark, base, only=set(gates))
    print(json.dumps({
        "conf": conf,
        "wall_s": round(time.time() - t0, 1),
        "loadavg_start": os.getloadavg()[0],
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
