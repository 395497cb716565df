#!/usr/bin/env python
"""Demo1-equivalent CLI app: stateless streaming ETL.

Reference parity (Demo1.java:33-107 + Options at :42-50): read JSON click
messages from a source, parse with drop-on-malformed, append typed rows
(event_time, processing_time, user_id, click) to a partitioned table.

The reference parameterizes the pipeline with
`--inputSubscription` / `--outputTable` CLI options
(PipelineOptionsFactory, Demo1.java:103-106); here the same contract is an
argparse surface over a watched directory (Kafka-swappable) and a parquet
table.

    python demo1.py --input /path/to/messages --output /path/to/table \
        --checkpoint /path/to/ckpt [--follow]

--follow keeps the query running for new files (the true streaming mode);
default drains what's available and exits (availableNow).
"""

from __future__ import annotations

import argparse

from tutorial_apache_beam_spark import get_spark
from tutorial_apache_beam_spark.streaming.demos import demo1_pipeline


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="watched source directory")
    ap.add_argument("--output", required=True, help="output parquet table path")
    ap.add_argument("--checkpoint", required=True, help="checkpoint location")
    ap.add_argument(
        "--follow",
        action="store_true",
        help="run continuously instead of draining available input",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="demo1")
    result = demo1_pipeline(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        available_now=not args.follow,
    )
    result.wait_until_finish()


if __name__ == "__main__":
    main()
