"""Structured Streaming execution of the engine's plans.

`demos` contains the reference-parity streaming programs (Demo1/Demo2)
written against the Beam-equivalent API in `plans.pipeline`; `replay`
drives deterministic file-source replays for tests and the correctness
gate.
"""

from tutorial_apache_beam_spark.streaming.demos import (
    demo1_pipeline,
    demo2_pipeline,
)
from tutorial_apache_beam_spark.streaming.replay import (
    run_stream_to_memory,
)

__all__ = ["demo1_pipeline", "demo2_pipeline", "run_stream_to_memory"]
