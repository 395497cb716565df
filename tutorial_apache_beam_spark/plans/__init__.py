"""Beam-equivalent pipeline-construction API (thin plan-building layer).

`pipeline` exposes Pipeline / PCollection / PTransform mirrors of the
reference's Beam surface (Pipeline.create + .apply chains, ParDo,
WithTimestamps, Window.into, Count.perKey) that compile to lazy Spark
DataFrame plans — Catalyst does all optimization.
"""

from tutorial_apache_beam_spark.plans.pipeline import (
    Count,
    Create,
    Distinct,
    Filter,
    FixedWindows,
    Flatten,
    MapElements,
    Mean,
    ParDo,
    PCollection,
    Pipeline,
    Sessions,
    SlidingWindows,
    Sum,
    WindowInto,
    WithTimestamps,
)

__all__ = [
    "Count",
    "Create",
    "Distinct",
    "Filter",
    "FixedWindows",
    "Flatten",
    "MapElements",
    "Mean",
    "ParDo",
    "PCollection",
    "Pipeline",
    "Sessions",
    "SlidingWindows",
    "Sum",
    "WindowInto",
    "WithTimestamps",
]
