"""Beam-equivalent pipeline-construction API (thin plan-building layer).

`pipeline` exposes Pipeline / PCollection / PTransform mirrors of the
reference's Beam surface (Pipeline.create + .apply chains, ParDo,
WithTimestamps, Window.into, Count.perKey) that compile to lazy Spark
DataFrame plans — Catalyst does all optimization.
"""

from tutorial_apache_beam_spark.plans.pipeline import (
    CombinePerKey,
    Count,
    Create,
    Distinct,
    Filter,
    FixedWindows,
    FlatMap,
    Flatten,
    GroupByKey,
    Keys,
    MapElements,
    Mean,
    ParDo,
    Partition,
    PCollection,
    Pipeline,
    Sessions,
    SlidingWindows,
    Sum,
    Values,
    WindowInto,
    WithKeys,
    WithTimestamps,
)

__all__ = [
    "CombinePerKey",
    "Count",
    "Create",
    "Distinct",
    "Filter",
    "FixedWindows",
    "FlatMap",
    "Flatten",
    "GroupByKey",
    "Keys",
    "MapElements",
    "Mean",
    "ParDo",
    "Partition",
    "PCollection",
    "Pipeline",
    "Sessions",
    "SlidingWindows",
    "Sum",
    "Values",
    "WindowInto",
    "WithKeys",
    "WithTimestamps",
]
