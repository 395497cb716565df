"""Differential test: the pane operators' interval parser vs live
Spark's F.window grammar (VERDICT r8 #8 — promote the
differential-vs-live-Spark pattern to the remaining transcription
surfaces).

`streaming.stateful._duration_ms` re-implements the duration grammar
that `F.window` accepts, because the pane operators need the window
length in MILLISECONDS python-side (state pruning + idle-key timers)
while the plan passes the same string to F.window. If the two layers
disagree on what's VALID, a plan-time string crashes one layer but not
the other; if they disagree on the VALUE, pane state prunes at the
wrong boundary — silently. So both acceptance and value are pinned
against live Spark for every spelling class the grammar has.

Measured live: NO deviations — F.window itself refuses calendar units
('1 month', '1 year': no fixed millisecond length) and fractional
quantities ('1.5 minutes'), exactly like _duration_ms, so the two
layers agree on validity AND value for every spelling class below.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.streaming.stateful import _duration_ms

# (interval string, class) — classes drive the expected-deviation logic.
CASES = [
    ("1 minute", "plain"),
    ("90 seconds", "plain"),
    ("1 minute 30 seconds", "plain"),
    ("1 MINUTE", "plain"),
    ("1 minutes", "plain"),
    ("2 weeks", "plain"),
    ("1 day", "plain"),
    ("500 milliseconds", "plain"),
    ("1 minute -30 seconds", "plain"),     # negative component, positive sum
    ("-30 seconds 1 minute", "plain"),
    ("0 seconds", "nonpositive"),
    ("-1 minute", "nonpositive"),
    ("30 seconds -1 minute", "nonpositive"),
    ("1 month", "calendar"),     # measured: F.window refuses too
    ("1 year", "calendar"),
    ("1.5 minutes", "fractional"),  # measured: F.window refuses too
    ("1min", "garbage"),
    ("minute", "garbage"),
    ("1 lightyear", "garbage"),
    ("", "garbage"),
]


def _spark_window_ms(spark, interval: str):
    """What live Spark does with the string: None if F.window refuses it
    at plan/execution time, else the window length in ms (end - start)."""
    try:
        row = (
            spark.range(1)
            .select(
                F.window(
                    F.timestamp_seconds(F.lit(1_700_000_000)), interval
                ).alias("w")
            )
            .select(
                (
                    F.col("w.end").cast("double")
                    - F.col("w.start").cast("double")
                ).alias("ms")
            )
            .first()
        )
        return int(round(row["ms"] * 1000))
    except Exception:
        return None


@pytest.mark.parametrize("interval,cls", CASES)
def test_duration_ms_agrees_with_f_window(spark, interval, cls):
    try:
        ours = _duration_ms(interval)
    except ValueError:
        ours = None
    theirs = _spark_window_ms(spark, interval)

    # The two layers must agree on validity…
    assert (ours is None) == (theirs is None), (
        f"{interval!r}: _duration_ms={ours} vs F.window={theirs}"
    )
    # …and on the value, or pane state prunes at the wrong boundary.
    if ours is not None:
        assert ours == theirs, f"{interval!r}: {ours} != {theirs}"
