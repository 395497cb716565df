"""Custom stateful streaming operators (applyInPandasWithState).

`discarding_pane_counts` reproduces Beam's `discardingFiredPanes()`
semantics bit-exactly (reference Demo2.java:157, SURVEY W5) — the one
behavior Spark's output modes don't express:

- Beam discarding mode: each firing of a (key, window) pane emits only the
  delta accumulated since the previous firing.
- Spark `update` mode: re-emits the accumulated total per trigger.

Here each micro-batch's new rows for a (window, key) group ARE the pane
content, so the per-trigger emission is the batch-local count, with a
monotonically increasing `pane_index` carried in the state store (Beam's
PaneInfo.index analog). Summing a key's panes reproduces the accumulated
count — the invariant the tests assert.

Scale notes: state per (window, key) is a single int; the state store
(HDFS/RocksDB-backed at cluster scale) shards by the grouping key exactly
like the built-in streaming aggregation, and state is dropped on event-time
timeout once the watermark passes the window end.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "window_start TIMESTAMP, user_id BIGINT, pane_count BIGINT, pane_index INT"
)
STATE_SCHEMA = "pane_index INT"


def _duration_ms(duration: str) -> int:
    """Parse a Spark interval string like '1 minute' / '30 seconds' to ms."""
    qty, unit = duration.split()
    unit_ms = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(qty) * unit_ms


def _make_emit_pane(window_ms: int):
    """Build the keyed pane emitter with the window length baked in (the
    state function only sees the key's window START; the timeout must be
    armed at the window END so state survives exactly as long as on-time
    data can still arrive)."""

    def _emit_pane(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Watermark passed the window end: drop the per-key state.
            state.remove()
            return
        n = sum(len(b) for b in batches)
        if n == 0:
            return
        (pane_index,) = state.get if state.exists else (0,)
        window_start, user_id = key
        yield pd.DataFrame(
            {
                "window_start": [window_start],
                "user_id": [user_id],
                "pane_count": [n],
                "pane_index": [pane_index],
            }
        )
        state.update((pane_index + 1,))
        # Arm the event-time timer: fire once the watermark passes the
        # window end, so expired (window, key) state is removed instead of
        # accumulating forever. Spark requires the timestamp to be beyond
        # the current watermark; a pane firing implies its rows passed the
        # watermark filter, but clamp defensively anyway.
        end_ms = pd.Timestamp(window_start).value // 1_000_000 + window_ms
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))

    return _emit_pane


def discarding_pane_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """Per-(window, key) click counts with Beam discarding-pane firings.

    Input: a streaming DataFrame with an event-time column. Output: one row
    per (window, key, firing) whose `pane_count` is the delta since the
    previous firing and `pane_index` counts firings — Beam's
    `.discardingFiredPanes()` + `Count.perKey()` on a 1-minute fixed
    window, expressed as a keyed state-store operator.
    """
    # The watermark must ride on a column that survives the projection, so
    # it is declared on the derived window_start (event-time truncated to
    # the window) rather than the raw timestamp.
    bucketed = (
        events.withColumn(
            "window_start", F.window(F.col(ts_col), window_duration).start
        )
        .withWatermark("window_start", watermark_delay)
        .select("window_start", key_col)
    )
    return bucketed.groupBy("window_start", key_col).applyInPandasWithState(
        _make_emit_pane(_duration_ms(window_duration)),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
