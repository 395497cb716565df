"""Event-time windowed aggregation (the heart of reference Demo2).

Reference semantics covered (citations into /root/reference):
- Fixed 1-minute tumbling windows: `Window.into(FixedWindows.of(1m))`
  (Demo2.java:149-152) → `F.window(ts, "1 minute")`.
- Count per key per window: `Count.perKey()` (Demo2.java:158-160)
  → `groupBy(window, key).count()`.
- Sliding and session windows are Beam built-ins the reference could call
  (SlidingWindows / Sessions), exposed here for API parity.

These helpers work identically on batch and streaming DataFrames — Spark's
unified model mirrors Beam's: the streaming plan is the same logical plan
run incrementally.

Scale notes: `groupBy(window(...), key)` is a hash aggregation with
map-side partial aggregation, so the shuffle carries one row per
(key, window) per map task, not per event. No collect, no UDFs — the whole
plan is whole-stage-codegen'd JVM code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten_window(
    df: DataFrame, keys: list[str], struct_col: str = "window"
) -> DataFrame:
    """Replace the struct window column with window_start/window_end."""
    cols = [
        F.col(f"{struct_col}.start").alias("window_start"),
        F.col(f"{struct_col}.end").alias("window_end"),
        *keys,
    ]
    rest = [c for c in df.columns if c not in (struct_col, *keys)]
    return df.select(*cols, *rest)


def tumbling_counts(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    duration: str = "1 minute",
) -> DataFrame:
    """Clicks-per-key-per-window — the Demo2 aggregation, batch or stream.

    Output: (window_start, window_end, *key_cols, count).
    """
    agg = df.groupBy(F.window(F.col(ts_col), duration), *key_cols).agg(
        F.count(F.lit(1)).alias("count")
    )
    return _flatten_window(agg, key_cols)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    duration: str,
    slide: str,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in duration/slide windows."""
    aggs = aggs or [F.count(F.lit(1)).alias("count")]
    agg = df.groupBy(F.window(F.col(ts_col), duration, slide), *key_cols).agg(*aggs)
    return _flatten_window(agg, key_cols)


def session_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows: events within `gap` of each other merge into one
    session per key. Uses `F.session_window` (native, stateful in
    streaming)."""
    aggs = aggs or [F.count(F.lit(1)).alias("count")]
    agg = df.groupBy(F.session_window(F.col(ts_col), gap), *key_cols).agg(*aggs)
    return _flatten_window(agg, key_cols, struct_col="session_window").withColumnsRenamed(
        {"window_start": "session_start", "window_end": "session_end"}
    )
