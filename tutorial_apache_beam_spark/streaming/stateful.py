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

Scale / performance design — state is keyed by USER, not (window, user):
applyInPandasWithState pays a per-group Python invocation (~0.3 ms), so
grouping by (window, key) means one call per window-key pair — measured
66x more groups than users on the fixture (99,921 vs 1,500 at sf0.1) and
a 53 s drain. Keying by user alone holds the open windows' pane indexes
in two parallel array columns, cutting invocations to one per user per
micro-batch. Expired windows (end below the current watermark) are pruned
inline on every call, and ONE event-time timer per user (re-armed at the
newest window end) removes the whole entry when the user goes idle — so
state stays bounded on unbounded streams without per-window timers. The
state store shards by user exactly like the built-in streaming
aggregation (HDFS/RocksDB-backed at cluster scale).
"""

from __future__ import annotations

import warnings
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "window_start TIMESTAMP, user_id BIGINT, pane_count BIGINT, pane_index INT"
)
# Open windows for this key: window starts (epoch ms) + next pane index.
STATE_SCHEMA = "win_ms ARRAY<BIGINT>, pane_idx ARRAY<INT>"


def _duration_ms(duration: str, allow_zero: bool = False) -> int:
    """Parse a Spark interval string to milliseconds — the same grammar
    `F.window` accepts for the calendar-free units: one or more
    '<n> <unit>' pairs ('1 minute 30 seconds'), case-insensitive,
    singular or plural, weeks included. The two consumers of a window
    string (F.window and this parser) must agree on what's valid, or a
    plan-time string crashes one layer but not the other.

    Validity is judged on the signed TOTAL, matching F.window's grammar
    (which accepts negative components like '1 minute -30 seconds' as
    long as the sum is positive — per-component rejection here would be
    exactly the one-layer-crashes divergence this docstring warns
    about): a non-positive total raises, except that `allow_zero`
    permits exactly zero — window durations and state TTLs need a
    strictly positive interval, while watermark components (allowed
    skew / lateness) legitimately accept '0 seconds'."""
    unit_ms = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
        "week": 604_800_000,
    }
    tokens = duration.split()
    if not tokens or len(tokens) % 2:
        raise ValueError(f"cannot parse interval string {duration!r}")
    total = 0
    for qty, unit in zip(tokens[::2], tokens[1::2]):
        key = unit.lower().rstrip("s")
        if key not in unit_ms:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {duration!r}"
            )
        total += int(qty) * unit_ms[key]
    if total < 0 or (total == 0 and not allow_zero):
        # Match F.window's rejection of non-positive intervals: a
        # negative or 0-ms window/TTL would silently break pane math and
        # state expiry downstream — fail loudly at plan time instead.
        # (allow_zero admits exactly zero for watermark components,
        # never a negative total.)
        raise ValueError(
            f"interval {duration!r} must be strictly positive"
        )
    return total


def _require_utc_session(df: DataFrame, operator: str) -> None:
    """The pane operators derive window epoch-ms from pandas timestamps,
    which Arrow delivers SESSION-TIMEZONE-naive, and compare them to the
    watermark (true UTC epoch ms). In a non-UTC session every comparison
    is offset by the zone offset — open windows get pruned as expired and
    pane ordinals silently reset. The engine session pins UTC
    (session.get_spark); refuse to build the plan elsewhere."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz.upper() not in ("UTC", "GMT", "Z", "ETC/UTC"):
        raise ValueError(
            f"{operator} requires spark.sql.session.timeZone=UTC (got "
            f"{tz!r}): pane state compares session-naive pandas "
            "timestamps against the UTC watermark, which is only correct "
            "when the session timezone is UTC"
        )


def _count_panes(
    pdf: pd.DataFrame, open_windows: dict, user_id
) -> pd.DataFrame:
    """Count a micro-batch's rows per window and assign pane indexes —
    the SHARED hot-path body of both pane emitters (this module's
    applyInPandasWithState form and streaming/tws's transformWithState
    twin), which runs once per key per micro-batch.

    Counts on the int64-epoch view with np.unique instead of a pandas
    groupby (~4x less per-call time, measured; np.unique sorts ascending
    exactly like groupby(sort=True)). window_start is already
    minute-truncated, so the ms view is lossless. Two semantics carried
    over from the groupby path it replaced: null window_start rows are
    DROPPED (pandas groupby excludes NaT keys — a null event time has no
    window), and a null grouping key emits null user_id rows (object
    column, like the list-built output before vectorization).

    MUTATES `open_windows` in place: each emitted window's next pane
    index is bumped. Returns the output frame (possibly empty), dtypes
    matching OUTPUT_SCHEMA exactly.
    """
    w_all = pdf["window_start"].to_numpy().astype("datetime64[ms]")
    w_all = w_all[~np.isnat(w_all)]
    uniq_ms, counts = np.unique(w_all.astype("int64"), return_counts=True)
    pane_indexes = np.empty(len(uniq_ms), dtype="int32")
    for j, w_ms in enumerate(uniq_ms.tolist()):
        idx = open_windows.get(w_ms, 0)
        pane_indexes[j] = idx
        open_windows[w_ms] = idx + 1
    n = len(uniq_ms)
    if user_id is None:
        uid = pd.Series([None] * n, dtype="object")
    else:
        uid = np.full(n, user_id, dtype="int64")
    return pd.DataFrame(
        {
            "window_start": uniq_ms.astype("datetime64[ms]").astype(
                "datetime64[ns]"
            ),
            "user_id": uid,
            "pane_count": counts.astype("int64"),
            "pane_index": pane_indexes,
        }
    )


def _make_emit_pane(window_ms: int):
    """Build the per-USER pane emitter with the window length baked in (the
    window end drives both inline pruning and the idle-key timer)."""

    def _emit_pane(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Watermark passed every window this key had open: drop it all.
            state.remove()
            return
        frames = [b for b in batches if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
        (user_id,) = key

        win_ms, pane_idx = state.get if state.exists else ([], [])
        open_windows = dict(zip(win_ms, pane_idx))

        # Inline cleanup: drop windows whose end passed the watermark (their
        # rows can no longer arrive — Spark filters them upstream).
        watermark_ms = state.getCurrentWatermarkMs()
        if watermark_ms:
            open_windows = {
                w: i for w, i in open_windows.items() if w + window_ms > watermark_ms
            }

        yield _count_panes(pdf, open_windows, user_id)

        state.update(
            (list(open_windows.keys()), list(open_windows.values()))
        )
        # One timer per key: fire once the watermark passes the NEWEST open
        # window's end (re-armed every batch). Spark requires a timestamp
        # beyond the current watermark; clamp defensively.
        newest_end = max(open_windows) + window_ms if open_windows else 0
        state.setTimeoutTimestamp(max(newest_end, watermark_ms + 1))

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
    _require_utc_session(events, "discarding_pane_counts")
    # The emitter's state/output schemas pin the key slot to BIGINT
    # (np.full int64 per group): a string key would crash deep inside
    # the executor, so refuse at PLAN time with the remediation (r10
    # review — the Pipeline API now routes arbitrary keys here).
    from pyspark.sql import types as T

    key_type = events.schema[key_col].dataType
    if not isinstance(
        key_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        raise ValueError(
            f"discarding pane operator requires an integral key column "
            f"(state schema pins BIGINT); {key_col!r} is "
            f"{key_type.simpleString()} — use mode='accumulating' or "
            "map the key to an integral id first"
        )
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
    out = bucketed.groupBy(key_col).applyInPandasWithState(
        _make_emit_pane(_duration_ms(window_duration)),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    if key_col != "user_id":
        # Both pane paths emit the CALLER's key name (the accumulating
        # path always has), so mode='auto' cannot change the output
        # schema with the cardinality hint (r10 review).
        out = out.withColumnRenamed("user_id", key_col)
    return out


# Measured pane-path cost model (tools/pane_attrib.py, SCALING.md "Pane
# operator wall, attributed"): the per-group Python API pays ~0.26 ms of
# emitter compute per (key x micro-batch) invocation — pd.concat,
# datetime64 view, np.unique, output-frame construction — and that floor
# is inherent to the API (the body is already vectorized; it cannot be
# batched across keys from user code). The JVM incremental aggregation
# has no such term, which is why it is the 100-TB default when per-pane
# DELTAS aren't required.
PANE_EMITTER_MS_PER_KEY_BATCH = 0.26
# Python-emitter seconds per micro-batch "auto" is willing to buy for
# pane fidelity before switching to the JVM path: 1 s / 0.26 ms ~ 3,800
# keys. Below it the fidelity path's overhead is trigger-interval noise
# (sf0.1's 1,500 users drain in ~3.5 s total); above it the overhead
# compounds every micro-batch (15k keys measured +3.95 s emitter compute
# per drain, 150k keys 34x wall).
AUTO_PANE_BUDGET_S = 1.0
AUTO_KEY_THRESHOLD = int(AUTO_PANE_BUDGET_S * 1000 / PANE_EMITTER_MS_PER_KEY_BATCH)


def _pane_cost_msg(expected_keys: int) -> str:
    est_s = expected_keys * PANE_EMITTER_MS_PER_KEY_BATCH / 1000
    return (
        f"discarding-pane fidelity costs ~{PANE_EMITTER_MS_PER_KEY_BATCH} ms "
        f"of Python emitter compute per key per micro-batch (measured, "
        f"tools/pane_attrib.py): at {expected_keys:,} keys that is "
        f"~{est_s:.1f} s added to EVERY micro-batch. If per-pane deltas + "
        f"firing ordinals aren't required, use mode='accumulating' (JVM "
        f"incremental aggregation, no per-key Python floor)."
    )


def select_pane_impl(mode: str, expected_keys: int | None = None) -> str:
    """Pick the pane implementation: 'discarding' (applyInPandasWithState,
    Beam pane deltas + firing ordinals) or 'accumulating' (JVM incremental
    windowed count, Beam accumulatingFiredPanes under update mode).

    - mode='discarding'/'accumulating': honored verbatim; 'discarding'
      with expected_keys past the budget WARNS with the measured cost
      model rather than silently degrading throughput.
    - mode='auto': semantics-preserving cardinality selector for callers
      who want per-firing rows but not specifically deltas — fidelity
      while it's cheap (expected_keys <= AUTO_KEY_THRESHOLD), the JVM
      path once the per-key Python floor would dominate the drain.
      Without an expected_keys hint auto takes the scale-safe JVM path
      (unbounded streams can't be counted at plan time).
    """
    if mode == "accumulating":
        return "accumulating"
    if mode == "discarding":
        if expected_keys is not None and expected_keys > AUTO_KEY_THRESHOLD:
            warnings.warn(_pane_cost_msg(expected_keys), stacklevel=3)
        return "discarding"
    if mode == "auto":
        if expected_keys is not None and expected_keys <= AUTO_KEY_THRESHOLD:
            return "discarding"
        return "accumulating"
    raise ValueError(
        f"unknown pane mode {mode!r}: expected 'discarding', "
        "'accumulating', or 'auto'"
    )


def accumulating_pane_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """The JVM fast path of the pane selector: incremental windowed count
    (Demo2's aggregation) with the pane output schema. Run under UPDATE
    output mode each trigger re-emits the ACCUMULATED count for keys the
    batch touched — Beam's `.accumulatingFiredPanes()` — entirely inside
    the JVM streaming-aggregation operator: partial map-side combine,
    state bounded at one row per open (window, key), no per-key Python
    invocation, so wall scales with DATA, not keys x micro-batches.

    pane_index is NULL by contract: firing ordinals require per-key state
    the JVM aggregation doesn't track; callers who need them asked for
    'discarding' and priced it.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), key_col)
        .agg(F.count(F.lit(1)).alias("pane_count"))
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "pane_count",
            F.lit(None).cast("int").alias("pane_index"),
        )
    )


def pane_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    mode: str = "auto",
    expected_keys: int | None = None,
) -> DataFrame:
    """Per-(window, key) counts with the pane implementation chosen by the
    measured cost model (see `select_pane_impl`). Both paths emit
    (window_start, user_id/key, pane_count, pane_index); 'accumulating'
    emits cumulative counts with NULL pane_index (run under update mode),
    'discarding' emits per-firing deltas with Beam pane ordinals.
    """
    impl = select_pane_impl(mode, expected_keys)
    if impl == "discarding":
        return discarding_pane_counts(
            events, ts_col, key_col, window_duration, watermark_delay
        )
    return accumulating_pane_counts(
        events, ts_col, key_col, window_duration, watermark_delay
    )
