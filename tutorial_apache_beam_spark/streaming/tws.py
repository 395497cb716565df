"""Discarding-pane counts on the state-v2 API (transformWithStateInPandas).

Functional twin of `streaming.stateful.discarding_pane_counts`
(Beam's `.discardingFiredPanes()` + `Count.perKey()`, reference
`Demo2.java:149-160`), rebuilt on Spark 4's arbitrary-state v2 API:
typed state variables (`ValueState`) + explicit event-time timers via
`StatefulProcessorHandle`, instead of the single opaque
`GroupState` blob of `applyInPandasWithState`.

Why both exist: state v1 is the broadly-deployed API; v2 is where
Spark's stateful streaming is heading (multiple named state variables,
state TTL, `handleExpiredTimer` as a first-class callback) and requires
the RocksDB state-store provider — the provider a 100 TB cluster runs
anyway (HDFS-backed snapshots, changelog checkpointing). Keeping the two
implementations output-identical is itself a test of the engine's pane
semantics (asserted in tests/test_tws_panes.py).

Scale design is inherited from the v1 operator: state keyed by USER
(one Python invocation per user per micro-batch, not per window-key),
open windows held as parallel arrays in one ValueState, inline pruning
of expired windows, and ONE re-armed event-time timer per key for
idle-key cleanup.

Runtime dependency: transformWithState's Python worker speaks protobuf
to the JVM state server. Where the real `google.protobuf` wheel is
absent (this sandbox), `tws_pane_counts` activates the vendored
pure-Python runtime (`vendor/protoshim`, via `protoshim.
ensure_protobuf_runtime`) so the operator runs end-to-end anyway — the
parity test `tests/test_tws_panes.py::test_tws_matches_state_v1_panes`
executes the full wire protocol against the RocksDB provider. On a real
cluster (protobuf installed) the shim is bypassed automatically.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from tutorial_apache_beam_spark.streaming.stateful import (
    SESSION_STATE_SCHEMA,
    STATE_SCHEMA,
    _agg_panes,
    _duration_ms,
    _session_panes,
)


class PaneCountProcessor(StatefulProcessor):
    """Per-key pane emitter: each micro-batch's rows for a (window, key)
    are one pane; emits the batch-local combiner delta with a
    monotonically increasing pane_index (Beam PaneInfo.index analog).

    Combiner-generic since r11 (the same `_agg_panes` body as the v1
    emitter): the constructor's key_specs/agg/value_col mirror
    `stateful._make_pane_emitter`, with the historical count-only
    defaults so existing pickled checkpoints and the parity tests keep
    their exact shape."""

    def __init__(
        self,
        window_ms: int,
        key_specs: tuple = (("user_id", "int"),),
        agg: str = "count",
        value_col: str | None = None,
        value_kind: str = "int",
        value_name: str = "pane_count",
    ) -> None:
        self._window_ms = window_ms
        self._key_specs = key_specs
        self._agg = agg
        self._value_col = value_col
        self._value_kind = value_kind
        self._value_name = value_name

    # STATE_SCHEMA plus the last registered cleanup-timer timestamp in
    # the SAME value state (r13): every state access is one socket
    # round trip to the JVM state server — measured 73% of the v2
    # drain's Python-side time (cProfile over handleInputRows, 2,500
    # recv_into calls = 5 per key at 500 keys; the protoshim encode was
    # ~4%). The panes state is read and written every batch anyway, so
    # folding the timer timestamp in drops the separate timer_ts
    # get+update — 5 round trips per key per batch down to 3.
    _STATE_SCHEMA = f"{STATE_SCHEMA}, timer_ms BIGINT"

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._panes = handle.getValueState("panes", self._STATE_SCHEMA)

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timer_values: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        frames = [b for b in rows if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]

        stored = self._panes.get()
        win_ms, pane_idx, prev_ms = (
            stored if stored is not None else ([], [], None)
        )
        open_windows = dict(zip(win_ms, pane_idx))

        watermark_ms = timer_values.getCurrentWatermarkInMs()
        if watermark_ms > 0:
            open_windows = {
                w: i
                for w, i in open_windows.items()
                if w + self._window_ms > watermark_ms
            }

        # Shared hot-path body with the v1 emitter (one invocation per
        # key per micro-batch is the cost model for both APIs); mutates
        # open_windows in place — see _agg_panes.
        out = _agg_panes(
            pdf, open_windows, key, self._key_specs, self._agg,
            self._value_col, self._value_kind, self._value_name,
        )

        # ONE live idle-cleanup timer per key, at the newest open
        # window's end (must sit beyond the current watermark): delete
        # the previously registered timer before re-arming, otherwise a
        # hot key accumulates one timer per micro-batch.
        newest_end = (
            max(open_windows) + self._window_ms if open_windows else 0
        )
        target = max(newest_end, watermark_ms + 1)
        if prev_ms != target:
            if prev_ms is not None and prev_ms > watermark_ms:
                # Still pending (unfired) — remove it.
                self._handle.deleteTimer(prev_ms)
            self._handle.registerTimer(target)
        self._panes.update(
            (list(open_windows.keys()), list(open_windows.values()), target)
        )
        yield out

    # Keyword-exact signature — see BatchingProcessor.handleExpiredTimer.
    def handleExpiredTimer(
        self,
        key: tuple[Any, ...],
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        """Watermark passed the newest window this key had open: if no
        window survived inline pruning, drop the whole entry.

        Staleness guard (same shape as BatchingProcessor's): a fired
        timer that handleInputRows could not delete (it was already due)
        must not clear `timer_ts` while a NEWER timer is live — the next
        batch would then re-register without deleting it, leaking one
        live timer per occurrence. Skip entirely unless the fired expiry
        matches the stored target.
        """
        stored = self._panes.get()
        if (
            stored is not None
            and expiredTimerInfo is not None
            and expiredTimerInfo.getExpiryTimeInMs() != stored[2]
        ):
            return iter([])
        watermark_ms = timerValues.getCurrentWatermarkInMs()
        if stored is not None:
            alive = [
                w for w in stored[0] if w + self._window_ms > watermark_ms
            ]
            if not alive:
                self._panes.clear()
        return iter([])

    def close(self) -> None:
        pass


class SessionPaneProcessor(StatefulProcessor):
    """State-v2 twin of the r12 SESSION-window pane emitter
    (`stateful._make_session_pane_emitter`), sharing its `_session_panes`
    body so the two APIs cannot drift on merge semantics or the
    pane-identity rule (merged session inherits the earliest-start
    constituent's ordinal — see stateful.py's module docstring). State:
    one ValueState holding the open-session interval arrays
    (SESSION_STATE_SCHEMA, epoch µs), plus the single re-armed cleanup
    timer — the same timer discipline as PaneCountProcessor (timers are
    ms-API: the target rounds the newest session end UP to the next
    ms)."""

    def __init__(
        self,
        gap_us: int,
        key_specs: tuple = (("user_id", "int"),),
        agg: str = "count",
        value_col: str | None = None,
        value_kind: str = "int",
        value_name: str = "pane_count",
        ts_col: str = "ts",
    ) -> None:
        self._gap_us = gap_us
        self._key_specs = key_specs
        self._agg = agg
        self._value_col = value_col
        self._value_kind = value_kind
        self._value_name = value_name
        self._ts_col = ts_col

    # Timer timestamp folded into the sessions state (r13) — same
    # round-trip economics as PaneCountProcessor._STATE_SCHEMA.
    _STATE_SCHEMA = f"{SESSION_STATE_SCHEMA}, timer_ms BIGINT"

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getValueState(
            "sessions", self._STATE_SCHEMA
        )

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timer_values: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        frames = [b for b in rows if len(b)]
        if not frames:
            return
        pdf = pd.concat(frames) if len(frames) > 1 else frames[0]

        stored = self._sessions.get()
        starts, ends, idxs, prev_ms = (
            stored if stored is not None else ([], [], [], None)
        )
        watermark_ms = timer_values.getCurrentWatermarkInMs()
        wm_us = watermark_ms * 1000
        sessions = [
            [s, e, i]
            for s, e, i in zip(starts, ends, idxs)
            if e > wm_us
        ]

        out = _session_panes(
            pdf, sessions, key, self._key_specs, self._agg,
            self._value_col, self._value_kind, self._value_name,
            self._gap_us, self._ts_col,
        )

        newest_end_ms = (
            -(-max(s[1] for s in sessions) // 1000) if sessions else 0
        )
        target = max(newest_end_ms, watermark_ms + 1)
        if prev_ms != target:
            if prev_ms is not None and prev_ms > watermark_ms:
                self._handle.deleteTimer(prev_ms)
            self._handle.registerTimer(target)
        self._sessions.update(
            (
                [s[0] for s in sessions],
                [s[1] for s in sessions],
                [s[2] for s in sessions],
                target,
            )
        )
        yield out

    # Keyword-exact signature — see BatchingProcessor.handleExpiredTimer.
    def handleExpiredTimer(
        self,
        key: tuple[Any, ...],
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        """Same staleness-guarded cleanup as PaneCountProcessor: only a
        firing that matches the stored target may clear state, and only
        when no session outlives the watermark."""
        stored = self._sessions.get()
        if (
            stored is not None
            and expiredTimerInfo is not None
            and expiredTimerInfo.getExpiryTimeInMs() != stored[3]
        ):
            return iter([])
        watermark_ms = timerValues.getCurrentWatermarkInMs()
        if stored is not None:
            alive = [e for e in stored[1] if e > watermark_ms * 1000]
            if not alive:
                self._sessions.clear()
        return iter([])

    def close(self) -> None:
        pass


class BatchingProcessor(StatefulProcessor):
    """State-v2 twin of `streaming.batching.group_into_batches` (Beam's
    `GroupIntoBatches.ofSize(n)`): buffers element ids per key in a
    ListState, emits full batches of exactly n, and flushes the partial
    remainder via an event-time timer once the watermark moves past the
    data already seen.

    Where the v1 form packs the whole buffer into one state row
    (`pending ARRAY<BIGINT>` inside applyInPandasWithState's single
    state tuple), this uses the v2 API's native ListState — one state
    row per pending element. When a micro-batch crosses no batch
    boundary (nothing consumed), only the NEW elements are written via
    `appendList` (RocksDB merge-append at cluster scale); the buffer is
    rewritten with `put` only when a full batch was carved off the
    front. A ValueState holds the batch sequence counter and the single
    live cleanup timer.

    Output parity contract with the v1 operator (asserted in
    tests/test_tws_panes.py): identical (user_id, batch_seq, batch_size)
    rows and identical per-key element multisets. Batch MEMBERSHIP may
    legitimately differ between the two when a micro-batch's rows for a
    key arrive in a different order after the shuffle — neither Beam nor
    Spark guarantees intra-key arrival order.

    Two edge semantics, found by multi-micro-batch e2e (round 5):

    - LATE INPUT: this operator runs without `eventTimeColumnName`, so
      Spark does NOT late-filter its input — rows older than the
      watermark still join the buffer (Beam's GroupIntoBatches likewise
      batches late data). The v1 twin sits behind a watermark operator
      that DROPS late rows, so the parity contract above applies to
      inputs where no batch delivers rows older than the current
      watermark; on late data v2 is the more Beam-faithful of the two.
    - TAIL FLUSH REACHABILITY: the remainder flushes when the watermark
      passes the last re-armed target (previous batch's watermark + 1).
      If a drain's final micro-batches carry no newer event times (e.g.
      a backfill replayed newest-first), that target exceeds the final
      watermark and the remainder stays in state — exactly the v1
      event-time-timeout property, and the same withholding rule as
      append-mode windows. A bounded replay that must flush everything
      should feed files in event-time order (Beam differs here: bounded
      inputs advance its watermark to +inf, firing all timers).
    """

    def __init__(self, batch_size: int) -> None:
        self._batch_size = batch_size

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._pending = handle.getListState("pending", "element_id BIGINT")
        # seq: next batch ordinal; last_ms: the one live timer's target
        self._meta = handle.getValueState("meta", "seq INT, last_ms BIGINT")

    def _emit(self, user_id, elements: list[int], seq: int) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_seq": [seq],
                "batch_size": [len(elements)],
                "element_ids": [elements],
            }
        )

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timer_values: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        meta = self._meta.get()
        if meta is not None:
            # last_ms uses 0 as the "no live timer" sentinel (a real
            # target is always >= 1): set after a timer flush, where
            # storing a NULL would ride on nullable-field serialization.
            seq = meta[0]
            last_timer = meta[1] if meta[1] else None
        else:
            seq, last_timer = 0, None
        stored = (
            [int(t[0]) for t in self._pending.get()]
            if self._pending.exists()
            else []
        )
        fresh: list[int] = []
        for pdf in rows:
            fresh.extend(int(v) for v in pdf["element_id"])
        pending = stored + fresh
        consumed = False
        while len(pending) >= self._batch_size:
            full, pending = (
                pending[: self._batch_size],
                pending[self._batch_size :],
            )
            yield self._emit(user_id, full, seq)
            seq += 1
            consumed = True
        if not consumed:
            # No batch boundary crossed: the stored prefix is untouched,
            # so append only the new suffix (RocksDB merge-append) instead
            # of rewriting the whole buffer.
            if fresh:
                self._pending.appendList([(e,) for e in fresh])
        elif pending:
            self._pending.put([(e,) for e in pending])
        else:
            self._pending.clear()
        # ONE live remainder-flush timer per key, just past the current
        # watermark (v1: state.setTimeoutTimestamp(watermark + 1)).
        watermark_ms = timer_values.getCurrentWatermarkInMs()
        target = max(watermark_ms, 0) + 1
        if last_timer != target:
            if last_timer is not None and last_timer > watermark_ms:
                self._handle.deleteTimer(last_timer)
            self._handle.registerTimer(target)
        self._meta.update((seq, target))

    # NOTE: parameter names must match PySpark's invocation exactly — the
    # framework calls handleExpiredTimer(key=..., timerValues=...,
    # expiredTimerInfo=...) by KEYWORD (stateful_processor_util.py), so
    # snake_case names here are a runtime TypeError, not a style choice.
    def handleExpiredTimer(
        self,
        key: tuple[Any, ...],
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        """Watermark passed the buffered data: flush the remainder as the
        key's final (possibly partial) batch and drop all state.

        Staleness guard: when an already-due timer could not be deleted
        by handleInputRows (deleteTimer on a fired timer is undefined)
        and NEW rows arrived in the same micro-batch, that old timer
        still fires here — but meta.last_ms already points at the newer
        re-armed target. Flushing on the stale firing would emit
        just-arrived elements prematurely (the v1 operator re-arms
        without flushing in this situation). Compare the fired timer's
        expiry to the stored target and skip the flush — state intact —
        when they differ; the live timer will flush later.
        """
        (user_id,) = key
        meta = self._meta.get()
        if (
            meta is not None
            and meta[1]
            and expiredTimerInfo.getExpiryTimeInMs() != meta[1]
        ):
            return
        pending = (
            [int(t[0]) for t in self._pending.get()]
            if self._pending.exists()
            else []
        )
        self._pending.clear()
        seq = meta[0] if meta is not None else 0
        # The SEQUENCE SURVIVES the flush (matching the v1 operator's r5
        # fix): clearing meta here would hand a later burst batch_seq 0
        # again, breaking the contiguous-seq contract. last_ms=0 records
        # that no timer is live; the residual state is one tiny row per
        # key ever seen — Beam's global-window state shape.
        self._meta.update((seq + 1 if pending else seq, 0))
        if pending:
            yield self._emit(user_id, pending, seq)

    def close(self) -> None:
        pass


def tws_group_into_batches(
    events: DataFrame,
    key_col: str = "user_id",
    element_col: str = "event_id",
    batch_size: int = 64,
    ts_col: str = "ts",
) -> DataFrame:
    """`group_into_batches` on the state-v2 API — identical contract:
    (user_id, batch_seq, batch_size, element_ids) rows, only the timer
    flush may emit a partial batch; null element ids are dropped.

    Requires the RocksDB state-store provider (transformWithState
    backend) and a protobuf runtime (`protoshim.ensure_protobuf_runtime`
    activates the vendored one automatically).
    """
    from tutorial_apache_beam_spark.protoshim import ensure_protobuf_runtime
    from tutorial_apache_beam_spark.streaming.batching import OUTPUT_SCHEMA

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    ensure_protobuf_runtime(spark=events.sparkSession)
    cols = [
        F.col(key_col).alias("user_id"),
        F.col(element_col).alias("element_id"),
    ]
    if ts_col in events.columns:
        cols.append(F.col(ts_col))
    keyed = events.filter(F.col(element_col).isNotNull()).select(*cols)
    return keyed.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=BatchingProcessor(batch_size),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


class IngestDedupProcessor(StatefulProcessor):
    """State-v2 ingest-time exact dedup: per key, a MapState holds the
    set of content fingerprints already admitted (fingerprint → admit
    count), so only a fingerprint's FIRST arrival is emitted.

    Counterpart of `operators.dedup.streaming_ingest_dedup`
    (dropDuplicatesWithinWatermark): where that bounds state by the
    WATERMARK horizon, this bounds it by a state-TTL horizon — a
    processing-time retention window on the seen-set, which is the shape
    an always-on ingest service wants (dedup against "what I admitted in
    the last N hours", independent of event-time skew). State is sharded
    by the grouping key like any streaming aggregation; per-key size is
    one map entry per distinct fingerprint inside the TTL window, and
    the store expires entries without any timer bookkeeping here.

    Cost model: each fingerprint costs one containsKey + one updateValue
    round trip to the state server (MapState has no batch get). That is
    the deliberate trade against the v1 set-in-a-ValueState shape: v1
    rewrites the WHOLE seen-set every micro-batch per key (O(set)
    serialization, unbounded without TTL), this pays O(rows) small round
    trips but touches only the entries it reads — the right side of the
    trade exactly when the TTL window keeps the set large and the
    per-batch row count per key small, which is the ingest-dedup regime.
    """

    def __init__(self, ttl_ms: int | None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState(
            "seen", "fp BIGINT", "admits BIGINT", self._ttl_ms
        )

    def handleInputRows(
        self,
        key: tuple[Any, ...],
        rows: Iterator[pd.DataFrame],
        timer_values: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        fresh: list[int] = []
        for pdf in rows:
            for fp in pdf["fingerprint"]:
                fp = int(fp)
                k = (fp,)
                if self._seen.containsKey(k):
                    prior = self._seen.getValue(k)
                    self._seen.updateValue(k, (int(prior[0]) + 1,))
                else:
                    self._seen.updateValue(k, (1,))
                    fresh.append(fp)
        if fresh:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(fresh), "fingerprint": fresh}
            )

    # Keyword-exact signature — see BatchingProcessor.handleExpiredTimer.
    def handleExpiredTimer(
        self,
        key: tuple[Any, ...],
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        return iter([])

    def close(self) -> None:
        pass


def tws_ingest_dedup(
    events: DataFrame,
    key_col: str = "user_id",
    fingerprint_col: str = "event_id",
    ttl: str | None = "1 hour",
) -> DataFrame:
    """Emit only the first arrival of each (key, fingerprint) pair,
    remembering admissions for `ttl` of processing time (None = forever).

    Output: (user_id, fingerprint) — one row per first admission.
    Requires the RocksDB provider.

    Time-mode coupling (Spark rule, not a choice here): state TTL is a
    processing-time feature, so `ttl` forces timeMode=ProcessingTime —
    the right shape for an always-on ingest service, but note that in
    that mode Spark schedules batches continuously (timers COULD fire),
    so a `Trigger.AvailableNow` drain never self-terminates; drive such
    a query with `processAllAvailable()` + `stop()` instead. With
    `ttl=None` the operator runs in timeMode=None, keeps state forever,
    and terminates normally under availableNow — the right shape for
    bounded replays/backfills.
    """
    from tutorial_apache_beam_spark.protoshim import ensure_protobuf_runtime

    ensure_protobuf_runtime(spark=events.sparkSession)
    ttl_ms = _duration_ms(ttl) if ttl is not None else None
    keyed = events.select(
        F.col(key_col).alias("user_id"),
        F.col(fingerprint_col).alias("fingerprint"),
    )
    return keyed.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=IngestDedupProcessor(ttl_ms),
        outputStructType="user_id BIGINT, fingerprint BIGINT",
        outputMode="Append",
        timeMode="ProcessingTime" if ttl_ms is not None else "None",
    )


def tws_pane_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | tuple[str, ...] = ("user_id",),
    value_col: str | None = None,
    agg: str = "count",
    window_duration: str = "1 minute",
    slide_duration: str | None = None,
    watermark_delay: str = "2 minutes",
    session_gap: str | None = None,
) -> DataFrame:
    """`discarding_pane_aggregate` on the state-v2 API — identical
    contract (r11, combiner-generic/multi-key/sliding like the v1 twin;
    r12 adds `session_gap` merging session windows in lockstep): one
    row per (window, keys, firing), `pane_count`/`pane_value` =
    combiner delta since the previous firing, `pane_index` = firing
    ordinal.

    Requires `spark.sql.streaming.stateStore.providerClass` =
    RocksDBStateStoreProvider (the transformWithState backend).
    """
    # The state-v2 Python worker speaks protobuf to the JVM state server.
    # Try the vendored pure-Python runtime (vendor/protoshim) when the
    # real wheel is absent; degrade LOUDLY at plan-construction time only
    # if neither is usable — otherwise the query would crash at start()
    # with an opaque Python worker traceback.
    from tutorial_apache_beam_spark.protoshim import ensure_protobuf_runtime

    from tutorial_apache_beam_spark.streaming.stateful import (
        _pane_plan,
        _require_utc_session,
    )

    key_cols = list(key_cols)
    _require_utc_session(events, "tws_pane_aggregate")
    try:
        ensure_protobuf_runtime(spark=events.sparkSession)
    except ImportError as exc:
        raise RuntimeError(
            "tws_pane_aggregate needs the state-v2 API "
            "(transformWithStateInPandas), whose Python worker speaks "
            "protobuf to the JVM state server — and neither google.protobuf "
            "nor the vendored protoshim runtime could be activated "
            f"({exc}). Install protobuf (any pure-Python wheel suffices), "
            "or use the output-identical state-v1 operator: "
            "streaming.stateful.discarding_pane_aggregate."
        ) from exc
    key_specs, value_kind, value_name, out_schema, bucket = _pane_plan(
        events, ts_col, key_cols, window_duration, slide_duration,
        agg, value_col, "tws_pane_aggregate", session_gap,
    )
    # Sliding delay widening + NaN→NULL normalization: identical to the
    # v1 twin — see discarding_pane_aggregate for the rationale (an
    # on-time event's older window instances must not be late-filtered;
    # both pane paths treat NaN as missing by contract).
    from pyspark.sql import types as T

    if session_gap is not None:
        # Session twin: watermark on the RAW event time (aliased to
        # window_start — a fresh attribute, composable under an
        # upstream watermark), no plan-time bucket — mirrors the v1
        # session path exactly.
        keep = [value_col] if value_col is not None else []
        # timestamp_micros(unix_micros(ts)) is an EXACT identity for
        # Spark's µs timestamps whose sole job is to be a COMPUTED
        # expression: a plain alias inherits the upstream column's
        # watermark metadata and re-watermarking it is 'redefining'
        # (measured under the Pipeline API's WindowInto); a computed
        # column starts metadata-free, like the fixed path's
        # window().start.
        sessions_in = events.select(
            F.timestamp_micros(F.unix_micros(F.col(ts_col))).alias(
                "window_start"
            ),
            *key_cols,
            *keep,
        ).withWatermark("window_start", watermark_delay)
        if value_col is not None and isinstance(
            events.schema[value_col].dataType, (T.FloatType, T.DoubleType)
        ):
            sessions_in = sessions_in.withColumn(
                value_col,
                F.nanvl(F.col(value_col), F.lit(None).cast("double")),
            )
        return sessions_in.groupBy(*key_cols).transformWithStateInPandas(
            statefulProcessor=SessionPaneProcessor(
                _duration_ms(session_gap) * 1000,  # interval math in µs
                key_specs, agg, value_col,
                value_kind, value_name, "window_start",
            ),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
            # NO eventTimeColumnName (r12 review): declaring the output
            # window_start as an event-time column arms Spark's
            # emitted-rows-older-than-watermark kill switch
            # (UpdateEventTimeColumnExec) — and pane emissions
            # LEGITIMATELY precede the current watermark: a merged
            # session's start is as old as its earliest event, and a
            # fixed window straddling the watermark fires with
            # start < wm. Beam panes are not late rows; the v1 twin
            # (applyInPandasWithState) likewise propagates no output
            # event time.
        )

    keep = [value_col] if value_col is not None else []
    effective_delay = watermark_delay
    if slide_duration is not None:
        span_ms = max(
            _duration_ms(window_duration) - _duration_ms(slide_duration), 0
        )
        effective_delay = (
            f"{_duration_ms(watermark_delay, allow_zero=True) + span_ms}"
            " milliseconds"
        )
    bucketed = (
        events.withColumn("window_start", bucket.start)
        .withWatermark("window_start", effective_delay)
        .select("window_start", *key_cols, *keep)
    )
    if value_col is not None and isinstance(
        events.schema[value_col].dataType, (T.FloatType, T.DoubleType)
    ):
        bucketed = bucketed.withColumn(
            value_col,
            F.nanvl(F.col(value_col), F.lit(None).cast("double")),
        )
    return bucketed.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=PaneCountProcessor(
            _duration_ms(window_duration), key_specs, agg, value_col,
            value_kind, value_name,
        ),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="EventTime",
        # NO eventTimeColumnName — see the session branch above: a pane
        # for a window straddling the watermark fires with
        # window_start < wm, which the output event-time validator
        # would kill the query over (r12 review; the r11 tests never
        # advanced the watermark past a fired window's start).
    )


def tws_pane_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
) -> DataFrame:
    """`discarding_pane_counts` on the state-v2 API — the historical
    single-key count view over `tws_pane_aggregate` (which also lifted
    the r10 integral-key-only restriction, in lockstep with the v1
    twin)."""
    return tws_pane_aggregate(
        events,
        ts_col=ts_col,
        key_cols=[key_col],
        agg="count",
        window_duration=window_duration,
        watermark_delay=watermark_delay,
    )
