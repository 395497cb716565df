"""Beam discarding-panes parity: deltas per firing, panes sum to totals."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from tutorial_apache_beam_spark.streaming.stateful import discarding_pane_counts

BASE_EPOCH = 1704067230  # 2024-01-01 00:00:30 UTC
RAW_SCHEMA = "event_time BIGINT, user_id BIGINT"


def _write(src_dir, name, rows):
    (src_dir / name).write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _run(spark, src, ckpt, sink):
    """availableNow run into a parquet sink (memory sinks can't recover
    from a checkpoint across restarts); returns the full sink contents."""
    stream = (
        spark.readStream.schema(RAW_SCHEMA)
        .json(str(src))
        .select(F.timestamp_seconds("event_time").alias("ts"), "user_id")
    )
    out = discarding_pane_counts(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(sink))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(sink))


def test_discarding_panes_emit_deltas_and_sum_to_total(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    sink = tmp_path / "sink"

    # Firing 1: 3 events for user 7 in window [00:00, 00:01).
    _write(src, "b0.json", [
        {"event_time": BASE_EPOCH + i, "user_id": 7} for i in range(3)
    ])
    rows1 = [r.asDict() for r in _run(spark, src, ckpt, sink).collect()]
    assert len(rows1) == 1
    assert rows1[0]["pane_count"] == 3 and rows1[0]["pane_index"] == 0

    # Firing 2: 2 MORE events in the same window (late but window still
    # open) → a second pane with only the delta, pane_index 1.
    _write(src, "b1.json", [
        {"event_time": BASE_EPOCH + 10 + i, "user_id": 7} for i in range(2)
    ])
    all_rows = [r.asDict() for r in _run(spark, src, ckpt, sink).collect()]
    rows2 = [r for r in all_rows if r["pane_index"] == 1]
    assert len(all_rows) == 2 and len(rows2) == 1
    assert rows2[0]["pane_count"] == 2

    # Beam invariant: discarding panes sum to the accumulating total.
    assert sum(r["pane_count"] for r in all_rows) == 5


def test_single_run_panes_equal_totals(spark, tmp_path):
    """With all data in one firing, pane counts == accumulated counts."""
    src = tmp_path / "src"
    src.mkdir()
    _write(src, "b0.json", [
        {"event_time": BASE_EPOCH + u * 3 + i, "user_id": 100 + u}
        for u in range(3)
        for i in range(u + 1)
    ])
    out = _run(spark, src, tmp_path / "ckpt", tmp_path / "sink")
    got = {r.user_id: (r.pane_count, r.pane_index) for r in out.collect()}
    assert got == {100: (1, 0), 101: (2, 0), 102: (3, 0)}


class _FakeState:
    """Minimal GroupState double capturing timer arming and removal."""

    def __init__(self, watermark_ms=0):
        self.exists = False
        self.hasTimedOut = False
        self._value = None
        self.removed = False
        self.timeout_ts = None
        self._wm = watermark_ms

    @property
    def get(self):
        return self._value

    def update(self, v):
        self.exists = True
        self._value = v

    def remove(self):
        self.removed = True

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts

    def getCurrentWatermarkMs(self):
        return self._wm


def test_emit_pane_arms_event_time_timer_and_cleans_up():
    import pandas as pd

    from tutorial_apache_beam_spark.streaming.stateful import (
        _duration_ms,
        _make_emit_pane,
    )

    fn = _make_emit_pane(_duration_ms("1 minute"))
    w1 = pd.Timestamp("2024-01-01 00:05:00")
    w2 = pd.Timestamp("2024-01-01 00:07:00")
    key = (7,)
    state = _FakeState(watermark_ms=0)
    batch = pd.DataFrame(
        {"window_start": [w1] * 3 + [w2], "user_id": [7] * 4}
    )

    (out,) = list(fn(key, iter([batch]), state))
    by_win = {r.window_start: r for r in out.itertuples()}
    assert by_win[w1].pane_count == 3 and by_win[w1].pane_index == 0
    assert by_win[w2].pane_count == 1 and by_win[w2].pane_index == 0
    # State holds both open windows' next pane index.
    assert dict(zip(*state.get)) == {
        w1.value // 1_000_000: 1,
        w2.value // 1_000_000: 1,
    }
    # ONE timer per key, armed at the NEWEST window's end, so the whole
    # entry is dropped once the watermark passes it instead of growing
    # forever.
    assert state.timeout_ts == w2.value // 1_000_000 + 60_000

    # A later firing for w1 increments only w1's pane index.
    (out2,) = list(fn(key, iter([batch.iloc[:2]]), state))
    assert out2["pane_index"].iloc[0] == 1

    # Windows whose end passed the watermark are pruned inline.
    pruned_state = _FakeState(watermark_ms=w1.value // 1_000_000 + 60_000)
    pruned_state.update(state.get)
    list(fn(key, iter([pd.DataFrame({"window_start": [w2], "user_id": [7]})]), pruned_state))
    assert list(pruned_state.get[0]) == [w2.value // 1_000_000]

    # Spark guarantee: timestamp must beat the current watermark.
    late_state = _FakeState(watermark_ms=10**15)
    list(fn(key, iter([batch]), late_state))
    assert late_state.timeout_ts == 10**15 + 1

    # Timed-out invocation removes state and emits nothing.
    state.hasTimedOut = True
    assert list(fn(key, iter([]), state)) == []
    assert state.removed


def test_emit_pane_output_contract_vectorized_path():
    """Pin the r6 vectorized counting path's output contract: ascending
    window order regardless of input order (groupby(sort=True) parity),
    exact dtypes for the declared OUTPUT_SCHEMA, multi-frame concat, and
    robustness to non-nanosecond pandas datetime units (pandas 2 can
    deliver Arrow batches as datetime64[us])."""
    import numpy as np
    import pandas as pd

    from tutorial_apache_beam_spark.streaming.stateful import (
        _duration_ms,
        _make_emit_pane,
    )

    fn = _make_emit_pane(_duration_ms("1 minute"))
    w1 = pd.Timestamp("2024-01-01 00:05:00")
    w2 = pd.Timestamp("2024-01-01 00:06:00")
    w3 = pd.Timestamp("2024-01-01 00:07:00")

    # Shuffled window order, split across two frames, in MICROSECOND unit.
    f1 = pd.DataFrame(
        {
            "window_start": pd.Series([w3, w1, w3]).astype("datetime64[us]"),
            "user_id": [7] * 3,
        }
    )
    f2 = pd.DataFrame(
        {
            "window_start": pd.Series([w2, w1]).astype("datetime64[us]"),
            "user_id": [7] * 2,
        }
    )
    state = _FakeState(watermark_ms=0)
    (out,) = list(fn((7,), iter([f1, f2]), state))

    # Ascending window order — what groupby(sort=True) produced before.
    assert list(out["window_start"]) == [w1, w2, w3]
    assert list(out["pane_count"]) == [2, 1, 2]
    assert list(out["pane_index"]) == [0, 0, 0]
    assert list(out["user_id"]) == [7, 7, 7]

    # Dtypes must match OUTPUT_SCHEMA (TIMESTAMP, BIGINT, BIGINT, INT) so
    # Arrow needs no unsafe cast.
    assert out["window_start"].dtype == np.dtype("datetime64[ns]")
    assert out["user_id"].dtype == np.dtype("int64")
    assert out["pane_count"].dtype == np.dtype("int64")
    assert out["pane_index"].dtype == np.dtype("int32")

    # Second firing for one window continues its pane index from state.
    (out2,) = list(
        fn(
            (7,),
            iter([pd.DataFrame({"window_start": [w2], "user_id": [7]})]),
            state,
        )
    )
    assert list(out2["pane_index"]) == [1]


def test_emit_pane_null_window_dropped_null_key_passes_through():
    """Groupby-path semantics the vectorized body must keep: a NaT
    window_start row has no window and is dropped (pandas groupby
    excluded NaT keys), never counted or written into win_ms state; a
    null grouping key emits rows with null user_id instead of crashing
    the Python worker."""
    import pandas as pd

    from tutorial_apache_beam_spark.streaming.stateful import (
        _duration_ms,
        _make_emit_pane,
    )

    fn = _make_emit_pane(_duration_ms("1 minute"))
    w1 = pd.Timestamp("2024-01-01 00:05:00")

    # NaT rows silently dropped; only the real window is counted/stored.
    state = _FakeState(watermark_ms=0)
    batch = pd.DataFrame(
        {"window_start": [w1, pd.NaT, w1, pd.NaT], "user_id": [7] * 4}
    )
    (out,) = list(fn((7,), iter([batch]), state))
    assert list(out["window_start"]) == [w1]
    assert list(out["pane_count"]) == [2]
    assert list(state.get[0]) == [w1.value // 1_000_000]

    # All-NaT batch: empty output frame, no state entries invented.
    state2 = _FakeState(watermark_ms=0)
    batch2 = pd.DataFrame({"window_start": [pd.NaT], "user_id": [7]})
    outs2 = list(fn((7,), iter([batch2]), state2))
    assert len(outs2) == 1 and len(outs2[0]) == 0
    assert list(state2.get[0]) == []

    # Null grouping key: null user_id rows, like the pre-vectorized path.
    state3 = _FakeState(watermark_ms=0)
    batch3 = pd.DataFrame({"window_start": [w1, w1], "user_id": [None, None]})
    (out3,) = list(fn((None,), iter([batch3]), state3))
    assert list(out3["pane_count"]) == [2]
    assert out3["user_id"].iloc[0] is None


def test_count_panes_differential_vs_groupby_reference():
    """Property check: _count_panes must agree with the pre-vectorization
    groupby(sort=True) reference on randomized inputs — window sets with
    duplicates, NaT holes, arbitrary order, any pandas datetime unit, and
    arbitrary pre-existing pane-index state."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tutorial_apache_beam_spark.streaming.stateful import _count_panes

    base_ms = int(pd.Timestamp("2024-01-01").value // 1_000_000)

    def reference(pdf, open_windows, user_id):
        counts = pdf.groupby("window_start", sort=True).size()
        out = {"window_start": [], "user_id": [], "pane_count": [], "pane_index": []}
        for window_start, cnt in counts.items():
            w_ms = int(pd.Timestamp(window_start).value // 1_000_000)
            idx = open_windows.get(w_ms, 0)
            out["window_start"].append(pd.Timestamp(window_start))
            out["user_id"].append(user_id)
            out["pane_count"].append(int(cnt))
            out["pane_index"].append(idx)
            open_windows[w_ms] = idx + 1
        return out

    @given(
        mins=st.lists(
            st.one_of(st.integers(min_value=0, max_value=8), st.none()),
            min_size=1,
            max_size=40,
        ),
        state_idx=st.dictionaries(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=1, max_value=5),
            max_size=4,
        ),
        unit=st.sampled_from(["ns", "us", "ms"]),
    )
    @settings(max_examples=150, deadline=None)
    def check(mins, state_idx, unit):
        ts = [
            pd.NaT if m is None else pd.Timestamp(base_ms + m * 60_000, unit="ms")
            for m in mins
        ]
        pdf = pd.DataFrame(
            {
                "window_start": pd.Series(ts).astype(f"datetime64[{unit}]"),
                "user_id": [7] * len(ts),
            }
        )
        state_a = {base_ms + m * 60_000: i for m, i in state_idx.items()}
        state_b = dict(state_a)

        got = _count_panes(pdf, state_a, 7)
        want = reference(pdf, state_b, 7)

        assert [pd.Timestamp(t) for t in got["window_start"]] == want["window_start"]
        assert list(got["pane_count"]) == want["pane_count"]
        assert list(got["pane_index"]) == want["pane_index"]
        assert list(got["user_id"]) == want["user_id"]
        assert state_a == state_b  # identical post-call pane-index state

    check()
