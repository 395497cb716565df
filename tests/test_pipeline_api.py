"""The Beam-equivalent API: demo pipelines end-to-end on golden data.

Reproduces the reference's manual test procedure (SURVEY §5.1) as automated
golden tests: the message_publisher generator pattern — 3 users × 10
messages, 10 s apart, click=1 (utils/message_publisher.py:113-116) — fed
through Demo1/Demo2 pipelines, with outputs checked against hand-computable
expectations.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tutorial_apache_beam_spark.streaming.demos import demo1_pipeline, demo2_pipeline

# Fixed base so windows are deterministic: 2024-01-01 00:00:30 UTC.
BASE_EPOCH = 1704067230
USERS = (1000, 1001, 1002)


def _write_messages(src_dir) -> None:
    """3 users x 10 messages, 10 s apart — a ~90 s span straddling two
    1-minute windows ([00:00, 00:01) gets 3 msgs/user, [00:01, 00:02) 7)."""
    lines = []
    for user_id in USERS:
        for i in range(10):
            lines.append(
                json.dumps(
                    {"event_time": BASE_EPOCH + i * 10, "user_id": user_id, "click": 1}
                )
            )
    # One malformed message: must be dropped silently (Demo1.java:65-68).
    lines.append("{this is not json")
    (src_dir / "batch0.json").write_text("\n".join(lines) + "\n")


@pytest.fixture()
def src_dir(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    _write_messages(d)
    return d


def test_demo1_pipeline_appends_parsed_rows(spark, tmp_path, src_dir):
    sink = tmp_path / "sink"
    result = demo1_pipeline(
        spark, str(src_dir), str(sink), str(tmp_path / "ckpt"), available_now=True
    )
    result.wait_until_finish()

    out = spark.read.parquet(str(sink))
    rows = out.collect()
    assert len(rows) == 30  # malformed line dropped
    assert set(out.columns) == {"event_time", "user_id", "click", "processing_time"}
    assert {r.user_id for r in rows} == set(USERS)
    assert all(r.click == 1 for r in rows)
    assert all(r.processing_time is not None for r in rows)


def test_demo2_pipeline_counts_per_window(spark, tmp_path, src_dir):
    sink = tmp_path / "sink"
    result = demo2_pipeline(
        spark,
        str(src_dir),
        str(sink),
        str(tmp_path / "ckpt"),
        available_now=True,
        finalize=False,
    )
    result.wait_until_finish()

    out = spark.read.parquet(str(sink))
    # Events span 00:00:30..00:02:00, so the final watermark is
    # 00:02:00 - 2 min = 00:00:00: no window end is at-or-before it, and
    # append mode (= Beam AfterWatermark once-firing) emits NOTHING yet.
    # The windows stay in state awaiting later input — checked next test.
    assert out.count() == 0


def test_demo2_late_data_within_open_window_is_counted(spark, tmp_path, src_dir):
    """Second availableNow run over the same checkpoint: an event behind the
    processing frontier but inside a still-open window must be aggregated
    (Beam allowed-lateness accumulation), and windows close exactly when
    the advancing watermark passes them."""
    sink = tmp_path / "sink"
    ckpt = tmp_path / "ckpt"
    demo2_pipeline(
        spark, str(src_dir), str(sink), str(ckpt), available_now=True, finalize=False
    ).wait_until_finish()

    late = [
        # "Late" event at 00:01:15 into the still-open [00:01, 00:02) window.
        json.dumps({"event_time": BASE_EPOCH + 45, "user_id": 1000, "click": 1}),
        # Watermark pusher at 00:04:00 → watermark 00:02:00 closes both
        # [00:00, 00:01) and [00:01, 00:02).
        json.dumps({"event_time": BASE_EPOCH + 210, "user_id": 1000, "click": 1}),
    ]
    (src_dir / "batch1.json").write_text("\n".join(late) + "\n")
    demo2_pipeline(
        spark, str(src_dir), str(sink), str(ckpt), available_now=True, finalize=False
    ).wait_until_finish()

    out = spark.read.parquet(str(sink))
    rows = {(r.user_id, str(r.window_start)): r["count"] for r in out.collect()}
    # Per user: events at :30..:120 by 10 s → [00:00, 00:01) holds 3
    # (:30/:40/:50), [00:01, 00:02) holds 6 (:60..:110); the :120 event
    # is in [00:02, 00:03), which stays open (end > watermark 00:02:00),
    # as does the pusher's [00:04, 00:05).
    expected = {(u, "2024-01-01 00:00:00"): 3 for u in USERS}
    expected.update({(u, "2024-01-01 00:01:00"): 6 for u in USERS})
    expected[(1000, "2024-01-01 00:01:00")] = 7  # 6 on-time + 1 late
    assert rows == expected


def test_demo2_drain_finalize_matches_beam_bounded_output(spark, tmp_path, src_dir):
    """Default drain of a bounded directory reproduces Beam's
    bounded-pipeline result (watermark -> +inf fires every window): the
    reference's manual test expectation — each user's counts sum to 10
    (SURVEY §5.1, utils/message_publisher.py:113-116). This fixture's
    :30-offset 90 s span crosses 3 window boundaries (3 + 6 + 1)."""
    sink = tmp_path / "sink"
    demo2_pipeline(
        spark, str(src_dir), str(sink), str(tmp_path / "ckpt"), available_now=True
    ).wait_until_finish()

    out = spark.read.parquet(str(sink))
    per_user = {
        r.user_id: (r.total, r.windows)
        for r in out.groupBy("user_id")
        .agg(
            F.sum("count").alias("total"), F.count(F.lit(1)).alias("windows")
        )
        .collect()
    }
    assert per_user == {u: (10, 3) for u in USERS}
