"""Update output mode = Beam's AfterWatermark-with-late-firings in
accumulating mode (SURVEY W3/W5 mapping): each trigger re-emits the
ACCUMULATED count for every (window, key) changed in that trigger."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

BASE_EPOCH = 1704067230  # 2024-01-01 00:00:30 UTC


def _run_update(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema("event_time BIGINT, user_id BIGINT")
        .json(str(src))
        .select(F.timestamp_seconds("event_time").alias("ts"), "user_id")
    )
    agg = (
        stream.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "1 minute").start.alias("window_start"), "user_id")
        .agg(F.count(F.lit(1)).alias("count"))
    )

    def sink(batch_df, batch_id):
        batch_df.withColumn("_batch", F.lit(batch_id)).write.mode("append").parquet(
            str(out)
        )

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_update_mode_reemits_accumulated_counts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt, out = tmp_path / "ckpt", tmp_path / "out"

    # Firing 1: 3 events for user 9 in window [00:00, 00:01).
    (src / "b0.json").write_text(
        "\n".join(
            json.dumps({"event_time": BASE_EPOCH + i, "user_id": 9}) for i in range(3)
        )
        + "\n"
    )
    _run_update(spark, src, ckpt, out)

    # Firing 2: 2 late-but-in-window events → update re-emits count=5
    # (accumulated), unlike the discarding-pane operator which emits 2.
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps({"event_time": BASE_EPOCH + 10 + i, "user_id": 9})
            for i in range(2)
        )
        + "\n"
    )
    _run_update(spark, src, ckpt, out)

    rows = sorted(
        (r["count"]) for r in spark.read.parquet(str(out)).collect()
    )
    # The sink log holds both firings' emissions: 3 then accumulated 5.
    assert rows == [3, 5]
