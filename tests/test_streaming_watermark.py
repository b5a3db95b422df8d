"""Event-time watermark late-data semantics, pinned by experiment:

Spark's streaming aggregation filters late input rows using the
watermark established by PRIOR batches (one batch behind eviction), so
a row whose window was already finalized+evicted is dropped — the
append-mode guarantee that an emitted window is never updated. The
registered query streaming_late_data_watermark builds on exactly this
behavior; this test pins it on a 3-row stream."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def _write_batch(spark, stream_dir: str, rows, name: str, mtime: float) -> None:
    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, "event_id long, ts_s long").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    dest = os.path.join(stream_dir, name)
    shutil.move(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def test_late_row_for_evicted_window_is_dropped(spark):
    stream_dir = tempfile.mkdtemp(prefix="wm_test_")
    now = time.time()
    # batch 1: raises watermark to 10000 - 60 = 9940
    _write_batch(spark, stream_dir, [(1, 10000)], "b1.parquet", now - 60)
    # batch 2: old window [0, 300) — aggregated, finalized, evicted
    _write_batch(spark, stream_dir, [(2, 100), (3, 150)], "b2.parquet", now - 30)
    # batch 3: LATE row for that same evicted window — must be dropped
    _write_batch(spark, stream_dir, [(4, 105)], "b3.parquet", now)

    stream = (
        spark.readStream.schema("event_id long, ts_s long")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    counted = (
        stream.withWatermark("ts", "60 seconds")
        .groupBy(F.window("ts", "300 seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").cast("long").alias("bucket_start_s"), "n")
    )
    q = (
        counted.writeStream.format("memory")
        .queryName("wm_drop_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_wm_"))
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
        for p in q.recentProgress
    )
    rows = {r.bucket_start_s: r.n for r in spark.table("wm_drop_test").collect()}
    # the late row was dropped: count stays 2, and the drop is recorded
    assert rows == {0: 2}
    assert dropped == 1
