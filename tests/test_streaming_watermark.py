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


def test_registered_watermark_query_observes_drops(spark):
    """The REGISTERED late-data query's drain must record
    numRowsDroppedByWatermark > 0 in the engine's progress JSON — the
    late batch-3 rows are observed dropped by the state store, not
    merely inferred from the output counts."""
    from mapreduce_implementation_spark.plans import streaming_queries as sq

    out = sq.streaming_late_data_watermark_query(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in sq._LAST_PROGRESS
        if p.get("stateOperators")
    )
    assert dropped > 0, sq._LAST_PROGRESS


def test_dedup_within_watermark_bounds_state(spark):
    """dropDuplicatesWithinWatermark: near-in-time duplicates collapse;
    a duplicate arriving in a later batch far beyond the watermark
    window survives (state for its hash aged out) — proving state is
    bounded by the watermark, not by history."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.streaming.queries import (
        streaming_dedup_within_watermark,
    )

    stream_dir = tempfile.mkdtemp(prefix="wm_dedup_")
    now = time.time()

    def wb(rows, name, mt):
        tmp = tempfile.mkdtemp()
        spark.createDataFrame(rows, "text string, ts_s long").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dest = os.path.join(stream_dir, name)
        shutil.move(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp)
        os.utime(dest, (mt, mt))

    # batch 1: dup pair close in time + a singleton
    wb([("aaa", 100), ("aaa", 200), ("bbb", 150)], "b1.parquet", now - 60)
    # batch 2: far-future row advances the watermark way past batch 1
    # (the watermark lags a batch, and within a batch state eviction
    # runs AFTER input dedup — so the re-send needs TWO more batches)
    wb([("ccc", 1_000_100)], "b2.parquet", now - 40)
    # batch 3: filler under the advanced watermark → batch-1 state evicts
    wb([("ddd", 1_000_200)], "b3.parquet", now - 20)
    # batch 4: re-sends "aaa" — its dedup state has aged out, so it
    # survives AGAIN
    wb([("aaa", 1_000_300)], "b4.parquet", now)

    stream = (
        spark.readStream.schema("text string, ts_s long")
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    deduped = streaming_dedup_within_watermark(stream, "text", "ts", "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_wd_"))
        .start()
    )
    q.awaitTermination()
    from collections import Counter

    import hashlib

    def h(s):
        toks = s.lower().split()
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    counts = Counter(r.chash for r in spark.table("wm_dedup_test").collect())
    assert counts[h("bbb")] == 1 and counts[h("ccc")] == 1
    assert counts[h("ddd")] == 1
    # "aaa": once from batch 1 (in-window dup collapsed), once from
    # batch 2 after its state aged out
    assert counts[h("aaa")] == 2
