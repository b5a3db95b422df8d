"""Staging helpers that turn a batch table into a multi-micro-batch
file stream — test/demo machinery for watermark semantics, kept out of
the registered query bodies.

FileStreamSource orders files by modification time, so writing each
split with a strictly increasing mtime yields a deterministic batch
sequence under ``maxFilesPerTrigger=1``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.events import epoch_s
from mapreduce_implementation_spark.sources.catalog import load_table


def stage_file_stream(splits: list[DataFrame], prefix: str = "staged_stream_") -> str:
    """Write each split DataFrame as one parquet file in a fresh
    directory, mtime-ordered so FileStreamSource replays them as
    micro-batches in list order. Caller owns cleanup of the returned
    directory. Empty splits are skipped (no zero-row micro-batches)."""
    stream_dir = tempfile.mkdtemp(prefix=prefix)
    now = time.time()
    step = 30.0
    base = now - step * len(splits)
    for i, df in enumerate(splits):
        tmp = tempfile.mkdtemp(prefix=prefix + "part_")
        try:
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            parts = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
            if not parts:
                continue
            dest = os.path.join(stream_dir, f"b{i + 1}.parquet")
            shutil.move(os.path.join(tmp, parts[0]), dest)
            mtime = base + step * i
            os.utime(dest, (mtime, mtime))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return stream_dir


def stage_late_events_stream(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events table as THREE micro-batches that exercise
    watermark-based late-data dropping:

    * batch 1 — the newest hour (raises the watermark to max(ts) - δ),
    * batch 2 — 90% of the older events (windows finalize under the
      established watermark),
    * batch 3 — the withheld 10% (``event_id % 10 == 0``) of those SAME
      old windows, arriving below the watermark → dropped.

    Uses the schema-adaptive batch loader, so any on-disk timestamp
    encoding stages identically: staged files always carry
    ``event_id long, ts timestamp`` (µs, UTC).
    """
    raw = load_table(spark, sf_dir, "events").select("event_id", "ts")
    mx_s = raw.agg(F.max(epoch_s("ts"))).collect()[0][0]
    split_s = mx_s - 3600
    is_new = epoch_s("ts") > F.lit(split_s)
    return stage_file_stream(
        [
            raw.where(is_new),
            raw.where(~is_new & (F.col("event_id") % 10 != 0)),
            raw.where(~is_new & (F.col("event_id") % 10 == 0)),
        ],
        prefix="late_stream_",
    )
