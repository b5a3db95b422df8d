"""Stream-stream LEFT OUTER interval join: null-extension is emitted
only once the query-wide watermark (min across both sources) proves no
match can still arrive — the watermark-correctness contract that
distinguishes an outer stream join from a batch outer join.

Fixture: three mtime-ordered micro-batches per side. Batch 1 carries
the rows under test, batch 2 advances both sides' watermarks past the
test rows' join windows, batch 3 is one more data batch so eviction
results (computed against the batch-2 watermark) are emitted before the
AvailableNow drain terminates."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from mapreduce_implementation_spark.streaming.fixtures import (
    stage_file_stream,
)
from mapreduce_implementation_spark.streaming.queries import (
    run_available_now,
    streaming_interval_join,
)


def _ts(sec: int):
    return F.lit(sec).cast("timestamp")


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )


def test_left_outer_interval_join_emits_nulls_after_watermark(spark):
    # left: A has a match, B does not, C's window is still open when
    # the global watermark stalls at 99990 (its close 100300 > wm)
    left_splits = [
        _mk(
            spark,
            [("A", 1000), ("B", 2000)],
            "user_id string, ts_s long",
        ).select("user_id", F.col("ts").alias("l_ts")),
        _mk(spark, [("C", 100000)], "user_id string, ts_s long").select(
            "user_id", F.col("ts").alias("l_ts")
        ),
    ]
    right_splits = [
        _mk(
            spark,
            [("A", 1100, 5.0)],
            "user_id string, ts_s long, value double",
        ).select("user_id", F.col("ts").alias("r_ts"), "value"),
        _mk(
            spark,
            [("X", 100000, 1.0)],
            "user_id string, ts_s long, value double",
        ).select("user_id", F.col("ts").alias("r_ts"), "value"),
        _mk(
            spark,
            [("Y", 200000, 1.0)],
            "user_id string, ts_s long, value double",
        ).select("user_id", F.col("ts").alias("r_ts"), "value"),
    ]
    ldir = stage_file_stream(left_splits, prefix="soj_left_")
    rdir = stage_file_stream(right_splits, prefix="soj_right_")
    try:
        lstream = (
            spark.readStream.schema("user_id string, l_ts timestamp")
            .option("maxFilesPerTrigger", "1")
            .parquet(ldir)
        )
        rstream = (
            spark.readStream.schema(
                "user_id string, r_ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(rdir)
        )
        joined = streaming_interval_join(
            lstream,
            rstream,
            key="user_id",
            left_ts="l_ts",
            right_ts="r_ts",
            lo="0 seconds",
            hi="5 minutes",
            watermark="10 seconds",
            how="leftOuter",
        )
        out = joined.select(
            F.col("l.user_id").alias("user_id"),
            F.col("l.l_ts").cast("long").alias("l_s"),
            F.col("r.r_ts").cast("long").alias("r_s"),
            F.col("r.value").alias("value"),
        )
        run_available_now(out, "soj_result", output_mode="append")
        rows = {
            (r.user_id, r.l_s, r.r_s, r.value)
            for r in spark.table("soj_result").collect()
        }
    finally:
        shutil.rmtree(ldir, ignore_errors=True)
        shutil.rmtree(rdir, ignore_errors=True)

    # A matched inside the interval; B null-extended once the watermark
    # (99990 after batch 2) passed its close (2300); C neither matched
    # nor null-extended (window still open at termination); unmatched
    # RIGHT rows (X, Y) never appear in a leftOuter result.
    assert ("A", 1000, 1100, 5.0) in rows
    assert ("B", 2000, None, None) in rows
    users = {u for u, *_ in rows}
    assert "C" not in users and "X" not in users and "Y" not in users
    assert len(rows) == 2


def test_interval_join_rejects_unknown_how(spark):
    import pytest

    df = spark.range(1).select(
        F.lit("u").alias("user_id"),
        F.current_timestamp().alias("l_ts"),
    )
    with pytest.raises(ValueError, match="interval join supports"):
        streaming_interval_join(
            df,
            df.withColumnRenamed("l_ts", "r_ts"),
            key="user_id",
            left_ts="l_ts",
            right_ts="r_ts",
            lo="0 seconds",
            hi="1 minutes",
            how="cross",
        )
