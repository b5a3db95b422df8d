"""Behavioral tests for the temporal operators (range join)."""

from __future__ import annotations


def test_range_join_boundaries(spark):
    from mapreduce_implementation_spark.operators.events import range_join

    left = spark.createDataFrame(
        [(1, 100, 1000)], "event_id long, user_id long, ts_s long"
    )
    right = spark.createDataFrame(
        [(100, 1000, 1.0),   # t == lts      -> in  (lo=0)
         (100, 1300, 2.0),   # t == lts+300  -> in  (hi inclusive)
         (100, 1301, 3.0),   # just past hi  -> out
         (100, 999, 4.0),    # before lo     -> out
         (101, 1100, 5.0)],  # other user    -> out
        "user_id long, ts_s long, value double",
    )
    got = range_join(left, right, key="user_id", lo_s=0, hi_s=300)
    vals = sorted(r.value for r in got.collect())
    assert vals == [1.0, 2.0]


def test_range_join_crosses_bucket_boundary(spark):
    from mapreduce_implementation_spark.operators.events import range_join

    # window [590, 890] spans buckets 1 and 2 (width 300); the match at
    # 899 is out, the one at 601 is in despite a different bucket than lts
    left = spark.createDataFrame([(1, 7, 590)], "event_id long, user_id long, ts_s long")
    right = spark.createDataFrame(
        [(7, 601, 1.0), (7, 890, 2.0), (7, 891, 3.0)],
        "user_id long, ts_s long, value double",
    )
    got = range_join(left, right, key="user_id", lo_s=0, hi_s=300)
    assert sorted(r.value for r in got.collect()) == [1.0, 2.0]


def test_partitioned_sink_prunes_scan(spark, tmp_path):
    """The partitioned layout must show up as PartitionFilters in the
    scan (planning-time directory pruning) — the mechanism that keeps
    100 TB queries from reading 100 TB."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.sources.catalog import load_table
    from mapreduce_implementation_spark.sources.sinks import (
        write_partitioned_dataset,
    )

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned_dataset(events, path, ["event_type"])

    back = spark.read.parquet(path).where(F.col("event_type") == "click")
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan
    assert back.count() == events.where(F.col("event_type") == "click").count()


def test_sessionize_custom_tie_break_column(spark):
    """sessionize() must work on inputs without an event_id column when
    a tie-break column is named (advisor finding)."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators.events import sessionize

    df = spark.createDataFrame(
        [(1, 100, "a"), (1, 100, "b"), (1, 5000, "c")],
        ["user_id", "ts", "row_key"],
    )
    out = sessionize(
        df.withColumn("ts", F.col("ts").cast("timestamp")),
        "user_id",
        "ts",
        gap_s=1800,
        tie_break_col="row_key",
    ).collect()
    by_key = {r.row_key: r.session_idx for r in out}
    assert by_key == {"a": 1, "b": 1, "c": 2}
