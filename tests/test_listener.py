"""Reference-format job log: event sequence, counts, and consistency
(format per /root/reference/Scheduler.cc, SURVEY.md §2b/Q5/Q6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_implementation_spark.listener import run_logged_wordcount
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_logged_wordcount_event_log(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("text")
    n_map_parts = docs.rdd.getNumPartitions()
    out_dir = str(tmp_path / "out")
    reduced = run_logged_wordcount(
        spark, docs, job_name="wc", num_reducers=4, output_dir=out_dir
    )

    log_path = f"{out_dir}/wc-log.out"
    rows = [line.rstrip("\n").split(",") for line in open(log_path)]
    events = [r[1] for r in rows]

    assert events[0] == "Start_Job"
    assert events[-1] == "FinishJob"  # Q5: code name, not Finish_Job
    assert events.count("Dispatch_MapTask") == n_map_parts
    assert events.count("Complete_MapTask") == n_map_parts
    assert events.count("Start_Shuffle") == 1
    assert events.count("Finish_Shuffle") == 1
    assert events.count("Dispatch_ReduceTask") == 4
    assert events.count("Complete_ReduceTask") == 4

    # timestamps are epoch-ms and non-decreasing (file is time-sorted)
    stamps = [int(r[0]) for r in rows]
    assert stamps == sorted(stamps) and stamps[0] > 1_000_000_000_000

    # Start_Shuffle carries the raw intermediate pair count — the
    # Worker.cc:94-99 counter: total tokens (empty-dropped) in the corpus
    shuffle_row = next(r for r in rows if r[1] == "Start_Shuffle")
    expected_pairs = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .count()
    )
    assert int(shuffle_row[2]) == expected_pairs

    # reduce task ids are 1-based in the log (Q6)
    red_ids = {int(r[2]) for r in rows if r[1] == "Dispatch_ReduceTask"}
    assert red_ids == {1, 2, 3, 4}

    # the returned DataFrame is the job result: total counts == pairs
    assert reduced.agg(F.sum("value")).collect()[0][0] == expected_pairs
