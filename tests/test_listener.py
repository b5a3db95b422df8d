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


def test_listener_logged_wordcount_event_log(spark, tmp_path):
    """The AppStatusStore-backed variant (judge r7 item 5): same grammar
    and event sequence as the shim, but from Spark's own task
    instrumentation — no cached token frame, no extra collect jobs,
    real executor attribution. Start_Shuffle carries the POST-COMBINE
    shuffle-write record count (partial agg), bracketed below by the
    global distinct-word count and above by the raw token count."""
    from mapreduce_implementation_spark.listener import (
        run_listener_logged_wordcount,
    )

    docs = load_table(spark, SF, "documents").select("text")
    n_map_parts = docs.rdd.getNumPartitions()
    out_dir = str(tmp_path / "out_listener")
    files = run_listener_logged_wordcount(
        spark, docs, job_name="wcl", num_reducers=4, output_dir=out_dir
    )
    assert [f.rsplit("/", 1)[1] for f in files] == [
        f"wcl-{r}.out" for r in (1, 2, 3, 4)
    ]

    rows = [ln.rstrip("\n").split(",") for ln in open(f"{out_dir}/wcl-log.out")]
    events = [r[1] for r in rows]
    assert events[0] == "Start_Job"
    assert events[-1] == "FinishJob"  # Q5 spelling
    assert events.count("Dispatch_MapTask") == n_map_parts
    assert events.count("Complete_MapTask") == n_map_parts
    assert events.count("Start_Shuffle") == 1
    assert events.count("Finish_Shuffle") == 1
    assert events.count("Dispatch_ReduceTask") == 4
    assert events.count("Complete_ReduceTask") == 4

    stamps = [int(r[0]) for r in rows]
    assert stamps == sorted(stamps) and stamps[0] > 1_000_000_000_000

    # ranks are dense 1-based ints (real executor ids renumbered)
    ranks = {int(r[3]) for r in rows if r[1] in ("Dispatch_MapTask", "Dispatch_ReduceTask")}
    assert min(ranks) == 1 and max(ranks) <= len(ranks)

    # post-combine pair count: distinct words <= pairs <= raw tokens
    shuffle_row = next(r for r in rows if r[1] == "Start_Shuffle")
    pairs = int(shuffle_row[2])
    tokens = docs.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    raw = tokens.count()
    distinct = tokens.distinct().count()
    assert distinct <= pairs <= raw

    # reduce task ids 1-based (Q6)
    red_ids = {int(r[2]) for r in rows if r[1] == "Dispatch_ReduceTask"}
    assert red_ids == {1, 2, 3, 4}

    # the written files carry the full count (same sink contract)
    total = 0
    for p in files:
        with open(p) as fh:
            for line in fh:
                total += int(line.rsplit(" ", 1)[1])
    assert total == raw


class _FakeOpt:
    def __init__(self, v=None):
        self._v = v

    def isDefined(self):
        return self._v is not None

    def get(self):
        return self._v


class _FakeDate:
    def __init__(self, ms):
        self._ms = ms

    def getTime(self):
        return self._ms


class _FakeMetrics:
    def __init__(self, swr):
        self._swr = swr

    def shuffleWriteMetrics(self):
        return self

    def recordsWritten(self):
        return self._swr


class _FakeTask:
    def __init__(self, index, status="SUCCESS", launch=1000, dur=50, swr=10,
                 executor="driver"):
        self._i, self._s, self._l = index, status, launch
        self._d, self._swr, self._e = dur, swr, executor

    def index(self):
        return self._i

    def status(self):
        return self._s

    def launchTime(self):
        return _FakeDate(self._l)

    def duration(self):
        return _FakeOpt(self._d)

    def taskMetrics(self):
        return _FakeOpt(_FakeMetrics(self._swr))

    def executorId(self):
        return self._e


class _FakeStore:
    def __init__(self, tasks):
        self._tasks = tasks

    def taskList(self, *_):
        class _Seq:
            def __init__(self, xs):
                self._xs = xs

            def size(self):
                return len(self._xs)

            def apply(self, i):
                return self._xs[i]

        return _Seq(self._tasks)


def test_task_rows_filters_failures_and_dedups_speculative():
    """Review finding r8: a FAILED attempt and a speculative duplicate
    SUCCESS share the task index — only one successful row per index
    may survive (earliest finisher), or Start_Shuffle double-counts
    and the reduce-count validation breaks on any retry."""
    from mapreduce_implementation_spark.listener import _task_rows

    store = _FakeStore(
        [
            _FakeTask(0, status="FAILED", swr=999),
            _FakeTask(0, status="SUCCESS", launch=2000, dur=50, swr=10),
            _FakeTask(1, status="SUCCESS", launch=1000, dur=40, swr=7),
            # speculative duplicate of index 1, finishes later
            _FakeTask(1, status="SUCCESS", launch=1010, dur=80, swr=7),
            _FakeTask(2, status="KILLED", swr=999),
        ]
    )
    rows = _task_rows(store, 0, 0)
    assert [r["index"] for r in rows] == [0, 1]
    assert sum(r["shuffle_write_records"] for r in rows) == 17
    assert rows[1]["end_ms"] == 1040  # earliest finisher kept


def test_listener_log_restores_caller_job_properties(spark, tmp_path):
    """Review finding r8: the job-group wrapper must restore the
    caller's thread-local job group/description, not null them."""
    from mapreduce_implementation_spark.listener import (
        run_listener_logged_wordcount,
    )

    sc = spark.sparkContext
    sc.setJobGroup("caller-group", "caller work")
    try:
        docs = load_table(spark, SF, "documents").select("text")
        run_listener_logged_wordcount(
            spark, docs, job_name="wcp", num_reducers=2,
            output_dir=str(tmp_path / "outp"),
        )
        assert sc.getLocalProperty("spark.jobGroup.id") == "caller-group"
        assert sc.getLocalProperty("spark.job.description") == "caller work"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
