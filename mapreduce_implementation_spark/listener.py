"""Reference-format job event log (SURVEY.md §2b "Event log").

Reproduces the CSV schema of the reference scheduler's log
(/root/reference/Scheduler.cc:80-84,138-144,168-169,181-182,197-198,
232-233,249-250; spec p.6), event names per the CODE, not the spec
(Q5: ``FinishJob``, no underscore):

    <epoch_ms>,Start_Job,<job>,<size>,<ncpus>,<R>,<delay>,<input>,<chunk_size>,<locality>,<outdir>
    <epoch_ms>,Dispatch_MapTask,<chunkID>,<rank>
    <epoch_ms>,Complete_MapTask,<chunkID>,<exe_seconds>
    <epoch_ms>,Start_Shuffle,<total_intermediate_pairs>
    <epoch_ms>,Finish_Shuffle,<seconds>
    <epoch_ms>,Dispatch_ReduceTask,<taskID+1>,<rank>     (1-based, Q6)
    <epoch_ms>,Complete_ReduceTask,<taskID+1>,<exe_seconds>
    <epoch_ms>,FinishJob,<total_seconds>

Instrumentation is REAL, not simulated: per-task start/end timestamps
and pair counts come from ``mapPartitionsWithIndex`` wrappers executing
inside the actual job (1 map partition ≙ 1 chunk, 1 reduce partition ≙
1 reduce task; "rank" ≙ partition % workers + 1 since Spark doesn't pin
tasks to nodes — locality is the scheduler's concern, SURVEY.md §4).

Approximation, documented: the reference separates shuffle (file
write + barrier) from reduce; Spark overlaps shuffle-read with the
reduce stage, so Finish_Shuffle is logged at the earliest reduce-task
start (= all map-side shuffle writes done).

Two implementations:

* ``run_logged_wordcount`` — the FIDELITY SHIM: caches the exploded
  (word, 1) frame and drives two ``mapPartitionsWithIndex`` collect
  passes, so Start_Shuffle carries the reference's exact raw
  intermediate-pair count (Worker.cc:94-99 — combiner-less token
  occurrences). Correct at reference scale; never reuse for real
  metrics.
* ``run_listener_logged_wordcount`` — the PRODUCTION-SHAPED variant:
  runs the real job ONCE (the actual file-writing action) inside a job
  group and reads per-task launch times, durations, executor ids, and
  shuffle record counts from the driver's ``AppStatusStore`` — the
  store a genuine ``SparkListener`` (AppStatusListener on the
  listener bus) populates for every job anyway. Zero extra jobs, zero
  caching, REAL executor attribution. Start_Shuffle here carries the
  map stage's shuffle-write record count, which is POST-COMBINE
  (Spark's partial aggregation — the documented upgrade over the
  combiner-less reference), so it is ≤ the shim's raw token count.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.core import map_reduce, wordcount_mapper


def _now_ms() -> int:
    return int(time.time() * 1000)


def _make_timed_partitions():
    """Executor-side wrapper: drain a partition, emit one stats row
    (partition_idx, start_ms, end_ms, n_rows). Factory → nested fn so
    the closure pickles by value (workers may not have this package on
    sys.path; see operators/multimodal.py)."""
    import time as _t

    def timed_partitions(idx: int, it: Iterator):
        start = int(_t.time() * 1000)
        n = 0
        for _ in it:
            n += 1
        yield (idx, start, int(_t.time() * 1000), n)

    return timed_partitions


def run_logged_wordcount(
    spark: SparkSession,
    df: DataFrame,
    *,
    job_name: str,
    num_reducers: int,
    output_dir: str,
    text_col: str = "text",
    input_label: str = "<dataframe>",
    delay: int = 0,
    chunk_size: int = 0,
    locality_label: str = "-",
) -> DataFrame:
    """Run the reference WordCount job with the reference's event log,
    written to ``<output_dir>/<job_name>-log.out``
    (/root/reference/Scheduler.cc:75). Returns the reduced
    DataFrame[reducer_id, key, value].
    """
    import os

    sc = spark.sparkContext
    workers = max(sc.defaultParallelism, 1)
    lines: list[tuple[int, str]] = []
    t_job = time.monotonic()
    # size ≙ MPI world size = workers + 1 jobtracker; delay/chunk_size/
    # locality are CLI-provided (0/"-" when run as a library — they are
    # MPI-harness artifacts with no Spark execution analog)
    lines.append(
        (
            _now_ms(),
            f"Start_Job,{job_name},{workers + 1},{workers},{num_reducers},{delay},"
            f"{input_label},{chunk_size},{locality_label},{output_dir}",
        )
    )

    timed = _make_timed_partitions()
    mapped = wordcount_mapper(text_col)(df).cache()
    map_stats = sorted(
        mapped.rdd.mapPartitionsWithIndex(timed).collect(),
        key=lambda s: s[1],
    )
    total_pairs = 0
    for idx, start, end, n in map_stats:
        rank = idx % workers + 1
        total_pairs += n
        lines.append((start, f"Dispatch_MapTask,{idx + 1},{rank}"))
        lines.append((end, f"Complete_MapTask,{idx + 1},{max((end - start) // 1000, 0)}"))

    t_shuffle = _now_ms()
    lines.append((t_shuffle, f"Start_Shuffle,{total_pairs}"))

    reduced = map_reduce(
        mapped,
        mapper=lambda d: d,  # already mapped (cached) — identity Map stage
        num_reducers=num_reducers,
    )
    red_stats = sorted(
        reduced.rdd.mapPartitionsWithIndex(timed).collect(),
        key=lambda s: s[1],
    )
    first_reduce_start = min((s[1] for s in red_stats), default=t_shuffle)
    lines.append(
        (first_reduce_start, f"Finish_Shuffle,{max((first_reduce_start - t_shuffle) // 1000, 0)}")
    )
    for idx, start, end, _n in red_stats:
        rank = idx % workers + 1
        lines.append((start, f"Dispatch_ReduceTask,{idx + 1},{rank}"))
        lines.append((end, f"Complete_ReduceTask,{idx + 1},{max((end - start) // 1000, 0)}"))
    mapped.unpersist()

    lines.append((_now_ms(), f"FinishJob,{int(time.monotonic() - t_job)}"))
    _write_log(output_dir, job_name, lines)
    return reduced


def _write_log(output_dir: str, job_name: str, lines: list) -> None:
    """Time-sorted reference-format CSV log at
    ``<output_dir>/<job_name>-log.out`` (/root/reference/Scheduler.cc:75)."""
    import os

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, f"{job_name}-log.out"), "w") as fh:
        for ts, body in sorted(lines, key=lambda x: x[0]):
            fh.write(f"{ts},{body}\n")


def _scala_seq(seq) -> list:
    """Materialize a py4j-wrapped scala Seq into a Python list."""
    return [seq.apply(i) for i in range(seq.size())]


def _task_rows(store, stage_id: int, attempt: int) -> list[dict]:
    """Per-task facts from the AppStatusStore: (index, launch_ms,
    end_ms, executor_id, shuffle_write_records). Only SUCCESSFUL
    attempts count — a failed or speculative attempt shares the task
    index and would double-count shuffle records, duplicate log lines,
    and break the one-task-per-reducer validation. Tasks missing a
    duration (still running / lost) are skipped — callers run AFTER
    the action returned, so completed jobs have complete metrics.

    Cost/retention bounds (by design — this is the reference-shaped
    log, a per-task CSV): extraction is ~7 py4j calls per task, and
    AppStatusListener retains at most spark.ui.retainedTasks (default
    100k) task rows per stage. Both are fine exactly where a per-task
    text log is sensible (up to ~10^4 tasks); the caller validates
    row counts against the stage's task count and refuses to emit a
    silently truncated log."""
    rows = []
    for td in _scala_seq(store.taskList(stage_id, attempt, 2_147_483_647)):
        if str(td.status()) != "SUCCESS":
            continue
        if not td.duration().isDefined():
            continue
        launch = td.launchTime().getTime()
        dur = int(td.duration().get())
        swr = 0
        if td.taskMetrics().isDefined():
            swr = int(td.taskMetrics().get().shuffleWriteMetrics().recordsWritten())
        rows.append(
            {
                "index": int(td.index()),
                "launch_ms": int(launch),
                "end_ms": int(launch) + dur,
                "executor_id": str(td.executorId()),
                "shuffle_write_records": swr,
            }
        )
    # one row per task INDEX (keep the earliest finisher): if a
    # speculative duplicate also reports SUCCESS, counting both would
    # double shuffle records and duplicate log lines
    by_index: dict[int, dict] = {}
    for r in rows:
        cur = by_index.get(r["index"])
        if cur is None or r["end_ms"] < cur["end_ms"]:
            by_index[r["index"]] = r
    return [by_index[i] for i in sorted(by_index)]


def run_listener_logged_wordcount(
    spark: SparkSession,
    df: DataFrame,
    *,
    job_name: str,
    num_reducers: int,
    output_dir: str,
    text_col: str = "text",
    input_label: str = "<dataframe>",
    delay: int = 0,
    chunk_size: int = 0,
    locality_label: str = "-",
) -> list[str]:
    """Reference-format event log from Spark's own task instrumentation
    (module docstring: the AppStatusStore variant). Runs the COMPLETE
    job — map_reduce + write_reducer_files — exactly once inside a job
    group, then reconstructs the log from the store:

    * map tasks  = the earliest stage of the group (the scan +
      tokenize + partial-agg stage); their shuffle-write record sum is
      the Start_Shuffle pair count (post-combine, see module note);
    * reduce tasks = the final stage (one task per reducer — the
      repartition(num_reducers) contract; validated, not assumed);
    * rank = the task's REAL executor id, densely renumbered 1-based in
      first-seen order (the reference's ranks are 1..workers; Spark's
      executor ids are strings — "driver" in local mode);
    * Start_Shuffle at the last map-task end, Finish_Shuffle at the
      first reduce-task launch (all map-side shuffle writes done —
      the same documented approximation as the shim).

    Returns the written output file list (reducer order). The log goes
    to ``<output_dir>/<job_name>-log.out`` — same path and grammar as
    the shim, so the two are drop-in interchangeable."""
    import os
    import uuid

    from mapreduce_implementation_spark.sources.sinks import write_reducer_files

    sc = spark.sparkContext
    workers = max(sc.defaultParallelism, 1)
    group = f"mris-log-{job_name}-{uuid.uuid4().hex[:8]}"
    t_job = time.monotonic()
    start_ms = _now_ms()

    reduced = map_reduce(
        df, mapper=wordcount_mapper(text_col), num_reducers=num_reducers
    )
    # save/restore the caller's thread-local job properties — a bare
    # null-out would clobber a caller-set job group (their
    # cancelJobGroup would stop matching) and leak this run's
    # description + interruptOnCancel onto every later job
    saved = {
        p: sc.getLocalProperty(p)
        for p in (
            "spark.jobGroup.id",
            "spark.job.description",
            "spark.job.interruptOnCancel",
        )
    }
    sc.setJobGroup(group, f"{job_name}: logged wordcount")
    try:
        files = write_reducer_files(
            reduced, output_dir, job_name, num_reducers=num_reducers
        )
    finally:
        for prop, val in saved.items():
            sc.setLocalProperty(prop, val)

    tracker = sc.statusTracker()
    stage_ids: list[int] = []
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is not None:
            stage_ids.extend(info.stageIds)
    store = sc._jsc.sc().statusStore()
    stages: dict[int, list[dict]] = {}
    for sid in sorted(set(stage_ids)):
        sinfo = tracker.getStageInfo(sid)
        if sinfo is None or sinfo.numCompletedTasks == 0:
            continue  # skipped / reused stages hold no tasks
        # AppStatusListener populates the store ASYNCHRONOUSLY on the
        # listener bus: right after the write action returns, task rows
        # can lag behind job completion (especially under load). Poll
        # briefly before concluding anything is missing, so the
        # retention refusal below only fires on genuine eviction, not
        # bus lag.
        deadline = time.monotonic() + 5.0
        rows = _task_rows(store, sid, sinfo.currentAttemptId)
        while len(rows) < sinfo.numTasks and time.monotonic() < deadline:
            time.sleep(0.05)
            rows = _task_rows(store, sid, sinfo.currentAttemptId)
        if len(rows) < sinfo.numTasks:
            # AppStatusStore retention (spark.ui.retainedTasks) evicted
            # task rows — a per-task log reconstructed from a subset
            # would silently undercount; refuse instead (the _task_rows
            # docstring states the applicability bound)
            raise RuntimeError(
                f"stage {sid}: only {len(rows)} of {sinfo.numTasks} task "
                "rows retained in the AppStatusStore (raise "
                "spark.ui.retainedTasks or use the fidelity shim for "
                "jobs this large)"
            )
        stages[sid] = rows
    if len(stages) < 2:
        raise RuntimeError(
            f"expected >= 2 executed stages (map + reduce) in job group "
            f"{group}, found {sorted(stages)} — did the action run?"
        )
    ordered = sorted(stages)
    # map stage = the EARLIEST stage that wrote shuffle records: a
    # broadcast-build job (e.g. the locality-config join side) can run
    # first but collects its result instead of shuffle-writing, so it
    # must not be mistaken for the map stage. Fallback: first stage.
    map_sid = next(
        (
            sid
            for sid in ordered
            if any(t["shuffle_write_records"] > 0 for t in stages[sid])
        ),
        ordered[0],
    )
    map_tasks = stages[map_sid]
    reduce_tasks = stages[ordered[-1]]
    if len(reduce_tasks) != num_reducers:
        raise RuntimeError(
            f"final stage has {len(reduce_tasks)} tasks, expected "
            f"{num_reducers} (one per reducer) — the repartition contract "
            "upstream changed"
        )

    ranks: dict[str, int] = {}

    def rank_of(executor_id: str) -> int:
        return ranks.setdefault(executor_id, len(ranks) + 1)

    lines: list[tuple[int, str]] = []
    lines.append(
        (
            start_ms,
            f"Start_Job,{job_name},{workers + 1},{workers},{num_reducers},"
            f"{delay},{input_label},{chunk_size},{locality_label},{output_dir}",
        )
    )
    total_pairs = 0
    for t in sorted(map_tasks, key=lambda t: t["launch_ms"]):
        total_pairs += t["shuffle_write_records"]
        rank = rank_of(t["executor_id"])
        exe_s = max((t["end_ms"] - t["launch_ms"]) // 1000, 0)
        lines.append((t["launch_ms"], f"Dispatch_MapTask,{t['index'] + 1},{rank}"))
        lines.append((t["end_ms"], f"Complete_MapTask,{t['index'] + 1},{exe_s}"))
    t_shuffle = max(t["end_ms"] for t in map_tasks)
    lines.append((t_shuffle, f"Start_Shuffle,{total_pairs}"))
    first_reduce = min(t["launch_ms"] for t in reduce_tasks)
    lines.append(
        (first_reduce, f"Finish_Shuffle,{max((first_reduce - t_shuffle) // 1000, 0)}")
    )
    for t in sorted(reduce_tasks, key=lambda t: t["launch_ms"]):
        rank = rank_of(t["executor_id"])
        exe_s = max((t["end_ms"] - t["launch_ms"]) // 1000, 0)
        lines.append((t["launch_ms"], f"Dispatch_ReduceTask,{t['index'] + 1},{rank}"))
        lines.append((t["end_ms"], f"Complete_ReduceTask,{t['index'] + 1},{exe_s}"))
    lines.append((_now_ms(), f"FinishJob,{int(time.monotonic() - t_job)}"))
    _write_log(output_dir, job_name, lines)
    return files
