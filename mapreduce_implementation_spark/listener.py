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
    os.makedirs(output_dir, exist_ok=True)
    log_path = os.path.join(output_dir, f"{job_name}-log.out")
    with open(log_path, "w") as fh:
        for ts, body in sorted(lines, key=lambda x: x[0]):
            fh.write(f"{ts},{body}\n")
    return reduced
