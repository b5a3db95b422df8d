"""Reference-shaped CLI job submission.

The reference's ONLY entry point is the 7-argument MPI binary
(/root/reference/hw4.cc:14-20; spec p.5):

    JOB_NAME NUM_REDUCER DELAY INPUT_FILENAME CHUNK_SIZE \
        LOCALITY_CONFIG_FILENAME OUTPUT_DIR

This module reproduces that workflow end-to-end on Spark:

    python -m mapreduce_implementation_spark JOB_NAME NUM_REDUCER DELAY \
        INPUT_FILENAME CHUNK_SIZE LOCALITY_CONFIG_FILENAME OUTPUT_DIR

* INPUT_FILENAME is read as keyed text lines in CHUNK_SIZE-line chunks
  (sources.text_source), restricted to the chunks the locality config
  lists (sources.locality; pass ``-`` to read everything — the
  convenience the reference lacks).
* The WordCount job runs through operators.core.map_reduce with the
  reference's first-char partitioner and NUM_REDUCER reducers.
* Output is one sorted ``<OUTPUT_DIR>/<JOB_NAME>-<r>.out`` per reducer
  (1-based, empty files kept) plus the reference-format event log
  ``<JOB_NAME>-log.out`` (listener.py — the AppStatusStore variant:
  the job runs exactly ONCE, task times/ranks/pair counts come from
  Spark's own listener-bus instrumentation; Start_Shuffle is the
  post-combine shuffle record count, the documented divergence from
  the combiner-less reference. ``run_logged_wordcount`` remains the
  raw-count fidelity shim).
* DELAY is the reference's simulated remote-read sleep — recorded in
  the Start_Job log line, not actually slept (Spark's scheduler owns
  task placement; SURVEY.md §4).
"""

from __future__ import annotations

import sys

USAGE = (
    "usage: python -m mapreduce_implementation_spark JOB_NAME NUM_REDUCER "
    "DELAY INPUT_FILENAME CHUNK_SIZE LOCALITY_CONFIG_FILENAME OUTPUT_DIR"
)


def main(argv: list[str]) -> int:
    if len(argv) != 7:
        print(USAGE, file=sys.stderr)
        return 2
    job_name = argv[0]
    num_reducer = int(argv[1])
    delay = int(argv[2])
    input_filename = argv[3]
    chunk_size = int(argv[4])
    locality_config = argv[5]
    output_dir = argv[6]
    if num_reducer < 1 or chunk_size < 1:
        print(USAGE, file=sys.stderr)
        return 2

    from mapreduce_implementation_spark import get_spark
    from mapreduce_implementation_spark.listener import (
        run_listener_logged_wordcount,
    )
    from mapreduce_implementation_spark.sources.locality import (
        parse_locality_config,
        restrict_to_chunks,
    )
    from mapreduce_implementation_spark.sources.text_source import (
        read_text_keyed,
        with_chunk_id,
    )

    spark = get_spark(app_name=job_name)
    keyed = with_chunk_id(
        read_text_keyed(spark, input_filename), chunk_size=chunk_size
    )
    if locality_config != "-":
        workers = max(spark.sparkContext.defaultParallelism, 1)
        config = parse_locality_config(spark, locality_config, worker_num=workers)
        keyed = restrict_to_chunks(keyed, config)
    files = run_listener_logged_wordcount(
        spark,
        keyed,
        job_name=job_name,
        num_reducers=num_reducer,
        output_dir=output_dir,
        input_label=input_filename,
        delay=delay,
        chunk_size=chunk_size,
        locality_label=locality_config,
    )
    for f in files:
        print(f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
