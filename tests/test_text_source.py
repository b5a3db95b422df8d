"""Keyed text source fidelity: 1-based global line numbers in file
order, reference chunk ids, and the TRUE reference end-to-end — text
file in, per-reducer sorted .out files out."""

from __future__ import annotations

import collections

from mapreduce_implementation_spark.operators.core import map_reduce, wordcount_mapper
from mapreduce_implementation_spark.sources.sinks import write_reducer_files
from mapreduce_implementation_spark.sources.text_source import (
    read_text_keyed,
    with_chunk_id,
)

LINES = [
    "Apple Banana",
    "Cherry Apple Date",
    "",
    "Banana",
    "Elder Fig Grape Apple",
    "Cherry",
]


def _write_input(tmp_path) -> str:
    p = tmp_path / "input.txt"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_line_numbers_one_based_in_file_order(spark, tmp_path):
    df = read_text_keyed(spark, _write_input(tmp_path))
    rows = sorted(df.collect(), key=lambda r: r.line_no)
    assert [r.line_no for r in rows] == list(range(1, len(LINES) + 1))
    assert [r.text for r in rows] == LINES


def test_chunk_ids_match_reference_formula(spark, tmp_path):
    # chunk k covers lines (k-1)*cs+1 … k*cs (Worker.cc:128-137), 1-based
    df = with_chunk_id(read_text_keyed(spark, _write_input(tmp_path)), chunk_size=2)
    got = {r.line_no: r.chunk_id for r in df.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3}


def test_reference_job_end_to_end_from_text_file(spark, tmp_path):
    """The complete reference workload: chunked text file → seven-stage
    job → one sorted file per reducer."""
    src = read_text_keyed(spark, _write_input(tmp_path))
    result = map_reduce(src, mapper=wordcount_mapper("text"), num_reducers=3)
    files = write_reducer_files(
        result, str(tmp_path / "out"), job_name="job", num_reducers=3
    )
    assert len(files) == 3
    seen: collections.Counter[str] = collections.Counter()
    for f in files:
        words = []
        for line in open(f):
            w, c = line.rstrip("\n").rsplit(" ", 1)
            words.append(w)
            seen[w] += int(c)
        assert words == sorted(words)
    expect = collections.Counter(
        w for line in LINES for w in line.split(" ") if w != ""
    )
    assert seen == expect
