"""Locality-config chunk selection (reference Scheduler.cc:86-100):
parse "<chunkID> <nodeID>" lines, normalize node %= worker_num, and
restrict the job's input to exactly the listed chunks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_implementation_spark.sources.locality import (
    parse_locality_config,
    restrict_to_chunks,
)
from mapreduce_implementation_spark.sources.text_source import (
    read_text_keyed,
    with_chunk_id,
)


def test_parse_normalizes_node_ids(spark, tmp_path):
    """The reference applies ``node %= worker_num`` to config node ids
    that exceed the worker count."""
    cfg = tmp_path / "locality.cfg"
    cfg.write_text("1 0\n2 5\n3 12\n\n4 3\n")
    out = {
        r.chunk_id: r.node_id
        for r in parse_locality_config(spark, str(cfg), worker_num=4).collect()
    }
    assert out == {1: 0, 2: 1, 3: 0, 4: 3}


def test_restricts_input_to_listed_chunks(spark, tmp_path):
    """A job reads chunk_size × #locality_entries lines — NOT the whole
    file (spec p.5)."""
    text = tmp_path / "input.txt"
    lines = [f"word{i}" for i in range(1, 21)]  # 20 lines, chunk_size 5 → 4 chunks
    text.write_text("\n".join(lines) + "\n")
    cfg = tmp_path / "locality.cfg"
    cfg.write_text("1 0\n3 7\n")  # chunks 1 and 3 only
    keyed = with_chunk_id(read_text_keyed(spark, str(text)), chunk_size=5)
    config = parse_locality_config(spark, str(cfg), worker_num=4)
    got = restrict_to_chunks(keyed, config).orderBy("line_no").collect()
    assert [r.line_no for r in got] == [1, 2, 3, 4, 5, 11, 12, 13, 14, 15]
    assert {r.chunk_id for r in got} == {1, 3}
    assert {r.node_id for r in got} == {0, 3}  # 7 % 4 = 3


def test_locality_join_is_broadcast(spark, tmp_path):
    """The restriction must broadcast the tiny config, never shuffle the
    big side."""
    text = tmp_path / "input.txt"
    text.write_text("\n".join("x" for _ in range(10)) + "\n")
    cfg = tmp_path / "locality.cfg"
    cfg.write_text("1 0\n")
    keyed = with_chunk_id(read_text_keyed(spark, str(text)), chunk_size=5)
    config = parse_locality_config(spark, str(cfg), worker_num=2)
    plan = restrict_to_chunks(keyed, config)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
