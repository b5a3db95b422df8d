"""Locality-config-driven chunk selection — the reference scheduler's
input contract.

Reference (/root/reference/Scheduler.cc:86-100; spec p.5): the locality
config file has one ``<chunkID> <nodeID>`` line per chunk; a node id
outside the worker range is normalized with ``node %= worker_num``; and
the JOB READS ONLY THE CHUNKS THE CONFIG LISTS — the input is
``chunk_size × #locality_entries`` lines, not necessarily the whole
file.

Spark mapping: the config is a tiny table → parse it into a DataFrame
and restrict the keyed input with a BROADCAST join on ``chunk_id`` (no
shuffle of the big side; the filter rides the scan). Node ids don't pin
Spark tasks (locality is the cluster manager's concern, SURVEY.md §4) —
they are carried as data so the reference's dispatch log/output can be
reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_locality_config(
    spark: SparkSession, path: str, worker_num: int
) -> DataFrame:
    """Parse ``<chunkID> <nodeID>`` lines → DataFrame[chunk_id long,
    node_id int].

    ``node %= worker_num`` per the reference (C++ ``%`` on the config's
    non-negative ids ≡ ``pmod``, which also stays in-range for hostile
    negative input — the Q2-safe choice)."""
    raw = spark.read.text(path)
    parts = F.split(F.trim(F.col("value")), r"\s+")
    return (
        raw.where(F.trim(F.col("value")) != "")
        .select(
            parts.getItem(0).cast("long").alias("chunk_id"),
            F.pmod(parts.getItem(1).cast("int"), F.lit(worker_num)).alias(
                "node_id"
            ),
        )
    )


def restrict_to_chunks(keyed_chunked: DataFrame, config: DataFrame) -> DataFrame:
    """Keep only the lines whose ``chunk_id`` the locality config lists
    (inner broadcast join — config is R-ish rows; adds ``node_id``)."""
    return keyed_chunked.join(F.broadcast(config), "chunk_id")
