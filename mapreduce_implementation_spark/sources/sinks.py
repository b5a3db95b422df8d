"""Sinks — the reference's per-reducer output files, Spark-first.

Reference Output stage (/root/reference/Worker.cc:267-274): one text
file per reduce task named ``<output_dir><job_name>-<reducerID+1>.out``
(1-based — SURVEY.md Q6), each line ``word count``, keys ascending
within the file (Q4).

Spark mapping: ``write.partitionBy("reducer_id")`` gives one directory
per reducer; because the frame is repartitioned BY reducer_id first,
every reducer's rows live in exactly one task → exactly one file per
directory, already sorted (sortWithinPartitions upstream). A final
driver-side rename (R files, R small) produces the reference layout.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-layout partitioned parquet dataset — the 100 TB table
    layout: a filter on a partition column prunes whole directories at
    planning time (PartitionFilters in the scan), so queries read the
    partitions they touch, not the table.

    Choose partition columns with bounded cardinality (date, type,
    tenant) — one directory per value per write; high-cardinality keys
    belong in bucketing or sort order, not partitioning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_reducer_files(
    result: DataFrame,
    output_dir: str,
    job_name: str,
    sep: str = " ",
    num_reducers: int | None = None,
) -> list[str]:
    """Write DataFrame[reducer_id, key, value] (already partitioned and
    sorted by operators.core.map_reduce) as reference-layout files.

    Pass ``num_reducers`` to also materialize EMPTY files for reducers
    that received no keys — the reference writes one file per reduce
    task unconditionally (/root/reference/Worker.cc:267-274).

    Returns the list of files written, in reducer order.
    """
    staging = os.path.join(output_dir, f"_{job_name}_staging")
    (
        result.withColumn("line", F.concat_ws(sep, F.col("key"), F.col("value")))
        .select("reducer_id", "line")
        .write.mode("overwrite")
        .partitionBy("reducer_id")
        .text(staging)
    )
    by_rid: dict[int, str] = {}
    for d in glob.glob(os.path.join(staging, "reducer_id=*")):
        rid = int(d.rsplit("=", 1)[1])
        parts = sorted(glob.glob(os.path.join(d, "part-*")))
        # one partition per reducer_id upstream → exactly one part file
        out_path = os.path.join(output_dir, f"{job_name}-{rid + 1}.out")
        with open(out_path, "wb") as out:
            for p in parts:
                with open(p, "rb") as src:
                    shutil.copyfileobj(src, out)
        by_rid[rid] = out_path
    if num_reducers is not None:
        for rid in range(num_reducers):
            if rid not in by_rid:
                out_path = os.path.join(output_dir, f"{job_name}-{rid + 1}.out")
                open(out_path, "wb").close()
                by_rid[rid] = out_path
    shutil.rmtree(staging)
    # numeric reducer order (lexicographic dir order would give 1,10,11,2…)
    return [by_rid[rid] for rid in sorted(by_rid)]
