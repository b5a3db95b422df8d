"""Materialization barriers — pin nondeterministic partitioning so two
consumers of one frame cannot diverge.

``repartitionByRange`` samples its bounds with a per-execution seed: two
independent executions of the same exchange subtree may place
boundary-adjacent rows in DIFFERENT partitions. Any operator that (a)
derives driver-side state from a pass over the partitioned frame and
(b) re-reads the frame expecting the SAME partition cuts (contiguous
ids, the token-budget prefix sum) must put a barrier between the
exchange and its consumers. Exchange reuse cannot be relied on —
column pruning routinely gives the two branches non-``sameResult``
subtrees and Spark plans two independent samplings (verified on the
executed plan, see operators/ids.py docstring).

Two durability classes:

* ``local`` — ``localCheckpoint(eager=True)``: lineage truncated, rows
  stored in executor BLOCK storage. Cheapest (no serialization to an
  external FS) and the right default for interactive/bench scale. The
  failure mode at corpus scale: block storage is NOT reliable storage —
  executor loss or memory-pressure eviction of a checkpointed block
  kills the job (there is no lineage left to recompute from), and
  replication pressure on 100 TB of blocks competes with shuffle and
  cache memory.
* ``reliable`` — write-through parquet: the frame is written once to a
  real filesystem and read back. Costs one serialize/deserialize round
  trip but survives executor loss, never competes for block-storage
  memory, and the artifact is inspectable. Correctness note: callers
  must materialize every partition-derived value they need (e.g. a
  ``spark_partition_id()`` column) BEFORE the barrier — the read-back
  may split or coalesce files, so physical partition ids after a
  reliable barrier are meaningless; the stored COLUMN is the truth.
  Both call sites here follow that rule, so the two modes are
  result-identical (parity pytest-gated in tests/test_ids.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

BARRIER_MODES = ("local", "reliable")


def materialization_barrier(
    df: DataFrame, mode: str = "local", path: str | None = None
) -> DataFrame:
    """Materialize ``df`` so later consumers all read one frozen copy.

    ``mode="local"``: executor block storage (fast, not durable).
    ``mode="reliable"``: write-through parquet at ``path`` (a scratch
    directory cleaned at process exit when omitted)."""
    if mode == "local":
        return df.localCheckpoint(eager=True)
    if mode == "reliable":
        from mapreduce_implementation_spark.sources.materialize import (
            scratch_dir,
        )

        path = path or os.path.join(scratch_dir("mris_barrier_"), "data")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    raise ValueError(
        f"barrier mode must be one of {BARRIER_MODES}, got {mode!r}"
    )
