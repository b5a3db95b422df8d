"""Sequence packing — greedy bin-packing of documents/chunks into
fixed token budgets, the step that turns a chunked corpus into dense
training sequences (padding waste -> ~0).

Packing is inherently sequential-greedy, so it cannot be a Column
expression; the Spark-first shape is bounded-state parallelism:

* rows are hash-bucketed by key into ``n_buckets`` independent groups
  (deterministic — same reason as operators/sampling: retry-stable,
  layout-independent);
* each bucket is packed INDEPENDENTLY with first-fit-decreasing via
  ``applyInPandas`` (Arrow-batched, one pass, O(bucket) memory);
* pack ids are globally unique without coordination:
  ``bucket * 2^32 + local_idx``.

At 100 TB: bucket count scales with the cluster (each bucket's rows
must fit one task's memory — metadata only, id + token count, not the
text); per-bucket FFD loses at most one partially-filled bin per
bucket vs global FFD, i.e. waste is bounded by
``n_buckets × budget`` tokens TOTAL — noise at corpus scale. No
global sort, no driver state, one shuffle (the bucket groupBy).

The reference has no packing surface; this is part of the
LLM-pipeline extension set (operators/chunking.py produces the
natural input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.sampling import hash_bucket

_PACK_STRIDE = 1 << 32


def pack_greedy(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """Assign every row to a pack of total size <= ``budget`` tokens.

    Returns DataFrame[key_col, tokens_col, pack_id long, pack_slot int]
    — every input row appears exactly once; ``pack_slot`` is the 0-based
    position within its pack (FFD insertion order). Rows LARGER than the
    budget get a dedicated oversize pack of their own (callers chunk
    first — operators/chunking — so these are rare); they never share.

    First-fit-decreasing within each hash bucket: rows sorted by token
    count descending (key ascending as tie-break, so packing is a pure
    function of the bucket's row set), each placed in the first open
    pack with room, else a new pack. FFD guarantees <= (11/9)·OPT + 1
    packs per bucket (classic bound) with one linear scan over sorted
    rows."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")

    import pandas as pd

    out_schema = (
        f"{key_col} long, {tokens_col} long, pack_id long, pack_slot int"
    )

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_bucket"].iloc[0])
        rows = pdf[[key_col, tokens_col]].sort_values(
            by=[tokens_col, key_col], ascending=[False, True]
        )
        base = bucket * _PACK_STRIDE
        open_packs: list[int] = []  # remaining capacity per local pack
        assign_pack: list[int] = []
        assign_slot: list[int] = []
        fill_counts: list[int] = []  # rows already in each pack
        for tok in rows[tokens_col]:
            t = int(tok)
            placed = -1
            if t <= budget:
                for i, cap in enumerate(open_packs):
                    if cap >= t:
                        placed = i
                        break
            if placed < 0:
                open_packs.append(budget - t if t <= budget else 0)
                fill_counts.append(0)
                placed = len(open_packs) - 1
            else:
                open_packs[placed] -= t
            assign_pack.append(base + placed)
            assign_slot.append(fill_counts[placed])
            fill_counts[placed] += 1
        return pd.DataFrame(
            {
                key_col: rows[key_col].to_numpy(),
                tokens_col: rows[tokens_col].to_numpy(),
                "pack_id": assign_pack,
                "pack_slot": assign_slot,
            }
        )

    return (
        df.select(key_col, tokens_col)
        .withColumn("_bucket", hash_bucket(key_col, salt) % F.lit(n_buckets))
        .groupBy("_bucket")
        .applyInPandas(pack_bucket, schema=out_schema)
    )


def pack_stats(packed: DataFrame, tokens_col: str, budget: int) -> DataFrame:
    """Per-pack accounting: rows, tokens, utilization — the number a
    pipeline owner watches (padding waste = 1 - avg utilization)."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_rows"),
        F.sum(tokens_col).alias("n_tokens"),
        (F.sum(tokens_col) / F.lit(budget)).alias("utilization"),
    )
