"""Sequence packing — greedy bin-packing of documents/chunks into
fixed token budgets, the step that turns a chunked corpus into dense
training sequences (padding waste -> ~0).

Packing is inherently sequential-greedy, so it cannot be a Column
expression; the Spark-first shape is bounded-state parallelism:

* rows are hash-bucketed by key into ``n_buckets`` independent groups
  (deterministic — same reason as operators/sampling: retry-stable,
  layout-independent);
* each bucket is packed INDEPENDENTLY with best-fit-decreasing via
  ``applyInPandas`` (Arrow-batched, one pass over sorted rows, open
  packs kept in a capacity-sorted list so each placement is a bisect —
  O(log P) compare cost instead of a linear scan over open packs);
* pack ids are globally unique without coordination:
  ``bucket * 2^32 + local_idx``.

Bucket sizing at 100 TB: each bucket's rows must fit one task's memory
— METADATA only (key + token count, ~16 bytes/row), not the text — and
stay small enough that the per-bucket sort/pack loop is task-sized.
Rule: ``rows_per_bucket <= ~100k`` (1.6 MB of Arrow payload, <100 ms
of packing). Pass ``rows_hint`` (corpus chunk count, even a rough
estimate) and ``n_buckets`` is derived from that rule; a 10^9-chunk
corpus gets ~10^4 buckets. The default 64 is sized for bench/test
corpora — at real scale ALWAYS pass ``rows_hint`` or an explicit
``n_buckets``.

Waste bound: per-bucket BFD loses at most one partially-filled bin per
bucket vs global BFD, i.e. waste is bounded by ``n_buckets × budget``
tokens TOTAL — noise at corpus scale. No global sort, no driver state,
one shuffle (the bucket groupBy).

The reference has no packing surface; this is part of the
LLM-pipeline extension set (operators/chunking.py produces the
natural input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

from mapreduce_implementation_spark.operators.sampling import hash_bucket

_PACK_STRIDE = 1 << 32
_ROWS_PER_BUCKET = 100_000  # sizing rule: one bucket = one task-sized pack job
_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)


def derive_n_buckets(rows_hint: int) -> int:
    """Bucket count from the rows_per_bucket <= ~100k sizing rule."""
    if rows_hint <= 0:
        raise ValueError(f"rows_hint must be positive, got {rows_hint}")
    return max(1, -(-rows_hint // _ROWS_PER_BUCKET))


def pack_greedy(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int | None = None,
    salt: str = "",
    rows_hint: int | None = None,
) -> DataFrame:
    """Assign every row to a pack of total size <= ``budget`` tokens.

    Returns DataFrame[key_col, tokens_col long, pack_id long,
    pack_slot int] — every input row appears exactly once; ``pack_slot``
    is the 0-based position within its pack (insertion order). The key
    column keeps its input type (integral or string — anything sortable
    and hashable). Rows LARGER than the budget get a dedicated oversize
    pack of their own (callers chunk first — operators/chunking — so
    these are rare); they never share.

    Best-fit-decreasing within each hash bucket: rows sorted by token
    count descending (key ascending as tie-break, so packing is a pure
    function of the bucket's row set), each placed in the open pack
    with the LEAST remaining capacity that still fits (ties -> lowest
    pack id, keeping the assignment deterministic), else a new pack.
    BFD shares FFD's <= (11/9)·OPT + 1 bound; the capacity-sorted open
    list makes each placement a bisect instead of a scan, so a bucket
    packs in O(n log n) regardless of how many packs stay open.

    ``n_buckets`` resolution: explicit value wins; else derived from
    ``rows_hint`` (rows_per_bucket <= ~100k — see module docstring);
    else 64 (bench/test scale).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets is None:
        # `is not None`, not truthiness: rows_hint=0 is a broken
        # upstream estimate and must raise via derive_n_buckets, not
        # silently fall back to the test-scale default
        n_buckets = (
            derive_n_buckets(rows_hint) if rows_hint is not None else 64
        )
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")

    key_type = df.schema[key_col].dataType
    if not isinstance(key_type, _INTEGRAL + (StringType,)):
        raise TypeError(
            f"key column {key_col!r} must be integral or string for "
            f"deterministic packing, got {key_type}"
        )
    tok_type = df.schema[tokens_col].dataType
    if not isinstance(tok_type, _INTEGRAL):
        raise TypeError(
            f"tokens column {tokens_col!r} must be integral, got {tok_type}"
        )

    import bisect

    import pandas as pd

    out_schema = StructType(
        [
            StructField(key_col, key_type),
            StructField(tokens_col, LongType()),
            StructField("pack_id", LongType()),
            StructField("pack_slot", IntegerType()),
        ]
    )

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_bucket"].iloc[0])
        rows = pdf[[key_col, tokens_col]].sort_values(
            by=[tokens_col, key_col], ascending=[False, True]
        )
        base = bucket * _PACK_STRIDE
        open_caps: list[tuple[int, int]] = []  # sorted (remaining, pack_idx)
        n_packs = 0
        fill_counts: list[int] = []  # rows already in each pack
        assign_pack: list[int] = []
        assign_slot: list[int] = []
        for tok in rows[tokens_col]:
            t = int(tok)
            placed = -1
            if t <= budget:
                # tightest open pack that still fits; (t, -1) sorts
                # before every (t, idx), so equal-capacity packs are
                # found and ties resolve to the lowest pack idx
                j = bisect.bisect_left(open_caps, (t, -1))
                if j < len(open_caps):
                    cap, placed = open_caps.pop(j)
                    if cap - t > 0:
                        bisect.insort(open_caps, (cap - t, placed))
            if placed < 0:
                placed = n_packs
                n_packs += 1
                fill_counts.append(0)
                if t <= budget and budget - t > 0:
                    bisect.insort(open_caps, (budget - t, placed))
                # oversize rows (t > budget) never enter the open list:
                # their pack is born full
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
        df.select(key_col, F.col(tokens_col).cast("long").alias(tokens_col))
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
