"""Table profiling and skew diagnosis — the look-before-you-shuffle
tools.

Both are single bounded passes. The reference engine has no profiling
surface (its only statistics are the per-task counts in the job log,
/root/reference/Scheduler.cc:233); these belong to the operational
extension set: before choosing shuffle partitions, bucket counts, or a
salting strategy for a 100 TB table, you profile it — and the naive
way (one query per column / per key) is a full scan per question.

* :func:`profile_table` — per-column null counts, approx distinct,
  min/max — computed as ONE aggregate pass: every metric is a
  mergeable partial (count_if / HLL++ / min / max), so the whole
  profile costs a single scan + one tiny partial-agg shuffle no matter
  how many columns.
* :func:`skew_report` — the top-N heaviest keys of a prospective
  shuffle/join key with their row share — a bounded groupBy + global
  TakeOrdered (N rows to the driver, never the key space). The number
  that tells you whether a join needs salting or an AQE skew hint
  BEFORE you run it at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# types where min/max are meaningful and cheaply comparable
_ORDERED_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "decimal", "date", "timestamp", "string",
)


def profile_table(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """One-pass per-column profile:
    ``DataFrame[column, dtype, n_rows, n_null, approx_distinct,
    min_value, max_value]`` (min/max as strings, NULL for unordered
    types like arrays/structs/binary; ``approx_distinct`` is HLL++ at
    relative error ``rsd``).

    All metrics for all columns ride ONE aggregate (mergeable
    partials), then a driver-side pivot of the single result row into
    per-column rows — the profile row count equals the column count,
    so the "collect" is the schema size, not data."""
    cols = df.dtypes
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, dtype in cols:
        c = F.col(f"`{name}`")
        aggs.append(F.count_if(c.isNull()).alias(f"__null__{name}"))
        aggs.append(
            F.approx_count_distinct(c, rsd).alias(f"__dist__{name}")
        )
        if dtype.startswith(_ORDERED_PREFIXES):
            aggs.append(F.min(c).cast("string").alias(f"__min__{name}"))
            aggs.append(F.max(c).cast("string").alias(f"__max__{name}"))
    row = df.agg(*aggs).collect()[0].asDict()
    out = [
        (
            name,
            dtype,
            int(row["__n"]),
            int(row[f"__null__{name}"]),
            int(row[f"__dist__{name}"]),
            row.get(f"__min__{name}"),
            row.get(f"__max__{name}"),
        )
        for name, dtype in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_null long, "
        "approx_distinct long, min_value string, max_value string",
    )


def skew_report(
    df: DataFrame, key_cols: list[str] | str, top_n: int = 20
) -> DataFrame:
    """The ``top_n`` heaviest values of a prospective shuffle key with
    absolute count and row share:
    ``DataFrame[<key_cols...>, n_rows, share]``.

    Plan: partial-agg groupBy on the key (map-side combine bounds the
    shuffle by distinct keys × partitions) + a global top-N
    (TakeOrdered — never a full sort), with the total row count folded
    in from the same aggregate's partials via a grand-total rollup.
    Reading it: a top key with share ≫ 1/shuffle_partitions is the
    straggler task of any groupBy/join on this key — salt it
    (wordcount_salted shows the two-stage shape), broadcast the other
    side, or cap it (the LSH miners' max_bucket), BEFORE burning a
    corpus-scale run to find out."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must name at least one column")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    # the grand total is a tiny second agg over the SAME counted
    # exchange (identical subtrees — Spark reuses the shuffle, so the
    # expensive scan+partial-agg pass runs once); broadcast as a
    # one-row scalar
    total = F.broadcast(
        counts.agg(F.sum("n_rows").alias("__total"))
    )
    return (
        counts.crossJoin(total)
        .select(
            *keys,
            "n_rows",
            (F.col("n_rows") / F.col("__total")).alias("share"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k) for k in keys])
        .limit(top_n)
    )
