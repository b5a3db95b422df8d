"""The seven-stage MapReduce programming model, as a parameterized
DataFrame pipeline.

Reference model (spec p.3 §4, Fig. 2; /root/reference/Worker.h:31-40):

    InputSplit → Map → Partition → (shuffle) → Sort → Group → Reduce → Output

The reference hard-codes each stage in C++ and the course demo grades
swapping them BY EDITING CODE ("sort key in descending order", "group by
the first charter" — spec p.8; seams marked ``//CHANGE ... FUNCTION
HERE`` at /root/reference/Worker.cc:211,234,266). This rebuild makes
every seam a *parameter*: a Column expression or callable, so each demo
variant is a one-argument change (SURVEY.md §7 step 2).

Stage mapping (SURVEY.md §2a):

    InputSplit  — the input DataFrame (sources/text_source.py for keyed
                  text; any DataFrame works)
    Map         — ``mapper``: DataFrame → DataFrame[key, value]
    Partition   — ``partition_expr``: key → reducer id in [0, R)
    Sort        — ``sort_key`` / ``ascending`` (observable output order)
    Group       — ``group_expr``: defaults to exact key equality
    Reduce      — ``agg_expr``: defaults to SUM(value)
    Output      — sinks.write_reducer_files (per-reducer sorted text)

Scale notes: Spark inserts a partial aggregation before the shuffle —
strictly better than the reference, which ships every raw (word, 1) pair
(/root/reference/Worker.cc:94-99). The ``partition_expr`` repartition is
only applied when per-reducer OUTPUT placement must be observable; for a
pure aggregation result it is skipped entirely (Catalyst picks shuffle
layout), because forcing R partitions at 100 TB would serialize the
reduce side onto R tasks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_implementation_spark.functions.text import first_char_bucket


def wordcount_mapper(
    text_col: str = "text",
    empty_token_policy: str = "drop",
) -> Callable[[DataFrame], DataFrame]:
    """The reference WordCount Map stage (/root/reference/Worker.cc:143-162).

    ``empty_token_policy``:
      * ``drop``     — drop ALL empty tokens (sane default; SURVEY.md Q1
                       decision).
      * ``faithful`` — reproduce the C++ exactly: inner empty tokens from
                       consecutive spaces are KEPT, only an empty
                       *trailing* token is dropped
                       (/root/reference/Worker.cc:150-158).
    """

    def mapper(df: DataFrame) -> DataFrame:
        arr = F.split(F.col(text_col), " ")
        if empty_token_policy == "drop":
            arr = F.filter(arr, lambda t: t != F.lit(""))
        elif empty_token_policy == "faithful":
            # Spark's split keeps a trailing empty element; the C++ loop
            # never emits it. Drop exactly the last element when empty.
            arr = F.when(
                (F.size(arr) > 0) & (F.element_at(arr, -1) == ""),
                F.slice(arr, 1, F.size(arr) - 1),
            ).otherwise(arr)
        else:
            raise ValueError(f"unknown empty_token_policy {empty_token_policy!r}")
        return df.select(F.explode(arr).alias("key")).withColumn("value", F.lit(1).cast("long"))

    return mapper


def map_reduce(
    df: DataFrame,
    *,
    mapper: Callable[[DataFrame], DataFrame],
    num_reducers: int,
    partition_expr: Callable[[Column, int], Column] | None = None,
    group_expr: Column | None = None,
    agg_expr: Column | None = None,
    sort_key: str | Column = "key",
    ascending: bool = True,
) -> DataFrame:
    """Run the full seven-stage model; returns
    DataFrame[reducer_id int, key, value] sorted within each reducer.

    Defaults reproduce the reference job: first-char ``pmod`` partitioner
    (Q2-safe, /root/reference/Worker.cc:167), exact-key grouping, SUM
    reduce, ascending ASCII key order (/root/reference/Worker.cc:212-214).

    Demo variants are one-argument changes:
      * descending sort       → ``ascending=False``
      * group by first char   → ``group_expr=F.substring("key", 1, 1)``
      * different partitioner → ``partition_expr=lambda k, r: ...``
    """
    part = partition_expr or first_char_bucket
    mapped = mapper(df)
    grouped_key = (group_expr if group_expr is not None else F.col("key")).alias("key")
    agg = (agg_expr if agg_expr is not None else F.sum("value")).alias("value")
    reduced = (
        mapped.groupBy(grouped_key)
        .agg(agg)
        .withColumn("reducer_id", part(F.col("key"), num_reducers).cast("int"))
    )
    order = F.col(sort_key) if isinstance(sort_key, str) else sort_key
    order = order.asc() if ascending else order.desc()
    # Co-locate each reducer's rows, then sort inside the partition —
    # the observable contract: within one reducer, keys in order (Q4).
    return (
        reduced.repartition(num_reducers, F.col("reducer_id"))
        .sortWithinPartitions(F.col("reducer_id"), order)
        .select("reducer_id", "key", "value")
    )
