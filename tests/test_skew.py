"""Skew survival, demonstrated under gates — the first thing that kills
a 100 TB run is one hot key. Two guards, each with a failing-before /
passing-after shape:

* AQE skew-join: a deliberately skewed equi-join (one key ≥ 100× the
  median) is split by AQE at runtime — asserted from the FINAL adaptive
  plan (``skew=true`` on the join node), and asserted ABSENT when the
  guard is disabled.
* Salted two-stage aggregation: the (key, salt) stage bounds any single
  shuffle partition to ~hot/16, asserted by per-partition row counts —
  versus the plain key partitioning, where the hot key's partition
  carries its full frequency.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

PAY = "x" * 64


@pytest.fixture()
def skew_confs(spark):
    """Local-scale AQE skew thresholds (MBs instead of the 256 MB
    production default) + SMJ forced, restored after the test."""
    keys = [
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10240"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10240"),
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
    ]
    prev = {k: spark.conf.get(k, None) for k, _ in keys}
    for k, v in keys:
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _skewed_join(spark):
    """Hot key 0 at 30000 rows vs ~30 rows/key median — 1000× skew."""
    left = (
        spark.range(0, 30000)
        .select(F.lit(0).alias("key"), F.lit(PAY).alias("pay"))
        .union(
            spark.range(0, 6000).select(
                (F.col("id") % 200 + 1).alias("key"), F.lit(PAY).alias("pay")
            )
        )
    )
    right = spark.range(0, 201).select(F.col("id").alias("key"), F.lit(1).alias("r"))
    return left.join(right, "key")


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes the plan only on execution
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partition(skew_confs):
    plan = _final_plan(_skewed_join(skew_confs))
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan  # the hot partition was split


def test_skewed_join_unsplit_when_guard_disabled(skew_confs):
    """Failing-before twin: same data, same thresholds, guard off —
    the final plan keeps the monolithic hot partition (no skew=true),
    proving the assertion above detects the GUARD, not an accident of
    the fixture."""
    skew_confs.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    plan = _final_plan(_skewed_join(skew_confs))
    assert "isFinalPlan=true" in plan
    assert "skew=true" not in plan, plan


HOT_N, RARE_N, SALTS = 20000, 40, 16


def _skewed_words(spark):
    """'hot' at 20000 occurrences, 200 rare words at ~40 each (500×).

    Carries a globally unique per-row ``rid`` so the salting tests can
    derive the salt from a high-cardinality source. Salting by a
    low-cardinality column (e.g. a doc_id with only 64 distinct values)
    maps unevenly into SALTS buckets and does NOT bound the hot
    partition — that is the precondition documented on
    ``plans/text_queries.wordcount_salted``.
    """
    hot = spark.range(0, HOT_N).select(
        F.col("id").alias("rid"),
        (F.col("id") % 64).alias("doc_id"),
        F.lit("hot").alias("word"),
    )
    rare = spark.range(0, 200 * RARE_N).select(
        (F.col("id") + HOT_N).alias("rid"),
        (F.col("id") % 64).alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 200).cast("string")).alias("word"),
    )
    return hot.union(rare)


def _max_partition_rows(df, n_partitions, *cols) -> int:
    counted = (
        df.repartition(n_partitions, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return max(r.n for r in counted.collect())


def test_salting_bounds_partition_rows(spark):
    """The salted two-stage shape (plans/text_queries.wordcount_salted)
    under a partition-size gate: partitioning by bare key puts the hot
    word's ENTIRE frequency in one partition (the failing-before
    state); partitioning by (key, salt) bounds every partition to a
    few×hot/SALTS. This is what protects aggregations whose per-key
    state doesn't collapse map-side (collect_list/set, exact median)
    and any key-partitioned sort/write.

    The salt comes from the per-row unique ``rid`` (uniform across
    SALTS buckets); see _skewed_words for why a low-cardinality salt
    source would not bound anything.

    Collision math behind the bounds: salting splits the hot word into
    SALTS=16 groups of ~HOT_N/16=1250 rows, but groups then HASH into
    physical partitions — with only 32 partitions, several hot groups
    colliding into one partition is near-certain (the exact failure of
    the earlier ``<= HOT_N//4`` bound at 32). Salting widens the
    per-partition ceiling only if the partition count gives groups room
    to spread, so the salted stage repartitions to 256 (matching the
    plan guidance: scale partitions with the split factor), where the
    expected hot-group collisions per partition are ≪ 1 and
    ``2·HOT_N/SALTS`` (= one collision pair + rare-word noise) is a
    sound deterministic bound."""
    words = _skewed_words(spark).withColumn(
        "salt", F.pmod(F.hash("rid"), F.lit(SALTS))
    )
    plain_max = _max_partition_rows(words, 32, "word")
    salted_max = _max_partition_rows(words, 256, "word", "salt")
    assert plain_max >= HOT_N  # hot key lands whole in one partition
    assert salted_max <= 2 * HOT_N // SALTS, (plain_max, salted_max)
    assert salted_max <= plain_max // 3, (plain_max, salted_max)


def test_salted_wordcount_correct_on_skewed_corpus(spark):
    """On the skewed corpus, the two-stage salted aggregation still
    produces exact counts (the guard changes the plan, never the
    result)."""
    words = _skewed_words(spark)
    salted = (
        words.withColumn("salt", F.pmod(F.hash("rid"), F.lit(SALTS)))
        .groupBy("word", "salt")
        .agg(F.count(F.lit(1)).alias("partial_cnt"))
        .groupBy("word")
        .agg(F.sum("partial_cnt").alias("cnt"))
    )
    got = {(r.word, r.cnt) for r in salted.collect()}
    want = {(r.word, r.cnt) for r in words.groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == want
    assert ("hot", HOT_N) in got
