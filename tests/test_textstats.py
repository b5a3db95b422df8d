"""Behavioral tests for the repetition signals
(functions/textstats.top_token_count and the quality_features ratios)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_implementation_spark.functions import textstats as ts


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0].v


def test_top_token_count_longest_run(spark):
    toks = ts._lower_tokens("text")
    assert _one(spark, "a b a c a", ts.top_token_count(toks)) == 3
    assert _one(spark, "x y z", ts.top_token_count(toks)) == 1
    assert _one(spark, "", ts.top_token_count(toks)) == 0


def test_repetition_ratios(spark):
    f = ts.quality_features("text")
    got = _one(spark, "a a a a b", F.struct(
        f["distinct_token_ratio"].alias("d"), f["top_token_frac"].alias("t")
    ))
    assert got.d == 2 / 5
    assert got.t == 4 / 5


def test_empty_doc_ratios_are_zero(spark):
    f = ts.quality_features("text")
    got = _one(spark, "", F.struct(
        f["distinct_token_ratio"].alias("d"), f["top_token_frac"].alias("t")
    ))
    assert got.d == 0.0 and got.t == 0.0


def test_frequent_tokens_superset_guarantee(spark):
    """freqItems-backed heavy hitters: every token with frequency >
    support appears (one-sided guarantee); validation rejects bad
    support. Verified against exact counts on a crafted corpus."""
    from mapreduce_implementation_spark.functions import textstats as ts

    rows = [(i, "heavy " * 30 + f"rare{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.token for r in ts.frequent_tokens(df, support=0.2).collect()}
    # 'heavy' is 600 of 620 occurrences (0.97 > 0.2) -> must be present
    assert "heavy" in got

    # exact heavy set from true counts: result must be a superset
    from pyspark.sql import functions as F

    toks = df.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t")).where(
        F.col("t") != ""
    )
    total = toks.count()
    exact_heavy = {
        r.t
        for r in toks.groupBy("t").count().where(F.col("count") > 0.2 * total).collect()
    }
    assert exact_heavy <= got

    import pytest as _pytest

    with _pytest.raises(ValueError, match="support"):
        ts.frequent_tokens(df, support=0.0)


def test_quality_threshold_for_retention(spark):
    """The calibrated floor fed back into quality_gate keeps ~the
    requested fraction (>= target, ties inclusive; within sketch
    error) and is monotone in the target."""
    from mapreduce_implementation_spark.functions.textstats import (
        quality_gate,
        quality_threshold_for_retention,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    n = docs.where(F.col("text").isNotNull()).count()
    t70 = quality_threshold_for_retention(docs, 0.7)
    t30 = quality_threshold_for_retention(docs, 0.3)
    assert t30 >= t70  # keeping less demands a higher floor
    kept70 = quality_gate(docs, min_quality=t70).count()
    kept30 = quality_gate(docs, min_quality=t30).count()
    assert kept70 >= kept30
    # >= target (gate is >=, ties kept), and not wildly above unless
    # the score distribution is tie-heavy at the cutoff
    assert kept70 >= 0.65 * n, (kept70, n)
    assert kept30 >= 0.25 * n, (kept30, n)
    # full retention keeps every non-NULL doc
    t_all = quality_threshold_for_retention(docs, 1.0)
    assert quality_gate(docs, min_quality=t_all).count() == n
