"""Table profiling + skew diagnosis (operators/profile)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.profile import (
    profile_table,
    skew_report,
)

SF = "/root/testdata/sf0.001"


def test_profile_table_matches_direct_queries(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    prof = {r.column: r for r in profile_table(docs).collect()}
    assert set(prof) == set(docs.columns)
    n = docs.count()
    for name in docs.columns:
        assert prof[name].n_rows == n
        assert prof[name].n_null == docs.where(
            F.col(name).isNull()
        ).count()
    # approx distinct within HLL++ error of exact
    exact_langs = docs.select("lang").distinct().count()
    assert abs(prof["lang"].approx_distinct - exact_langs) <= max(
        1, int(0.1 * exact_langs)
    )
    # min/max on an ordered column match exactly (string-cast)
    lo, hi = docs.agg(
        F.min("doc_id").cast("string"), F.max("doc_id").cast("string")
    ).collect()[0]
    assert (prof["doc_id"].min_value, prof["doc_id"].max_value) == (lo, hi)


def test_profile_single_pass_plan(spark):
    """The whole profile is ONE aggregate job — no per-column scans."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    profile_table(docs)
    after = len(tracker.getJobIdsForGroup(None) or [])
    # one agg job (+ possibly an AQE sub-job, never per-column)
    assert after - before <= 2, (before, after)


def test_skew_report_finds_planted_hot_key(spark):
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7))
        .otherwise(F.col("id"))
        .alias("k")
    )
    top = skew_report(df, "k", top_n=5).collect()
    assert top[0].k == 7
    assert top[0].n_rows == 9_000
    assert top[0].share == pytest.approx(0.9)
    # remaining keys are the cold singletons
    assert all(r.n_rows == 1 for r in top[1:])
    with pytest.raises(ValueError, match="key_cols"):
        skew_report(df, [])


def test_skew_report_composite_key(spark):
    df = spark.range(1_000).select(
        (F.col("id") % 4).alias("a"), (F.col("id") % 2).alias("b")
    )
    rows = skew_report(df, ["a", "b"], top_n=10).collect()
    assert len(rows) == 4  # (a%4, b%2) pairs collapse to 4 combos
    assert sum(r.n_rows for r in rows) == 1_000
    assert sum(r.share for r in rows) == pytest.approx(1.0)
