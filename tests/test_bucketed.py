"""sources/bucketed.py — co-located bucketed tables elide the join
shuffle (and, with sorted buckets, the join sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.sources.bucketed import (
    read_bucketed_table,
    write_bucketed_table,
)
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed_table(
        orders, "t_orders_b", str(tmp_path / "orders_b"), ["o_orderkey"], 8
    )
    write_bucketed_table(
        li, "t_lineitem_b", str(tmp_path / "li_b"), ["l_orderkey"], 8
    )
    yield orders, li
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_exchange_and_matches_plain(spark, bucketed_pair):
    orders, li = bucketed_pair
    bo = read_bucketed_table(spark, "t_orders_b")
    bl = read_bucketed_table(spark, "t_lineitem_b")
    # at sf0.001 the planner would broadcast (and rightly disable the
    # bucketed read — co-location buys nothing there); the MERGE hint
    # forces the fact⋈fact shape this layout exists for
    joined = bl.hint("merge").join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the whole point: NO shuffle on either side, and the sorted
    # buckets feed the merge join without a per-task sort either
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    want = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("q"),
        )
        .collect()[0]
    )
    got = (
        joined.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("q"),
        )
        .collect()[0]
    )
    assert (got.n, got.q) == (want.n, want.q) and got.n > 0


def test_bucketed_aggregate_skips_exchange(spark, bucketed_pair):
    """A groupBy on the bucket key reads pre-clustered data — no
    exchange before the aggregate either."""
    bl = read_bucketed_table(spark, "t_lineitem_b")
    agg = bl.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_path_read_loses_bucketing_documented(spark, bucketed_pair, tmp_path):
    """The documented trap: a path read sees plain parquet files and
    the join shuffles again — readers must use the catalog."""
    bo = read_bucketed_table(spark, "t_orders_b")
    plain = spark.read.parquet(str(tmp_path / "li_b"))
    joined = plain.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_n_buckets_validated(spark):
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed_table(
            load_table(spark, SF, "orders"), "t_bad", "/tmp/x", ["o_orderkey"], 0
        )
