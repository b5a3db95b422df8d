"""Physical-plan quality gates — the 100 TB design checks, asserted.

These read .explain() output: a correct-but-unscalable plan fails here
even when values match the oracle.
"""

from __future__ import annotations

from mapreduce_implementation_spark.plans import all_queries


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark, oracle_sf_dir):
    df = all_queries()["filter_pushdown_scan"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThanOrEqual(l_quantity" in plan, plan
    # projection pruned to the 4 selected columns at the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "l_comment" not in read_schema[0]
    assert "l_extendedprice" in read_schema[0] and "l_discount" not in read_schema[0]


def test_star_join_is_broadcast(spark, oracle_sf_dir):
    df = all_queries()["revenue_by_nation"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dims must broadcast, not shuffle"


def test_q1_partial_aggregation(spark, oracle_sf_dir):
    df = all_queries()["tpch_q1_pricing_summary"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    # partial (map-side) aggregate before the exchange
    assert "HashAggregate" in plan
    assert plan.index("HashAggregate") != plan.rindex("HashAggregate")


def test_global_topk_avoids_full_sort(spark, oracle_sf_dir):
    df = all_queries()["topk_global_orders"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_wordcount_prunes_to_text_column(spark, oracle_sf_dir):
    df = all_queries()["wordcount"].fn(spark, oracle_sf_dir)
    plan = explain_str(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" in read_schema[0]
    assert "doc_id" not in read_schema[0] and "lang" not in read_schema[0]
