"""DuckDB parity gates OUTSIDE the 50-slot driver registry — the same
compare as the driver, just pytest-run. Two kinds live here: queries
demoted from the registry in round 7 (to make room for the LLM-pipeline
layer — the operators stay fully exercised, only the driver-sweep slot
moved), and coverage queries that never had a slot (FULL OUTER join:
every slot is taken by a non-overlapping operator)."""

from __future__ import annotations

import pytest

from mapreduce_implementation_spark.oracle import compare, run_oracle
from mapreduce_implementation_spark.plans import dedup_queries as dq
from mapreduce_implementation_spark.plans import multimodal_queries as mq
from mapreduce_implementation_spark.plans import pipeline_queries as pq
from mapreduce_implementation_spark.plans import relational_queries as rq
from mapreduce_implementation_spark.plans import textstats_queries as tq

DEMOTED = [
    (mq.multimodal_catalog, mq.MULTIMODAL_CATALOG_ORACLE),
    (dq.embedding_near_dup_pairs, dq.EMBEDDING_NEAR_DUP_ORACLE),
    (rq.window_running_customer_spend, rq.WINDOW_RUNNING_ORACLE),
    (rq.rollup_order_status_priority, rq.ROLLUP_ORDERS_ORACLE),
    (dq.simhash_signatures, dq.SIMHASH_SIG_ORACLE),
    (tq.doc_fingerprints, tq.DOC_FINGERPRINTS_ORACLE),
    (rq.full_outer_bucket_counts, rq.FULL_OUTER_ORACLE),
    (rq.small_quantity_revenue, rq.SMALL_QTY_REVENUE_ORACLE),
    (rq.tpch_q5_local_supplier_volume, rq.TPCH_Q5_ORACLE),
    (rq.window_navigation_orders, rq.WINDOW_NAVIGATION_ORACLE),
    (dq.minhash_cross_near_dup_parity, dq.MINHASH_CROSS_ORACLE),
    (rq.cube_lineitem_flags, rq.CUBE_LINEITEM_ORACLE),
    (rq.set_ops_customer_cohorts, rq.SET_OPS_ORACLE),
    (tq.corpus_stats_by_lang, tq.CORPUS_STATS_ORACLE),
    (pq.stratified_fixed_n_parity, pq.STRATIFIED_FIXED_N_ORACLE),
    (rq.filter_pushdown_scan, rq.FILTER_PUSHDOWN_ORACLE),
    (rq.tpch_q4_order_priority, rq.TPCH_Q4_ORACLE),
    (rq.tpch_q10_returned_items, rq.TPCH_Q10_ORACLE),
    (rq.tpch_q13_customer_distribution, rq.TPCH_Q13_ORACLE),
    (rq.contiguous_row_ids_orders, rq.CONTIGUOUS_IDS_ORACLE),
    (dq.semantic_dedup_slice_parity, dq.SEMANTIC_SLICE_ORACLE),
]


@pytest.mark.parametrize("fn,oracle", DEMOTED, ids=lambda p: getattr(p, "__name__", ""))
def test_demoted_query_matches_oracle(spark, sf_dir, fn, oracle):
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(sf_dir, oracle)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{fn.__name__}: " + " | ".join(map(str, problems))


def test_slice_projection_weights_pinned(spark):
    """SEMANTIC_SLICE_ORACLE inlines the slice projection's
    per-dimension weights as literals (DuckDB has no xxhash64); this
    re-evaluates the Spark expression the operator actually uses
    (operators/semantic._slice_projection) so any drift in the hash,
    the seed string, or the modulus breaks HERE, not silently in the
    parity compare."""
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(len(dq._SLICE_W) - 1)),
                lambda j: F.xxhash64(F.lit("semslice"), j) % 1_000_001,
            ).alias("w")
        )
        .head()
    )
    assert [int(x) for x in row.w] == dq._SLICE_W
