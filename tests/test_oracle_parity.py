"""Rehearse the driver's correctness gate: every registered query with an
oracle must match DuckDB exactly at the oracle scale factor."""

from __future__ import annotations

import pytest

from mapreduce_implementation_spark import plans
from mapreduce_implementation_spark.oracle import compare, run_oracle

ALL = plans.all_queries()
WITH_ORACLE = sorted(n for n, q in ALL.items() if q.oracle is not None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, oracle_sf_dir, name):
    q = ALL[name]
    spark_pdf = q.fn(spark, oracle_sf_dir).toPandas()
    oracle_pdf = run_oracle(oracle_sf_dir, q.oracle)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + " | ".join(map(str, problems))


def test_every_query_has_registry_entry():
    assert ALL, "registry is empty"
    for n, q in ALL.items():
        assert callable(q.fn), n
