"""Plan-lint sweep: audit_plan over EVERY registry query — a plan
regression anywhere in the 50-query surface trips here without a
query-specific gate having been written first (plans/audit.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.plans import all_queries
from mapreduce_implementation_spark.plans.audit import audit_plan

SF = "/root/testdata/sf0.001"

# Findings that are DELIBERATE for specific queries, each with its why.
WHITELIST: dict[str, set[str]] = {
    # one-row aggregate summaries composed with crossJoin — a 1×1
    # broadcast nested loop is the cheapest possible join
    "pack_invariants": {"nested-loop"},
    "pipeline_sample_dedup_chunk_pack": {"nested-loop"},
    # brute-force exact top-k IS a broadcast nested-loop scoring pass
    # (tiny query set × corpus scan) — the ANN variants exist for scale
    "similarity_topk_bruteforce": {"nested-loop"},
    # same brute-force scorer fed by the stub embedder (the
    # inference→similarity composition row)
    "embed_similarity_topk": {"nested-loop"},
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_registry_plan_is_clean(spark, name):
    q = all_queries()[name]
    findings = set(audit_plan(q.fn(spark, SF)))
    allowed = WHITELIST.get(name, set())
    assert findings <= allowed, (
        f"{name}: unexpected plan anti-patterns {sorted(findings - allowed)}"
    )


def _demoted_fns():
    from tests.test_demoted_oracles import DEMOTED

    return [fn for fn, _ in DEMOTED]


@pytest.mark.parametrize(
    "fn", _demoted_fns(), ids=lambda f: getattr(f, "__name__", "")
)
def test_demoted_plan_is_clean(spark, fn):
    """The pytest-parity queries get the same lint as the registry."""
    findings = set(audit_plan(fn(spark, SF)))
    allowed = WHITELIST.get(fn.__name__, set())
    assert findings <= allowed, (
        f"{fn.__name__}: unexpected plan anti-patterns "
        f"{sorted(findings - allowed)}"
    )


def test_detectors_fire_on_known_bad_plans(spark):
    """Each detector must actually detect its pattern — audited on
    constructed plans, so a silent regex rot can't hollow the sweep."""
    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")

    # tiny frames broadcast into a BNLJ; the shuffle_replicate_nl hint
    # forces the genuine CartesianProduct operator
    assert "cartesian" in audit_plan(a.crossJoin(b.hint("shuffle_replicate_nl")))

    nl = a.join(b, F.col("x") < F.col("y"))  # non-equi -> BNLJ
    assert "nested-loop" in audit_plan(nl)

    from pyspark.sql.types import LongType

    slow = F.udf(lambda v: v + 1, LongType())  # row-at-a-time
    assert "python-row-udf" in audit_plan(a.select(slow("x")))

    # sort on a DERIVED column: a plain orderBy("x") over range() is
    # eliminated by EliminateSorts (range output is already ordered)
    h = a.withColumn("k", F.pmod(F.col("x") * 37, F.lit(11)))
    assert "global-sort" in audit_plan(h.orderBy("k"))
    # top-k compiles to TakeOrderedAndProject, NOT a global sort
    assert "global-sort" not in audit_plan(h.orderBy("k").limit(5))
    # sortWithinPartitions is the sanctioned sort
    assert "global-sort" not in audit_plan(h.sortWithinPartitions("k"))


def test_tree_and_text_paths_both_fire(spark):
    """audit_plan walks the physical-plan TREE (SortExec.global via
    Py4J) with the formatted-text regex as a version-drift fallback.
    Pin BOTH paths independently: if the tree walk starts throwing (a
    renamed accessor on a Spark bump), audit_plan would silently fall
    back and this test's direct _audit_plan_tree call fails loudly;
    if the explain format drifts, the _audit_plan_text assertions
    fail."""
    from mapreduce_implementation_spark.plans.audit import (
        _audit_plan_text,
        _audit_plan_tree,
    )

    a = spark.range(100).withColumnRenamed("id", "x")
    h = a.withColumn("k", F.pmod(F.col("x") * 37, F.lit(11)))
    for impl in (_audit_plan_tree, _audit_plan_text):
        assert "global-sort" in impl(h.orderBy("k")), impl.__name__
        assert "global-sort" not in impl(h.orderBy("k").limit(5)), impl.__name__
    b = spark.range(100).withColumnRenamed("id", "y")
    nl = a.join(b, F.col("x") < F.col("y"))
    for impl in (_audit_plan_tree, _audit_plan_text):
        assert "nested-loop" in impl(nl), impl.__name__
    # the tree walk sees the RUNTIME plan: a sort AQE's
    # RemoveRedundantSorts eliminates (range() is already id-ascending)
    # must NOT be flagged — the regex over the initial formatted plan
    # is the stricter, pre-optimization view
    assert "global-sort" not in _audit_plan_tree(a.orderBy("x"))
