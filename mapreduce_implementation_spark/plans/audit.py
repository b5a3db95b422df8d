"""Physical-plan lint — the 100 TB anti-pattern detectors, reusable.

tests/test_plans.py gates specific queries on specific plan shapes;
this module is the SWEEP face: one audit over any DataFrame's physical
plan, applied to every registry query in tests/test_plan_audit.py so a
regression anywhere in the 50-query surface (a join collapsing to a
nested loop, a row-at-a-time Python UDF sneaking into a hot path, an
unbounded global sort) trips a test without anyone having written a
query-specific gate first.

Detectors flag SHAPES, not costs — each one names a pattern that stops
scaling at some multiple of the data, regardless of today's timings:

* ``cartesian`` / ``nested-loop`` — CartesianProduct or
  BroadcastNestedLoopJoin: the join degenerated to per-row scans of a
  whole side (the r2 range-join finding, now generalized).
* ``python-row-udf`` — BatchEvalPython: a row-at-a-time Python UDF
  (pickled per row). Arrow-batched surfaces (ArrowEvalPython,
  MapInPandas, FlatMapGroupsInPandas*, ...) are allowed: they are the
  sanctioned Python escape hatch (SURVEY.md §2c UDF row).
* ``global-sort`` — a Sort with global=true that is NOT the sort of a
  TakeOrderedAndProject: a full-data range exchange + total order.
  Legitimate for ordered OUTPUT (the per-reducer sink contract), so
  callers whitelist those; everything else should be
  sortWithinPartitions or top-k.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _walk_physical_nodes(jplan):
    """Yield every SparkPlan node reachable from ``jplan``, descending
    through the wrapper nodes that hide their subtree from
    ``children()``: AdaptiveSparkPlanExec (a LeafExecNode whose real
    plan is ``executedPlan()``), QueryStageExec shells (``plan()``),
    and ReusedExchangeExec (``child()``). Py4J calls only — no
    formatted-text parsing, so a Spark explain-format change cannot
    blind the detectors."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        yield node
        name = node.getClass().getSimpleName()
        # wrappers first: their subtree is NOT in children()
        if name == "AdaptiveSparkPlanExec":
            stack.append(node.executedPlan())
        elif name.endswith("QueryStageExec"):
            stack.append(node.plan())
        elif name == "ReusedExchangeExec":
            stack.append(node.child())
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def _audit_plan_tree(df: DataFrame) -> list[str]:
    findings: set[str] = set()
    for node in _walk_physical_nodes(df._jdf.queryExecution().executedPlan()):
        name = node.getClass().getSimpleName()
        if name == "CartesianProductExec":
            findings.add("cartesian")
        elif name == "BroadcastNestedLoopJoinExec":
            findings.add("nested-loop")
        elif name == "BatchEvalPythonExec":
            findings.add("python-row-udf")
        elif name == "SortExec":
            # SortExec.global is the real flag — no regex over
            # formatted text. ``global`` is a Python keyword, so go
            # through getattr. TakeOrderedAndProjectExec (the top-k
            # sort) is a different node and never reaches this branch.
            if getattr(node, "global")():
                findings.add("global-sort")
    return sorted(findings)


def audit_plan(df: DataFrame) -> list[str]:
    """Return the anti-pattern findings for ``df``'s physical plan
    (empty list = clean). Finding names are stable strings — callers
    whitelist by name per query.

    Primary implementation walks the physical-plan TREE (SortExec's
    ``global`` flag, node class names) — immune to explain-format
    drift across Spark versions. If the Py4J walk breaks on a future
    Spark (renamed accessor), fall back to the formatted-text regex so
    the sweep degrades rather than crashes; the detectors' self-test
    (tests/test_plan_audit.py::test_detectors_fire_on_known_bad_plans)
    catches either path going blind."""
    try:
        return _audit_plan_tree(df)
    except Exception:
        return _audit_plan_text(df)


def _audit_plan_text(df: DataFrame) -> list[str]:
    plan = explain_str(df)
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append("cartesian")
    if "BroadcastNestedLoopJoin" in plan:
        findings.append("nested-loop")
    if "BatchEvalPython" in plan:
        findings.append("python-row-udf")
    # global sorts: formatted explain lists "(n) Sort" tree nodes and a
    # details section "(n) Sort\nInput...\nArguments: [...], true, 0"
    # where the boolean is the global flag.
    for m in re.finditer(r"\(\d+\) Sort\b[^(]*?Arguments: \[[^\]]*\], (\w+),", plan, re.S):
        if m.group(1) == "true":
            findings.append("global-sort")
            break
    return findings
