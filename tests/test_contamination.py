"""Behavioral tests for benchmark decontamination
(operators/contamination.ngram_contamination)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.contamination import (
    ngram_contamination,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overlap_counts_distinct_grams(spark):
    # benchmark holds exactly one trigram: "a b c"
    bench = _docs(spark, [(100, "a b c")])
    docs = _docs(
        spark,
        [
            (1, "a b c d"),          # grams: "a b c", "b c d" -> 1 hit
            # trigrams: (a b c) x2, (b c a) x2, (c a b) x2 -> 3 distinct,
            # 1 of them leaked
            (2, "a b c a b c a b"),
            (3, "x y z w"),          # no overlap
        ],
    )
    got = {
        r.doc_id: (r.n_ngrams, r.n_contaminated, r.contamination_frac)
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[3][1] == 0 and got[3][2] == 0.0  # zero-overlap doc is KEPT
    # distinct semantics: repetition inflates neither side of the ratio
    assert got[2] == (3, 1, 1 / 3)


def test_short_docs_yield_no_row(spark):
    bench = _docs(spark, [(100, "a b c")])
    docs = _docs(spark, [(1, "a b"), (2, "")])
    assert ngram_contamination(docs, bench, n=3).count() == 0


def test_case_insensitive_match(spark):
    bench = _docs(spark, [(100, "A B C")])
    docs = _docs(spark, [(1, "a b c")])
    [r] = ngram_contamination(docs, bench, n=3).collect()
    assert r.n_contaminated == 1


def test_benchmark_side_is_broadcast(spark):
    bench = _docs(spark, [(100, "a b c")])
    docs = _docs(spark, [(1, "a b c d")])
    plan = ngram_contamination(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_invalid_n_raises(spark):
    bench = _docs(spark, [(100, "a b c")])
    with pytest.raises(ValueError):
        ngram_contamination(bench, bench, n=0)
