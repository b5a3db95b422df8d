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


def test_duplicate_span_stats_finds_shared_spans(spark):
    """Two docs sharing a verbatim 24-word passage (different
    surroundings — document-level near-dup would score them low) are
    both flagged with dup spans; a unique doc reports zero; short docs
    yield no row."""
    from mapreduce_implementation_spark.operators.contamination import (
        duplicate_span_stats,
    )

    passage = " ".join(f"w{i}" for i in range(24))
    docs = spark.createDataFrame(
        [
            (1, "intro one " + passage + " outro alpha beta"),
            (2, "completely different lead in text " + passage + " tail"),
            (3, " ".join(f"u{i}" for i in range(30))),  # unique content
            (4, "too short for twenty gram spans"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in duplicate_span_stats(docs, n=20).collect()}
    assert out[1].n_dup_spans >= 5 and out[2].n_dup_spans >= 5
    assert 0 < out[1].dup_span_frac < 1 and 0 < out[2].dup_span_frac < 1
    assert out[3].n_dup_spans == 0 and out[3].dup_span_frac == 0.0
    assert 4 not in out  # < 20 tokens -> no spans -> no row

    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must be"):
        duplicate_span_stats(docs, n=1)


def test_duplicate_span_stats_single_pass(spark):
    """The expensive tokenize+explode must run ONCE: one parquet scan
    of documents, holder counts via the span-hash window (a
    groupBy+join-back formulation loses exchange reuse to column
    pruning and tokenizes the corpus twice — the plan this test keeps
    out)."""
    from mapreduce_implementation_spark.operators.contamination import (
        duplicate_span_stats,
    )
    from mapreduce_implementation_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    df = duplicate_span_stats(docs, n=20)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # formatted explain lists each node twice (tree + details), so one
    # physical scan node == exactly two string occurrences
    assert plan.count("Scan parquet") == 2, plan
    assert "Window" in plan, plan
