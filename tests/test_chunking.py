"""Chunking semantics: exact coverage/overlap against a Python spec on
the real documents table, edge cases, and the map-only plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.chunking import chunk_documents
from mapreduce_implementation_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _spec_chunks_simple(text: str, width: int, overlap: int):
    """Reference implementation: starts at 0, step, 2*step ... while the
    chunk adds at least one uncovered token (start + overlap < n)."""
    toks = [t for t in text.split() if t]
    n = len(toks)
    step = width - overlap
    out = []
    start, idx = 0, 0
    while start < n and (idx == 0 or start + overlap < n):
        out.append((idx, toks[start : start + width]))
        idx += 1
        start += step
    return out


def test_chunks_match_python_spec_on_real_docs(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    width, overlap = 32, 8
    got = {}
    for r in chunk_documents(docs, chunk_tokens=width, overlap=overlap).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text.split(" ")))
    for row in docs.select("doc_id", "text").collect():
        want = _spec_chunks_simple(row.text or "", width, overlap)
        have = sorted(got.get(row.doc_id, []))
        assert have == want, (row.doc_id, have[:2], want[:2])


def test_chunk_coverage_and_overlap_counts(spark):
    docs = load_table(spark, SF, "documents")
    width, overlap = 64, 16
    chunks = chunk_documents(docs, chunk_tokens=width, overlap=overlap)
    stats = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("n_tokens").alias("sum_t"),
            F.count("*").alias("n_chunks"),
            F.max("n_tokens").alias("max_t"),
        )
        .collect()
    )
    totals = {
        r.doc_id: r.n_toks
        for r in docs.select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit("")))
            .alias("n_toks"),
        ).collect()
    }
    for r in stats:
        n = totals[r.doc_id]
        # every token covered exactly once + overlap tokens double-counted
        assert r.sum_t == n + (r.n_chunks - 1) * overlap, (r.doc_id, n, r.sum_t)
        assert r.max_t <= width


def test_short_and_empty_documents(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "   "), (4, "x")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    got = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text) for r in rows}
    assert got == {(1, 0): (3, "a b c"), (4, 0): (1, "x")}


def test_chunking_is_map_only(spark):
    docs = load_table(spark, SF, "documents")
    plan = (
        chunk_documents(docs, chunk_tokens=128, overlap=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_invalid_params_raise(spark):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=16, overlap=16)


def test_keyed_chunks_guards_id_range(spark):
    """A 64-bit-hash-sized id must raise loudly, not overflow the
    chunk_key stride into silent collisions (or an opaque ANSI error)."""
    import pytest
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators.chunking import (
        chunk_documents,
        keyed_chunks,
    )

    ok = spark.createDataFrame(
        [(5, "a b c")], "doc_id long, text string"
    )
    keyed = keyed_chunks(chunk_documents(ok, chunk_tokens=2))
    rows = keyed.collect()
    assert [r.chunk_key for r in rows] == [5 * (1 << 32), 5 * (1 << 32) + 1]

    bad = spark.createDataFrame(
        [(int(-8_588_059_573_638_103_203), "a b c")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="chunk_key encoding"):
        keyed_chunks(chunk_documents(bad, chunk_tokens=2)).collect()
