"""Property-based checks of the LLM-pipeline operators against literal
Python specifications: chunking must reproduce the naive slice spec on
arbitrary documents, and packing must satisfy its contract (exactly
once, budget, slot contiguity, determinism) on arbitrary size
multisets. Spark jobs per example are expensive, so examples are
capped low; the per-operator unit tests cover the common paths."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.chunking import chunk_documents
from mapreduce_implementation_spark.operators.packing import pack_greedy

WORDS = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dddd", "éé"]),
    min_size=0,
    max_size=40,
)


def naive_chunks(words, chunk_tokens, overlap):
    """The documented spec: windows of chunk_tokens starting every
    chunk_tokens-overlap, last (possibly short) tail included, a chunk
    contributing no new tokens not emitted; empty docs yield nothing."""
    n = len(words)
    if n == 0:
        return []
    step = chunk_tokens - overlap
    out = []
    i = 0
    while True:
        start = i * step
        if start >= n or (i > 0 and start + overlap >= n):
            break
        out.append((i, words[start : start + chunk_tokens]))
        i += 1
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(WORDS, min_size=1, max_size=5),
    chunk_tokens=st.integers(1, 8),
    overlap_frac=st.floats(0, 0.99),
)
def test_chunking_matches_naive_spec(spark, docs, chunk_tokens, overlap_frac):
    overlap = int(overlap_frac * chunk_tokens)
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(
            df, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    }
    want = {}
    for i, w in enumerate(docs):
        for idx, toks in naive_chunks(w, chunk_tokens, overlap):
            want[(i, idx)] = (len(toks), " ".join(toks))
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(1, 300), min_size=1, max_size=30),
    budget=st.integers(1, 256),
    n_buckets=st.integers(1, 4),
)
def test_packing_contract_on_arbitrary_sizes(spark, sizes, budget, n_buckets):
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "k long, t long")
    packed = pack_greedy(df, "k", "t", budget, n_buckets=n_buckets).collect()

    # exactly once, sizes preserved
    assert sorted((r.k, r.t) for r in packed) == sorted(rows)
    # budget respected for every multi-row pack; oversize rows isolated
    by_pack: dict = {}
    for r in packed:
        by_pack.setdefault(r.pack_id, []).append(r)
    for members in by_pack.values():
        tot = sum(r.t for r in members)
        if len(members) > 1:
            assert tot <= budget
        else:
            assert tot <= budget or members[0].t > budget
        assert sorted(r.pack_slot for r in members) == list(range(len(members)))
    # deterministic under relayout
    again = pack_greedy(
        df.repartition(3), "k", "t", budget, n_buckets=n_buckets
    ).collect()
    assert sorted(map(tuple, packed)) == sorted(map(tuple, again))


def test_round8_operators_on_empty_and_degenerate_input(spark):
    """Q7-style sweep for the round-8 additions: zero rows and
    degenerate (empty/short text) rows produce empty-or-rowless
    results, never errors."""
    from pyspark.sql import functions as F

    from mapreduce_implementation_spark.operators import dedup as dd
    from mapreduce_implementation_spark.operators.contamination import (
        duplicate_span_stats,
    )
    from mapreduce_implementation_spark.operators.sampling import (
        stratified_fixed_n,
    )

    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    assert duplicate_span_stats(empty).collect() == []
    assert stratified_fixed_n(empty, "lang", 5).collect() == []
    assert dd.ngram_jaccard_pairs(empty, n_fingerprints=3).collect() == []
    assert dd.ngram_jaccard_pairs(empty, max_bucket=2).collect() == []

    deg = spark.createDataFrame(
        [(1, "", "en"), (2, "one", "en"), (3, None, "de")],
        "doc_id long, text string, lang string",
    )
    # short/empty text: no 20-gram spans -> no rows; NULL text tolerated
    assert duplicate_span_stats(deg).collect() == []
    # empty-ish docs share the empty-content fallback fingerprint but
    # have no shingles -> NULL jaccard -> filtered, never a crash
    assert dd.ngram_jaccard_pairs(deg, n_fingerprints=2).collect() == []
    # fixed-N keeps whole strata smaller than n
    got = {r.doc_id for r in stratified_fixed_n(deg, "lang", 5).collect()}
    assert got == {1, 2, 3}

    empty_sigs = spark.createDataFrame([], "doc_id long, simhash string")
    assert dd.simhash_cross_near_dup(empty_sigs, empty_sigs).collect() == []


def _ref_token_budget(rows, budgets, salt="tokbudget"):
    """Literal Python spec of stratified_token_budget (md5 mode): per
    listed stratum, take docs in (md5-bucket, doc_id) order while the
    PRE-row running token sum is under budget; unlisted / None-budget /
    NULL strata kept whole."""
    import hashlib

    from mapreduce_implementation_spark.operators import sampling as sp

    def bucket(doc_id):
        h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8]
        return int(h, 16) % sp.BUCKETS

    listed = {s for s, b in budgets.items() if b is not None}
    keep = set()
    by_stratum = {}
    for doc_id, stratum, tokens in rows:
        if stratum is None or stratum not in listed:
            keep.add(doc_id)
        else:
            by_stratum.setdefault(stratum, []).append((doc_id, tokens))
    for s, docs in by_stratum.items():
        running = 0
        for doc_id, tokens in sorted(
            docs, key=lambda d: (bucket(d[0]), d[0])
        ):
            if running < budgets[s]:
                keep.add(doc_id)
            running += tokens
    return keep


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 200),  # doc_id (deduped below)
            st.sampled_from(["en", "de", "fr", None]),
            st.integers(0, 50),  # token count
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    budget_en=st.one_of(st.none(), st.integers(0, 300)),
    budget_de=st.one_of(st.none(), st.integers(0, 300)),
    num_partitions=st.integers(1, 5),
)
def test_token_budget_matches_python_spec(
    spark, rows, budget_en, budget_de, num_partitions
):
    """stratified_token_budget (md5 mode) against an independent
    Python reference on arbitrary corpora: NULL strata, None budgets,
    zero budgets, zero-token docs, and arbitrary range-partition cuts
    must all agree with the literal take-while spec (the round-9
    advisory fixes — NULL routing + the partition-pin barrier — are
    load-bearing here)."""
    from mapreduce_implementation_spark.operators import sampling as sp

    budgets = {"en": budget_en, "de": budget_de}
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, tok long"
    )
    got = {
        r.doc_id
        for r in sp.stratified_token_budget(
            df, "lang", budgets, token_col="tok", method="md5",
            num_partitions=num_partitions,
        ).collect()
    }
    assert got == _ref_token_budget(rows, budgets)
